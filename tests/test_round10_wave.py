"""Semantic invariants for the round-10 second wave (what oracle parity
can't express): RRF score algebra, budget-prefix maximality, null-group
survival in the null-safe join, and shot-boundary recomputation."""

import hashlib

import pytest
from pyspark.sql import functions as F

from flink_emqx_connector_spark.plans import QUERIES
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def rrf(spark):
    return {r["doc_id"]: r for r in QUERIES["hybrid_rrf_search"].spark(
        spark, SF_SMALL
    ).collect()}


def test_rrf_score_algebra(rrf):
    """rrf_micro is exactly the integer-div sum of the per-leg
    contributions; ranks are 1..10; at least one leg present per row."""
    assert 0 < len(rrf) <= 10
    for r in rrf.values():
        contrib = 0
        assert r["lex_rank"] is not None or r["sem_rank"] is not None
        for rank in (r["lex_rank"], r["sem_rank"]):
            if rank is not None:
                assert 1 <= rank <= 10
                contrib += 1_000_000 // (60 + rank)
        assert r["rrf_micro"] == contrib


def test_rrf_doc_in_both_legs_outranks_single_leg_peers(rrf):
    """Any doc present in BOTH legs must outscore any doc whose single
    rank is >= both of its ranks (fusion algebra sanity)."""
    both = [r for r in rrf.values() if r["lex_rank"] and r["sem_rank"]]
    single = [r for r in rrf.values() if not (r["lex_rank"] and r["sem_rank"])]
    for b in both:
        worst = max(b["lex_rank"], b["sem_rank"])
        for s in single:
            rank = s["lex_rank"] or s["sem_rank"]
            if rank >= worst:
                assert b["rrf_micro"] > s["rrf_micro"]


def test_budget_selection_prefix_is_maximal(spark):
    """The kept set is exactly the maximal prefix of the (ttr desc,
    doc_id) order fitting half the corpus tokens — recomputed doc-by-doc
    in Python against the plan's per-source census."""
    out = {r["source"]: r for r in QUERIES["token_budget_selection"].spark(
        spark, SF_SMALL
    ).collect()}
    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "source", F.split("text", " ").alias("w"))
        .select(
            "doc_id", "source",
            F.size("w").alias("n"),
            F.size(F.array_distinct("w")).alias("d"),
        )
        .collect()
    )
    rows = sorted(
        ((1000 * r["d"]) // r["n"], r["doc_id"], r["source"], r["n"])
        for r in docs
    )
    rows = sorted(rows, key=lambda t: (-t[0], t[1]))
    budget = sum(r["n"] for r in docs) // 2
    kept, cum = {}, 0
    stopped = False
    for _ttr, _did, src, n in rows:
        cum += n
        if cum > budget:
            stopped = True
            break
        kept[src] = kept.get(src, [0, 0])
        kept[src][0] += 1
        kept[src][1] += n
    assert stopped or all(
        out[s]["n_kept"] == out[s]["n_docs"] for s in out
    )  # budget binds at every tested SF; degenerate corpora keep all
    for src, r in out.items():
        want_n, want_tok = kept.get(src, (0, 0))
        assert r["n_kept"] == want_n, src
        assert r["tokens_kept"] == want_tok, src
    assert sum(r["tokens_kept"] for r in out.values()) <= budget


def test_null_safe_join_null_group_survives(spark):
    """The NULL segment row exists and carries the demoted segment's
    counts — the row a plain equi-join silently drops."""
    rows = QUERIES["null_safe_join_segments"].spark(spark, SF_SMALL).collect()
    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    n_building = cust.filter(F.col("c_mktsegment") == "BUILDING").count()
    nulls = [r for r in rows if r["seg"] is None]
    assert len(nulls) == 1
    assert nulls[0]["n_customers"] == n_building
    # and a plain equi-join on the same aggregates drops that row
    segs = {r["seg"] for r in rows}
    assert None in segs and "BUILDING" not in segs


def test_shot_boundaries_recompute_exact(spark):
    """Recompute luminance series + boundaries in pure Python for every
    doc at sf0.001; bounds hold corpus-wide."""
    rows = QUERIES["multimodal_shot_boundaries"].spark(
        spark, SF_SMALL
    ).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_shots"] <= r["n_frames"]
        assert 0 <= r["max_delta"] <= 255
        ys = [
            int(hashlib.md5(f"{r['doc_id']}:{f}".encode()).hexdigest()[:2], 16)
            for f in range(r["n_frames"])
        ]
        deltas = [abs(b - a) for a, b in zip(ys, ys[1:])]
        assert r["n_shots"] == 1 + sum(1 for d in deltas if d > 96)
        assert r["max_delta"] == (max(deltas) if deltas else 0)
        if r["n_frames"] == 1:
            assert r["n_shots"] == 1 and r["max_delta"] == 0


def test_cms_f2_estimate_never_undercounts(spark):
    """Every sketch row's inner-product estimate >= the exact F2, and the
    exact F2 matches a Python recompute of sum(n_u^2)."""
    rows = QUERIES["join_size_cms_estimate"].spark(spark, SF_SMALL).collect()
    assert len(rows) == 4
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    counts = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    exact = sum(n * n for n in counts.values())
    for r in rows:
        assert r["exact_f2"] == exact
        assert r["overestimate"] >= 0
        assert r["est_f2"] == exact + r["overestimate"]
        assert r["rel_err_milli"] == (r["est_f2"] - exact) * 1000 // exact


def test_cusum_prefix_identity_equals_true_recursion(spark):
    """The two-window prefix form must equal the textbook recursion
    s_i = max(0, s_{i-1} + dev_i), recomputed per type in Python —
    this is the test that pins the drawdown identity the plan relies
    on (the oracle only proves Spark == DuckDB, not == CUSUM)."""
    out = {r["event_type"]: r for r in QUERIES["event_rate_cusum"].spark(
        spark, SF_SMALL
    ).collect()}
    daily = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts").cast("timestamp")).cast("date")
            .alias("day"),
        )
        .agg(F.count("*").alias("n"))
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["n"]))
    for etype, rows in series.items():
        rows.sort()
        total = sum(n for _d, n in rows)
        target = total * 1000 // len(rows)
        slack = target // 10
        s, mx, flags, first = 0, 0, 0, None
        for day, n in rows:
            s = max(0, s + n * 1000 - target - slack)
            mx = max(mx, s)
            if s > 3 * target:
                flags += 1
                first = first or day
        got = out[etype]
        assert got["n_days"] == len(rows)
        assert got["max_cusum_milli"] == mx, etype
        assert got["n_flagged"] == flags, etype
        assert got["first_flag_day"] == first, etype


def test_covariance_matches_numpy_and_is_psd_on_diagonal(spark):
    """cov_n2 == n²·cov exactly (numpy recompute on the quantized
    vectors); diagonal entries are n²·variance >= 0."""
    import numpy as np

    rows = QUERIES["embedding_covariance_exact"].spark(
        spark, SF_SMALL
    ).collect()
    assert len(rows) == 64 * 65 // 2
    emb = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .select("embedding")
        .collect()
    )
    Q = np.floor(
        np.array([list(r[0]) for r in emb], dtype=np.float64) * 1000 + 0.5
    ).astype(np.int64)
    n = len(Q)
    G = Q.T @ Q
    s = Q.sum(axis=0)
    for r in rows:
        i, j = r["i"] - 1, r["j"] - 1
        assert r["cov_n2"] == n * G[i, j] - s[i] * s[j], (i, j)
        if i == j:
            assert r["cov_n2"] >= 0  # n² · variance


def test_pca_power_iteration_exact_integer_algebra(spark):
    """Recompute the integer power iteration in numpy (truncating
    division, like both engines) — the plan's 3 chained matvecs must be
    bit-exact; the output is inf-normalized to milli-units."""
    import numpy as np

    def trunc_div(a, b):
        return np.sign(a) * (np.abs(a) // b)

    out = {r["dim"]: r["v_milli"] for r in QUERIES[
        "embedding_pca_power_iteration"
    ].spark(spark, SF_SMALL).collect()}
    assert len(out) == 64
    emb = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .select("embedding")
        .collect()
    )
    Q = np.floor(
        np.array([list(r[0]) for r in emb], dtype=np.float64) * 1000 + 0.5
    ).astype(np.int64)
    n = len(Q)
    C = n * (Q.T @ Q) - np.outer(Q.sum(0), Q.sum(0))
    cs = max(int(np.abs(C).max()) // 1_000_000, 1)
    cm = trunc_div(C, cs)
    v = np.full(64, 1000, dtype=np.int64)
    for _ in range(3):
        w = cm @ v
        mx = max(int(np.abs(w).max()), 1)
        v = trunc_div(w * 1000, mx)
    assert int(np.abs(v).max()) == 1000  # inf-normalized
    for d in range(64):
        assert out[d + 1] == v[d], d


def test_cms_merge_equals_rebuild_and_conserves_mass(spark):
    rows = QUERIES["sketch_merge_cms"].spark(spark, SF_SMALL).collect()
    assert len(rows) == 4
    n_toks = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select(F.explode(F.split("text", " ")))
        .count()
    )
    for r in rows:
        assert r["cells_equal"] is True
        assert r["mass"] == n_toks  # every row of the CMS holds all mass


def test_kfold_disjoint_exhaustive_and_share_algebra(spark):
    rows = QUERIES["stratified_kfold_assignment"].spark(
        spark, SF_SMALL
    ).collect()
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs  # disjoint+exhaustive
    assert {r["fold"] for r in rows} <= set(range(5))
    by_fold = {}
    for r in rows:
        by_fold.setdefault(r["fold"], []).append(r)
        assert r["lang_share_milli"] == r["n_docs"] * 1000 // r["fold_total"]
    for fold, rs in by_fold.items():
        assert sum(r["n_docs"] for r in rs) == rs[0]["fold_total"]
        # integer-floored shares sum to <= 1000 and within |langs| of it
        s = sum(r["lang_share_milli"] for r in rs)
        assert 1000 - len(rs) < s <= 1000, fold


def test_inversions_match_python_recompute(spark):
    """Per-bucket inversion counts equal a pure-Python recompute of the
    arrival-vs-event-time discordance; rates are exact integer micro."""
    rows = {r["bucket"]: r for r in QUERIES["event_order_inversions"].spark(
        spark, SF_SMALL
    ).collect()}
    ev = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select("user_id", "event_id", "ts")
        .collect()
    )
    seqs = {}
    for r in ev:
        seqs.setdefault(r["user_id"], []).append((r["event_id"], r["ts"]))
    want = {}
    for u, es in seqs.items():
        es.sort()
        b = u % 16
        np_, ni = want.get(b, (0, 0))
        for i in range(len(es)):
            for j in range(i + 1, len(es)):
                np_ += 1
                if es[i][1] > es[j][1]:
                    ni += 1
        want[b] = (np_, ni)
    assert set(rows) == set(want)
    for b, (np_, ni) in want.items():
        assert rows[b]["n_pairs"] == np_, b
        assert rows[b]["n_inversions"] == ni, b
        assert rows[b]["inv_micro"] == ni * 1_000_000 // np_, b


def test_cdc_diff_census_algebra(spark):
    """Insert/delete/update/unchanged partition the key universe exactly:
    counts recompute from the key-residue construction; checksums are
    exact key sums per class."""
    rows = {r["op"]: r for r in QUERIES["snapshot_diff_cdc"].spark(
        spark, SF_SMALL
    ).collect()}
    keys = [r["o_orderkey"] for r in (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .select("o_orderkey")
        .collect()
    )]
    want = {"insert": [], "delete": [], "update": [], "unchanged": []}
    for k in keys:
        r = k % 10
        if r == 3:
            want["insert"].append(k)   # only in the new snapshot
        elif r == 7:
            want["delete"].append(k)   # only in the old snapshot
        elif r == 5:
            want["update"].append(k)   # value bumped in the new snapshot
        else:
            want["unchanged"].append(k)
    assert set(rows) == {k for k, v in want.items() if v}
    for op, ks in want.items():
        if not ks:
            continue
        assert rows[op]["n_rows"] == len(ks), op
        assert rows[op]["key_checksum"] == sum(ks), op
