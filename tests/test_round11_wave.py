"""Round-11 semantic invariants: the hot-user path of
event_order_inversions (VERDICT r10 #2 — the plan must cost O(k log k)
per user, never materialize k^2/2 pairs) and the bounded token-hash
cache (VERDICT r10 #3)."""

import time

import numpy as np
import pytest

from flink_emqx_connector_spark.plans import QUERIES
from tests.conftest import SF_SMALL


def _np_inversions(ts: np.ndarray, chunk: int = 512) -> int:
    """Independent O(k^2) recompute, chunked so the bool matrix stays
    bounded: pairs (i < j) with ts[i] > ts[j], strict (ties are not
    inversions)."""
    k = len(ts)
    total = 0
    for s in range(0, k, chunk):
        block = ts[s : s + chunk]
        # pairs inside the block
        total += int(np.sum(np.triu(block[:, None] > block[None, :], k=1)))
        # pairs (i in block, j after block)
        tail = ts[s + chunk :]
        if len(tail):
            total += int(np.sum(block[:, None] > tail[None, :]))
    return total


def test_inversions_hot_user_bounded(spark, tmp_path):
    """One user with 10^4 events (5·10^7 potential pairs) must stay
    bounded: the merge-count path touches k log k elements, not k^2/2
    join rows. Verified exactly against an independent chunked O(k^2)
    numpy recompute, and the wall-clock stays far under what a 5·10^7-row
    pair shuffle would cost at local scale."""
    rng = np.random.default_rng(7)
    k = 10_000
    # load_table truncates a long ts to micros (ts div 1000) — keep the
    # fixture on 1000-nano multiples so the recompute sees identical ties
    hot_ts = rng.integers(0, 10**12, size=k) * 1000
    # a couple of cold users in other buckets to prove grouping intact
    cold_users = [17, 18]  # buckets 1, 2
    rows = [
        (160, int(i), int(hot_ts[i]))  # user 160 → bucket 0, shard 160
        for i in range(k)
    ]
    for u in cold_users:
        # 2 inversions per user
        rows += [(u, i, t * 10**9) for i, t in enumerate([5, 3, 4])]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts long")
    fx = str(tmp_path / "events.parquet")
    df.write.parquet(fx)
    # the plan loads {sf_dir}/events.parquet — point it at the fixture
    t0 = time.monotonic()
    out = {
        r["bucket"]: r
        for r in QUERIES["event_order_inversions"].spark(
            spark, str(tmp_path)
        ).collect()
    }
    elapsed = time.monotonic() - t0
    want_hot = _np_inversions(hot_ts)
    assert out[0]["n_pairs"] == k * (k - 1) // 2
    assert out[0]["n_inversions"] == want_hot
    assert out[0]["inv_micro"] == want_hot * 1_000_000 // (k * (k - 1) // 2)
    for b in (1, 2):
        assert out[b]["n_pairs"] == 3
        assert out[b]["n_inversions"] == 2
    # generous bound: the old pair join at 5e7 rows took minutes here
    assert elapsed < 60, f"hot-user path took {elapsed:.1f}s — not bounded"


def test_inversions_tie_semantics(spark, tmp_path):
    """Equal timestamps are NOT inversions (strict >): a fully-tied
    sequence reports zero; a descending one reports all pairs."""
    # ×10^9: survives load_table's nanos→micros div-1000 truncation
    rows = [(16, i, 42 * 10**9) for i in range(5)]  # bucket 0: tied → 0/10
    rows += [(33, i, (100 - i) * 10**9) for i in range(4)]  # b1: desc → 6/6
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts long")
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r["bucket"]: r
        for r in QUERIES["event_order_inversions"].spark(
            spark, str(tmp_path)
        ).collect()
    }
    assert out[0]["n_pairs"] == 10 and out[0]["n_inversions"] == 0
    assert out[0]["inv_micro"] == 0
    assert out[1]["n_pairs"] == 6 and out[1]["n_inversions"] == 6
    assert out[1]["inv_micro"] == 1_000_000


def test_token_hash_cache_bounded():
    """VERDICT r10 #3: the per-worker md5 token memo must not grow
    unboundedly — past the cap it clears and re-warms; hashes stay
    identical before and after a clear."""
    from flink_emqx_connector_spark.operators import dedup as D

    D._TOKEN_HASH_CACHE.clear()
    before = D._simhash_one("alpha beta gamma")
    # force an overflow well past the cap
    old_max = D._TOKEN_HASH_CACHE_MAX
    try:
        D._TOKEN_HASH_CACHE_MAX = 100
        import pandas as pd

        texts = pd.Series(
            [" ".join(f"tok{i}_{j}" for j in range(50)) for i in range(10)]
        )
        fps1 = D._simhash_batch(texts)
        assert len(D._TOKEN_HASH_CACHE) <= 100, "cache not trimmed"
        fps2 = D._simhash_batch(texts)  # recompute from a cold cache
        assert list(fps1) == list(fps2)
        assert D._simhash_one("alpha beta gamma") == before
        # single-token path trims too
        D._simhash_one(" ".join(f"x{i}" for i in range(200)))
        assert len(D._TOKEN_HASH_CACHE) <= 100
    finally:
        D._TOKEN_HASH_CACHE_MAX = old_max
        D._TOKEN_HASH_CACHE.clear()


def test_hamilton_quotas_sum_to_budget(spark):
    """Apportionment correctness beyond parity: quotas sum EXACTLY to
    the 10,000-slot budget, every quota is base or base+1, and the +1s
    go to the largest remainders."""
    rows = QUERIES["sample_apportionment_hamilton"].spark(
        spark, SF_SMALL
    ).collect()
    assert sum(r["quota"] for r in rows) == 10_000
    for r in rows:
        assert r["quota"] in (r["base_quota"], r["base_quota"] + 1)
    extras = sorted(r["rem_rank"] for r in rows if r["quota"] == r["base_quota"] + 1)
    assert extras == list(range(1, len(extras) + 1)), extras


def test_pagerank_values_in_feasible_band(spark):
    """Each rank is >= the 150-milli teleport floor, and a graph node's
    rank never exceeds teleport + damped mass of the whole graph."""
    rows = QUERIES["dedup_graph_pagerank"].spark(spark, SF_SMALL).collect()
    assert rows, "pagerank returned no rows"
    for r in rows:
        assert r["pr_milli"] >= 150
        assert r["degree"] >= 1
    # descending order with doc tie-break, as declared
    prs = [(r["pr_milli"], -r["doc"]) for r in rows]
    assert prs == sorted(prs, reverse=True)


def test_weighted_median_is_a_weighted_median(spark):
    """Recompute per flag from raw rows: the reported value is the
    smallest cents value whose cumulative weight reaches half the
    total."""
    rows = {r["flag"]: r for r in QUERIES["weighted_median_price"].spark(
        spark, SF_SMALL
    ).collect()}
    li = (
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        .selectExpr(
            "l_returnflag AS flag",
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents",
            "CAST(round(l_quantity) AS BIGINT) AS wt",
        )
        .collect()
    )
    by_flag = {}
    for r in li:
        by_flag.setdefault(r["flag"], []).append((r["cents"], r["wt"]))
    for flag, items in by_flag.items():
        items.sort()
        tot = sum(w for _, w in items)
        cum = 0
        med = None
        for c, w in items:
            cum += w
            if 2 * cum >= tot:
                med = c
                break
        assert rows[flag]["w_median_cents"] == med, flag
        assert rows[flag]["total_weight"] == tot, flag


def test_jl_distortion_concentrates_near_unity(spark):
    """JL with k=16 ±1 signs: the distortion ratio must center near
    1000 milli (E[proj²] = k·orig²) — all mass within a generous
    [200, 3000] band and the pair count equals C(n_eval, 2) minus
    nothing (no zero-distance pairs in the synthetic embeddings)."""
    rows = QUERIES["jl_projection_distortion"].spark(spark, SF_SMALL).collect()
    n_pairs = sum(r["n_pairs"] for r in rows)
    n_eval = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .filter("vec_id % 100 = 0 AND vec_id <= 6400")
        .count()
    )
    assert n_pairs == n_eval * (n_eval - 1) // 2
    lo = min(r["min_milli"] for r in rows)
    hi = max(r["max_milli"] for r in rows)
    assert 200 <= lo and hi <= 3000, (lo, hi)
    # the modal band should straddle 1000 milli
    modal = max(rows, key=lambda r: r["n_pairs"])
    assert 5 <= modal["band"] <= 15, modal


def test_cluster_weighted_sample_keeps_all_uniques(spark):
    """Band 1 (singleton clusters): draw % 1 == 0 always, so every
    unique doc survives; every band keeps at most its doc count and at
    least 0; cluster counts are consistent with doc counts."""
    rows = {r["size_band"]: r for r in QUERIES["cluster_weighted_sample"].spark(
        spark, SF_SMALL
    ).collect()}
    assert rows[1]["n_kept"] == rows[1]["n_docs"]
    assert rows[1]["n_clusters"] == rows[1]["n_docs"]
    for b, r in rows.items():
        assert 0 <= r["n_kept"] <= r["n_docs"]
        if b > 1:
            # a band-b cluster holds >= b docs (band 8 = 8-or-more)
            assert r["n_docs"] >= b * r["n_clusters"] or b == 8


def test_periodicity_acf_bounds_and_pair_counts(spark):
    """|acf| <= 1 (Cauchy-Schwarz on the exact integer core), pair
    count decreases (weakly) with lag inside each type, and the
    variance terms are non-negative."""
    rows = QUERIES["event_periodicity_acf"].spark(spark, SF_SMALL).collect()
    assert rows
    by_type = {}
    for r in rows:
        assert r["vx"] >= 0 and r["vy"] >= 0
        if r["acf"] is not None:
            assert -1.0001 <= r["acf"] <= 1.0001, r
            # the rounded double must match the exact integer core
            import math
            want = round(r["num"] / math.sqrt(float(r["vx"]) * float(r["vy"])), 4)
            assert abs(r["acf"] - want) < 1e-9, r
        by_type.setdefault(r["event_type"], []).append((r["lag"], r["m"]))
    for t, ms in by_type.items():
        ms.sort()
        assert all(m1 >= m2 for (_, m1), (_, m2) in zip(ms, ms[1:])), (t, ms)


def test_discrete_quantile_bounds_exact_semantics(spark):
    """Type-1 order statistic: smallest v with cumulative count >=
    ceil(q*n) — verified against a tiny hand-computable frame including
    heavy ties (the case interpolated quantiles get ulp-wrong)."""
    from fractions import Fraction

    from flink_emqx_connector_spark.operators.quantiles import (
        discrete_quantile_bounds,
    )

    # 10 values: 1,2,2,2,3,3,7,7,7,9
    df = spark.createDataFrame(
        [(v,) for v in [1, 2, 2, 2, 3, 3, 7, 7, 7, 9]], "v long"
    )
    row = discrete_quantile_bounds(
        df, "v", [Fraction(1, 4), Fraction(1, 2), Fraction(3, 4), Fraction(9, 10)]
    ).collect()[0]
    # ceil(.25*10)=3 -> 3rd smallest = 2; ceil(.5*10)=5 -> 3;
    # ceil(.75*10)=8 -> 7 (wait: ranks 7..9 are 7s, 8th = 7); ceil(.9*10)=9 -> 7
    assert row["q1"] == 2 and row["q2"] == 3
    assert row["q3"] == 7 and row["q4"] == 7
