"""Round-13 semantic invariants: the clustering trio (X176 k-means,
X177 learned-codebook IVF, X178 quality census) against an INDEPENDENT
brute-force numpy reimplementation of the whole contract — md5 init,
exact-integer assignment, toward-zero mean updates, empty-cluster
hold, learned-cell probing, cosine re-rank, cohesion/separation — plus
sanity (cluster accounting, recall floor vs exact top-k) and
hypothesis fuzz of the cross-engine arithmetic identities.
"""

import hashlib

import numpy as np

from flink_emqx_connector_spark.plans import QUERIES
from flink_emqx_connector_spark.plans.clustering import (
    _DIM,
    _ITER,
    _K,
    _NPROBE,
    _NQUERIES,
    _SEED_PREFIX,
    _TOPK,
)


def _load_vecs(sf_dir):
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "WHERE embedding IS NOT NULL ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    V = np.array([list(r[1]) for r in rows], dtype=np.float64)
    return ids, V


def _brute_lloyd(ids, V):
    """Independent reimplementation (hashlib md5, python loops for the
    update) of the X176 contract. Returns (C_final, counts, assign_f)
    where assign_f is the final-iteration membership."""
    Q = np.floor(V * 1000.0 + 0.5).astype(np.int64)
    order = sorted(
        range(len(ids)),
        key=lambda i: (
            hashlib.md5((_SEED_PREFIX + str(ids[i])).encode()).hexdigest(),
            ids[i],
        ),
    )
    C = Q[order[:_K]].copy()
    counts = np.zeros(_K, dtype=np.int64)
    a = None
    for _t in range(_ITER):
        d2 = (
            (Q * Q).sum(axis=1)[:, None]
            - 2 * (Q @ C.T)
            + (C * C).sum(axis=1)[None, :]
        )
        a = np.argmin(d2, axis=1)  # first min = smallest cid
        counts = np.zeros(_K, dtype=np.int64)
        C_new = C.copy()
        for k in range(_K):
            members = Q[a == k]
            counts[k] = len(members)
            if len(members):
                s = members.sum(axis=0)
                # toward-zero division, elementwise
                C_new[k] = np.sign(s) * (np.abs(s) // counts[k])
        C = C_new
    return C, counts, a


def test_kmeans_matches_bruteforce(spark, sf_dir):
    ids, V = _load_vecs(sf_dir)
    C_ref, counts_ref, _a = _brute_lloyd(ids, V)

    rows = QUERIES["kmeans_lloyd_embeddings"].spark(spark, sf_dir).collect()
    assert len(rows) == _K * _DIM
    got_C = np.zeros((_K, _DIM), dtype=np.int64)
    got_n = np.zeros(_K, dtype=np.int64)
    for r in rows:
        got_C[r.cid - 1, r.dim - 1] = r.c_milli
        got_n[r.cid - 1] = r.n_members
    np.testing.assert_array_equal(got_C, C_ref)
    np.testing.assert_array_equal(got_n, counts_ref)
    # every vector is accounted for exactly once
    assert got_n.sum() == len(ids)


def test_kmeans_iterations_tighten_sse(sf_dir):
    """Lloyd monotonicity sanity on the brute-force twin: total SSE after
    the final assignment is no worse than after the first."""
    ids, V = _load_vecs(sf_dir)
    Q = np.floor(V * 1000.0 + 0.5).astype(np.int64)

    def sse(C):
        d2 = (
            (Q * Q).sum(axis=1)[:, None]
            - 2 * (Q @ C.T)
            + (C * C).sum(axis=1)[None, :]
        )
        return d2.min(axis=1).sum()

    order = sorted(
        range(len(ids)),
        key=lambda i: (
            hashlib.md5((_SEED_PREFIX + str(ids[i])).encode()).hexdigest(),
            ids[i],
        ),
    )
    C0 = Q[order[:_K]].copy()
    C_final, _n, _a = _brute_lloyd(ids, V)
    assert sse(C_final) <= sse(C0)


def test_ivf_kmeans_matches_bruteforce_and_recall(spark, sf_dir):
    ids, V = _load_vecs(sf_dir)
    C, _n, _a = _brute_lloyd(ids, V)
    Q = np.floor(V * 1000.0 + 0.5).astype(np.int64)
    d2 = (
        (Q * Q).sum(axis=1)[:, None]
        - 2 * (Q @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )
    cell = d2.argmin(axis=1)

    def _round_half_away(x, decimals):
        p = 10.0**decimals
        return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p

    norms = np.sqrt((V * V).sum(axis=1))
    expected = {}
    exact_top = {}
    for qi in range(len(ids)):
        if ids[qi] >= _NQUERIES:
            continue
        probe_cells = np.argsort(d2[qi], kind="stable")[:_NPROBE]
        cand = [
            j
            for j in range(len(ids))
            if cell[j] in probe_cells and ids[j] != ids[qi]
        ]
        sims = {
            ids[j]: _round_half_away(
                float(V[qi] @ V[j] / (norms[qi] * norms[j])), 4
            )
            for j in cand
        }
        top = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:_TOPK]
        expected[ids[qi]] = [
            (int(n), s, rk + 1) for rk, (n, s) in enumerate(top)
        ]
        all_sims = {
            ids[j]: float(V[qi] @ V[j] / (norms[qi] * norms[j]))
            for j in range(len(ids))
            if ids[j] != ids[qi]
        }
        exact_top[ids[qi]] = {
            n for n, _s in sorted(all_sims.items(), key=lambda kv: -kv[1])[:_TOPK]
        }

    rows = QUERIES["ann_ivf_kmeans_topk"].spark(spark, sf_dir).collect()
    got = {}
    for r in rows:
        got.setdefault(r.query_id, []).append(
            (r.neighbor_id, r.cos_sim, r.rk)
        )
    for q in got:
        got[q].sort(key=lambda t: t[2])
    assert got == expected

    # recall floor vs the exact brute-force top-k: probing 3/8 learned
    # cells should keep a usable fraction of true neighbors
    hits = sum(
        len({n for n, _s, _r in got[q]} & exact_top[q]) for q in got
    )
    total = sum(len(exact_top[q]) for q in got)
    assert hits / total >= 0.4, (hits, total, got)


def test_kmeans_oracle_replays_empty_cluster_hold():
    """Empty-cluster semantics: with K=8 and only 3 distinct vectors, the
    5 memberless clusters must HOLD their (init) centroids and report
    n_members=0 — on the oracle side, which replays the full iteration
    chain on a synthetic table."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS "
        "SELECT r.range AS vec_id, "
        f"list_transform(range(1, {_DIM + 1}), "
        "  d -> CAST(0.001 * d * ((r.range % 3) - 1) AS FLOAT)) AS embedding "
        "FROM range(12) r"
    )
    rows = con.execute(QUERIES["kmeans_lloyd_embeddings"].oracle).fetchall()
    assert len(rows) == _K * _DIM
    by_cid = {}
    for cid, n, dim, c in rows:
        by_cid.setdefault(cid, []).append((n, dim, c))
    sizes = {cid: vals[0][0] for cid, vals in by_cid.items()}
    assert sum(sizes.values()) == 12
    empties = [cid for cid, n in sizes.items() if n == 0]
    # 3 distinct vectors → at most 3 live cells
    assert len(empties) >= _K - 3, sizes
    con.close()


def test_cluster_quality_matches_bruteforce(spark, sf_dir):
    """X178 vs the independent twin: within-cluster SSE per cluster and
    the nearest-other-centroid separation, all exact integers."""
    ids, V = _load_vecs(sf_dir)
    C, counts, a = _brute_lloyd(ids, V)
    Q = np.floor(V * 1000.0 + 0.5).astype(np.int64)
    d2 = (
        (Q * Q).sum(axis=1)[:, None]
        - 2 * (Q @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )
    a_f = d2.argmin(axis=1)  # final assignment (post-update re-assign)
    dmin = d2[np.arange(len(Q)), a_f]
    wss_ref = np.zeros(_K, dtype=np.int64)
    n_ref = np.zeros(_K, dtype=np.int64)
    for k in range(_K):
        sel = a_f == k
        n_ref[k] = sel.sum()
        wss_ref[k] = dmin[sel].sum()
    G = (
        (C * C).sum(axis=1)[:, None]
        - 2 * (C @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )
    np.fill_diagonal(G, np.iinfo(np.int64).max)
    nn_ref = G.argmin(axis=1)

    rows = QUERIES["kmeans_cluster_quality"].spark(spark, sf_dir).collect()
    assert len(rows) == _K
    for r in rows:
        k = r.cid - 1
        assert r.n_members == n_ref[k], (r, n_ref[k])
        assert r.wss == wss_ref[k], (r, wss_ref[k])
        assert r.nn_cid == nn_ref[k] + 1, (r, nn_ref[k] + 1)
        assert r.nn_d2 == G[k, nn_ref[k]], (r, G[k, nn_ref[k]])
    assert sum(r.n_members for r in rows) == len(ids)


# ---------------------------------------------------------------------------
# hypothesis fuzz: the cross-engine arithmetic identities X176-X178 rely on
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    s=st.integers(min_value=-(10**15), max_value=10**15),
    n=st.integers(min_value=1, max_value=10**6),
)
def test_trunc_div_identity_duckdb_vs_python(s, n):
    """The toward-zero division both engines must agree on:
    CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) END in DuckDB ==
    the same abs/negate split in python (== numpy's sign*(|s|//n)).
    DuckDB's bare // FLOORS on negatives — the split is what makes the
    centroid update engine-identical."""
    import duckdb

    want = s // n if s >= 0 else -((-s) // n)
    got = duckdb.sql(
        f"SELECT CASE WHEN {s} >= 0 THEN {s} // {n} "
        f"ELSE -((-({s})) // {n}) END"
    ).fetchone()[0]
    assert got == want, (s, n, got, want)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-2.0, max_value=2.0, allow_nan=False, width=32),
        min_size=1, max_size=8,
    )
)
def test_quantization_identity_duckdb_vs_numpy(vals):
    """floor(x*1000 + 0.5) must run the SAME IEEE steps on both engines
    for float32-representable inputs — the milli-quantization every
    clustering distance is built on."""
    import duckdb

    lit = "[" + ",".join(repr(v) for v in vals) + "]"
    got = duckdb.sql(
        f"SELECT list_transform(CAST({lit} AS DOUBLE[]), "
        "e -> CAST(floor(e * 1000 + 0.5) AS BIGINT))"
    ).fetchone()[0]
    want = np.floor(np.array(vals, dtype=np.float64) * 1000.0 + 0.5).astype(
        np.int64
    )
    assert list(got) == want.tolist(), (vals, got, want)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-2000, max_value=2000),
        min_size=2, max_size=64,
    ).flatmap(
        lambda a: st.tuples(
            st.just(a),
            st.lists(
                st.integers(min_value=-2000, max_value=2000),
                min_size=len(a), max_size=len(a),
            ),
        )
    )
)
def test_integer_double_dot_product_exact(pair):
    """list_dot_product over integer-valued DOUBLE lists is EXACT for
    milli-unit magnitudes (|terms| ≤ 64·4e6 « 2^53) — the identity
    that lets the k-means oracle avoid a per-dim explosion."""
    import duckdb

    a, b = pair
    la = "[" + ",".join(map(str, a)) + "]"
    lb = "[" + ",".join(map(str, b)) + "]"
    got = duckdb.sql(
        f"SELECT list_dot_product(CAST({la} AS DOUBLE[]), "
        f"CAST({lb} AS DOUBLE[]))"
    ).fetchone()[0]
    want = int(np.dot(np.array(a, dtype=np.int64), np.array(b, dtype=np.int64)))
    assert int(got) == want and float(got) == float(want), (got, want)
