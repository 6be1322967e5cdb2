"""Learned clustering for the vector store — X176 integer Lloyd
k-means, X177 IVF ANN re-pointed at the learned codebook (VERDICT r11
item 4 / r12 item 3 — "the ONE genuinely missing primitive in the
clustering story"), X178 cluster-quality census (cohesion +
separation) completing train → index → evaluate.

Determinism contract (the X121/X122 arithmetic pattern): embeddings
quantize to exact milli-unit int64 (same ``floor(x*1000+0.5)`` IEEE
steps on both engines), every distance is an exact integer
(squared-L2 over milli units; |q|,|c| ≤ ~2e3 → per-dim ≤ 1.6e7, ×64
dims ≤ ~1e9 — int64-safe by orders of magnitude), argmin tie-breaks on
the smallest cid, and the centroid update divides per-dim sums by the
member count with TOWARD-ZERO semantics made explicit on both engines
(``CASE WHEN s >= 0 THEN s div n ELSE -((-s) div n) END`` — Spark
``div`` truncates while DuckDB ``//`` floors; the abs/negate split
keeps every division's operands non-negative, where they agree).
Init is seeded md5: the K vectors with the smallest
``md5('km13-' || vec_id)`` become centroids 1..K in hash order — a
draw-independent, oracle-replayable analogue of random init.

Scale posture (100 TB): each Lloyd iteration is ONE corpus scan whose
map side reduces to |partitions| × K × D partial rows (numpy GEMM per
Arrow batch, the X100 gram-kernel cost model); the codebook itself is
K×D ≤ 512 values, collected (bounded by construction) between
iterations and broadcast into the next scan's closure. The returned
plan contains only the LAST iteration — one scan, one K×D-row shuffle,
one broadcast join against the K×D grid. The IVF entry's assignment
pass is the write-once partitioning column of X8: probing then reads
~nprobe/K of the corpus via partition pruning.

Reference parity: the reference engine has no clustering operator
(Flink delegates to its ML lib); these are §2.4-style gap-family
entries modeled on FAISS's IVF training flow (coarse k-means → inverted
lists), re-expressed Spark-first.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .registry import register

_DIM = 64
_Q_SCALE = 1000  # milli-unit embedding quantization (the X67/X100 lesson)
_K = 8  # codebook size
_ITER = 3  # fixed Lloyd iterations — deterministic trip count
_SEED_PREFIX = "km13-"  # md5 init salt
_NPROBE = 3  # IVF cells probed per query
_TOPK = 5
_NQUERIES = 5  # queries are vec_id < 5, matching X8's convention

_QUANT_SQL = (
    "list_transform(CAST(embedding AS DOUBLE[]), "
    f"e -> CAST(floor(e * {_Q_SCALE} + 0.5) AS BIGINT))"
)

# toward-zero integer division (see module docstring)
_TRUNC_DIV_SQL = "CASE WHEN {s} >= 0 THEN {s} // {n} ELSE -((-{s}) // {n}) END"
_TRUNC_DIV_SPARK = "CASE WHEN {s} >= 0 THEN {s} div {n} ELSE -((-{s}) div {n}) END"


def _emb(spark, sf_dir):
    from ..session import load_table

    return load_table(spark, sf_dir, "embeddings")


def _quantize(V: np.ndarray) -> np.ndarray:
    """floor(x*1000 + 0.5) as int64 — the same IEEE steps as _QUANT_SQL."""
    return np.floor(V.astype(np.float64) * _Q_SCALE + 0.5).astype(np.int64)


def _partial_sums_kernel(C: np.ndarray):
    """mapInPandas kernel: assign each vector to its nearest centroid of
    ``C`` (exact int64 squared-L2, ties → smallest cid index) and emit
    per-partition per-cluster per-dim partial sums + counts — K×D rows
    per partition regardless of how many vectors were scanned."""
    import pandas as pd

    def kernel(iterator):
        sums = np.zeros((_K, _DIM), dtype=np.int64)
        cnts = np.zeros(_K, dtype=np.int64)
        for pdf in iterator:
            pdf = pdf[pdf["embedding"].notna()]
            if not len(pdf):
                continue
            Q = _quantize(np.array(pdf["embedding"].to_list()))
            # ||q-c||² = ||q||² - 2 q·c + ||c||²; argmin over c. All
            # int64-exact; np.argmin takes the FIRST minimum → smallest
            # cid (C rows are cid-ordered).
            d2 = (
                (Q * Q).sum(axis=1)[:, None]
                - 2 * (Q @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            a = np.argmin(d2, axis=1)
            for k in range(_K):
                members = Q[a == k]
                if len(members):
                    sums[k] += members.sum(axis=0)
                    cnts[k] += len(members)
        live = cnts > 0
        if live.any():
            ks = np.nonzero(live)[0]
            yield pd.DataFrame(
                {
                    "cid": np.repeat(ks + 1, _DIM).astype(np.int32),
                    "d": np.tile(np.arange(1, _DIM + 1, dtype=np.int32), len(ks)),
                    "s": sums[ks].ravel(),
                    "cnt": np.repeat(cnts[ks], _DIM),
                }
            )

    return kernel


_PARTIAL_SCHEMA = "cid int, d int, s long, cnt long"


def _init_codebook(spark, sf_dir) -> np.ndarray:
    """Seeded-md5 init: the K vectors with the smallest
    ``md5('km13-' || vec_id)`` (vec_id tie-break), quantized, as
    centroids 1..K in hash order. TakeOrdered — never a full sort."""
    rows = (
        _emb(spark, sf_dir)
        .filter(F.col("embedding").isNotNull())
        .withColumn(
            "h",
            F.md5(F.concat(F.lit(_SEED_PREFIX), F.col("vec_id").cast("string"))),
        )
        .orderBy("h", "vec_id")
        .limit(_K)
        .select("embedding")
        .collect()
    )
    if len(rows) < _K:
        # fail loud: a sub-K corpus would mis-shape every downstream
        # K-row closure (kernels, grid, oracle init) — there is no
        # meaningful K-means of fewer than K points
        raise ValueError(
            f"k-means needs at least K={_K} non-null vectors; found {len(rows)}"
        )
    return _quantize(np.array([list(r.embedding) for r in rows]))


def _step(spark, sf_dir, C: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One eager Lloyd step: scan → partials → K×D collect → new codebook
    (empty clusters keep their previous centroid). Returns (C', counts)."""
    rows = (
        _emb(spark, sf_dir)
        .select("embedding")
        .mapInPandas(_partial_sums_kernel(C), _PARTIAL_SCHEMA)
        .groupBy("cid", "d")
        .agg(F.sum("s").alias("s"), F.sum("cnt").alias("cnt"))
        .collect()  # bounded: ≤ K×D = 512 rows by construction
    )
    C2 = C.copy()
    cnts = np.zeros(_K, dtype=np.int64)
    for r in rows:
        s, n = int(r.s), int(r.cnt)
        # toward-zero division, mirroring _TRUNC_DIV_SQL exactly
        C2[r.cid - 1, r.d - 1] = s // n if s >= 0 else -((-s) // n)
        cnts[r.cid - 1] = n
    return C2, cnts


def _train(spark, sf_dir, iters: int) -> np.ndarray:
    """Run ``iters`` eager Lloyd steps from the md5 init; returns the
    codebook AFTER those steps (milli-unit int64, K×D)."""
    C = _init_codebook(spark, sf_dir)
    for _ in range(iters):
        C, _cnts = _step(spark, sf_dir, C)
    return C


def _kmeans_ctes() -> str:
    """Shared oracle CTE chain: quantized corpus → md5 init → _ITER Lloyd
    steps. Ends with c{_ITER} (cid, cv list) and s{_ITER} (cid, d, s, n —
    the per-dim sums/counts of the membership that PRODUCED c{_ITER})."""
    parts = [
        f"""q AS MATERIALIZED (
      SELECT vec_id, {_QUANT_SQL} AS qv
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    qn AS MATERIALIZED (
      SELECT vec_id, qv,
             list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS qq
      FROM q
    ),
    c0 AS (
      SELECT row_number() OVER (
               ORDER BY md5('{_SEED_PREFIX}' || CAST(vec_id AS VARCHAR)), vec_id
             ) AS cid, qv AS cv
      FROM q
      ORDER BY md5('{_SEED_PREFIX}' || CAST(vec_id AS VARCHAR)), vec_id
      LIMIT {_K}
    )"""
    ]
    for t in range(1, _ITER + 1):
        p = t - 1
        div = _TRUNC_DIV_SQL.format(s="s.s", n="s.n")
        parts.append(
            f""",
    a{t} AS (
      -- nearest centroid by exact integer squared-L2 (values are
      -- integer-valued doubles ≤ ~1e9 — exact far below 2^53)
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rn
        FROM (
          SELECT qn.vec_id, c.cid,
                 qn.qq
                 - 2 * list_dot_product(CAST(qn.qv AS DOUBLE[]),
                                        CAST(c.cv AS DOUBLE[]))
                 + list_dot_product(CAST(c.cv AS DOUBLE[]),
                                    CAST(c.cv AS DOUBLE[])) AS d2
          FROM qn, c{p} c
        )
      ) WHERE rn = 1
    ),
    s{t} AS (
      SELECT a.cid, d.range AS d,
             CAST(sum(q.qv[d.range]) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM a{t} a JOIN q USING (vec_id), range(1, {_DIM + 1}) d
      GROUP BY 1, 2
    ),
    c{t} AS (
      -- empty cluster keeps its previous centroid
      SELECT prev.cid,
             COALESCE(m.cv, prev.cv) AS cv
      FROM c{p} prev LEFT JOIN (
        SELECT s.cid,
               list(CAST({div} AS BIGINT) ORDER BY s.d) AS cv
        FROM s{t} s GROUP BY 1
      ) m USING (cid)
    )"""
        )
    return "".join(parts)


def _kmeans_oracle() -> str:
    last = _ITER
    return f"""
    WITH {_kmeans_ctes()}
    SELECT CAST(prev.cid AS INTEGER) AS cid,
           CAST(COALESCE(s.n, 0) AS BIGINT) AS n_members,
           CAST(d.range AS INTEGER) AS dim,
           CAST(COALESCE({_TRUNC_DIV_SQL.format(s="s.s", n="s.n")},
                         prev.cv[d.range]) AS BIGINT) AS c_milli
    FROM c{last - 1} prev
    CROSS JOIN range(1, {_DIM + 1}) d
    LEFT JOIN s{last} s ON s.cid = prev.cid AND s.d = d.range
    """


@register(
    "kmeans_lloyd_embeddings",
    oracle=_kmeans_oracle(),
    doc=f"X176: integer Lloyd k-means codebook over the embedding store — "
    f"K={_K} centroids, {_ITER} fixed iterations, seeded-md5 init (the "
    "K smallest md5('km13-'||vec_id) vectors), exact int64 squared-L2 "
    "assignment with smallest-cid tie-break, toward-zero per-dim mean "
    "division, empty clusters hold their previous centroid. The oracle "
    "replays every iteration as SQL CTEs (the X122 deterministic-trip-"
    "count idiom). Scale: one corpus scan per iteration, map-side "
    "reduced to |partitions|*K*D partial rows; the returned plan holds "
    "only the LAST iteration — earlier codebooks are bounded K*D "
    "collects broadcast into the next scan's closure. Output: K*D rows "
    "(cid, n_members, dim, c_milli).",
    tags=("embeddings", "clustering", "kmeans", "iterative", "pipeline"),
)
def kmeans_lloyd_embeddings(spark, sf_dir):
    import pandas as pd

    C_prev = _train(spark, sf_dir, _ITER - 1)  # codebook entering the last step

    # Last iteration stays distributed: one scan → K×D-row shuffle →
    # broadcast join against the K×D previous-codebook grid (empty-
    # cluster fallback + n_members=0), toward-zero mean division.
    grid = spark.createDataFrame(
        pd.DataFrame(
            {
                "cid": np.repeat(np.arange(1, _K + 1), _DIM).astype(np.int32),
                "dim": np.tile(np.arange(1, _DIM + 1), _K).astype(np.int32),
                "c_prev": C_prev.ravel(),
            }
        )
    )
    partials = (
        _emb(spark, sf_dir)
        .select("embedding")
        .mapInPandas(_partial_sums_kernel(C_prev), _PARTIAL_SCHEMA)
        .groupBy("cid", "d")
        .agg(F.sum("s").alias("s"), F.sum("cnt").alias("cnt"))
    )
    mean = F.expr(_TRUNC_DIV_SPARK.format(s="s", n="cnt"))
    # right-outer with the K×D aggregate broadcast: grid rows (the full
    # codebook) are preserved, and a BroadcastHashJoin right-outer builds
    # on the LEFT — the only broadcastable shape that keeps the grid
    # (left-outer can only broadcast the non-preserved right side)
    return (
        F.broadcast(partials)
        .join(
            grid,
            (grid.cid == partials.cid) & (grid.dim == partials.d),
            "right",
        )
        .select(
            grid.cid.cast("int").alias("cid"),
            F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("n_members"),
            grid.dim.cast("int").alias("dim"),
            F.coalesce(mean, F.col("c_prev")).cast("bigint").alias("c_milli"),
        )
    )


def _ivf_oracle() -> str:
    last = _ITER
    return f"""
    WITH {_kmeans_ctes()},
    af AS (
      -- inverted file: every vector → nearest LEARNED centroid
      SELECT vec_id AS neighbor_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rn
        FROM (
          SELECT qn.vec_id, c.cid,
                 qn.qq
                 - 2 * list_dot_product(CAST(qn.qv AS DOUBLE[]),
                                        CAST(c.cv AS DOUBLE[]))
                 + list_dot_product(CAST(c.cv AS DOUBLE[]),
                                    CAST(c.cv AS DOUBLE[])) AS d2
          FROM qn, c{last} c
        )
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rn
        FROM (
          SELECT qn.vec_id, c.cid,
                 qn.qq
                 - 2 * list_dot_product(CAST(qn.qv AS DOUBLE[]),
                                        CAST(c.cv AS DOUBLE[]))
                 + list_dot_product(CAST(c.cv AS DOUBLE[]),
                                    CAST(c.cv AS DOUBLE[])) AS d2
          FROM qn, c{last} c
          WHERE qn.vec_id < {_NQUERIES}
        )
      ) WHERE rn <= {_NPROBE}
    ),
    cand AS (
      SELECT p.query_id, a.neighbor_id
      FROM probes p JOIN af a ON p.cid = a.cid
      WHERE a.neighbor_id <> p.query_id
    ),
    reranked AS (
      SELECT cand.query_id, cand.neighbor_id,
             round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                          CAST(ne.embedding AS DOUBLE[])), 4)
               AS cos_sim
      FROM cand
      JOIN embeddings qe ON qe.vec_id = cand.query_id
      JOIN embeddings ne ON ne.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, rk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rk
      FROM reranked
    ) WHERE rk <= {_TOPK}
    """


def _assign_kernel(C: np.ndarray, nprobe: int):
    """mapInPandas kernel: (vec_id, embedding) → the ``nprobe`` nearest
    learned centroids by the SAME exact-integer metric as training."""
    import pandas as pd

    def kernel(iterator):
        for pdf in iterator:
            pdf = pdf[pdf["embedding"].notna()]
            if not len(pdf):
                continue
            Q = _quantize(np.array(pdf["embedding"].to_list()))
            d2 = (
                (Q * Q).sum(axis=1)[:, None]
                - 2 * (Q @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            # stable argsort: ties keep cid-ascending order
            top = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
            ids = pdf["vec_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, nprobe),
                    "cid": (top + 1).astype(np.int64).ravel(),
                }
            )

    return kernel


@register(
    "ann_ivf_kmeans_topk",
    oracle=_ivf_oracle(),
    doc=f"X177: the X8 IVF ANN re-pointed at the LEARNED codebook — cell "
    "assignment and query probes use the X176 k-means centroids (same "
    "exact-integer squared-L2 metric as training, smallest-cid "
    f"tie-break), nprobe={_NPROBE} of K={_K} cells, exact cosine re-rank "
    f"(4dp) of candidates, top-{_TOPK} per query. Scale: training is "
    f"{_ITER} map-reduced scans; the assignment is the write-once IVF "
    "partitioning column — probing reads ~nprobe/K of the corpus via "
    "partition pruning; re-rank touches only probed cells' members.",
    tags=("similarity", "approx", "ivf", "clustering", "kmeans"),
)
def ann_ivf_kmeans_topk(spark, sf_dir):
    C = _train(spark, sf_dir, _ITER)  # the learned codebook (bounded collects)
    emb = _emb(spark, sf_dir)

    assign = (
        emb.select("vec_id", "embedding")
        .mapInPandas(_assign_kernel(C, 1), "vec_id long, cid long")
        .withColumnRenamed("vec_id", "neighbor_id")
    )
    probes = (
        emb.filter(F.col("vec_id") < _NQUERIES)
        .select("vec_id", "embedding")
        .mapInPandas(_assign_kernel(C, _NPROBE), "vec_id long, cid long")
        .withColumnRenamed("vec_id", "query_id")
    )

    def _cos(a, b):
        av, bv = F.col(a).cast("array<double>"), F.col(b).cast("array<double>")
        dot = F.aggregate(
            F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
        )
        na = F.sqrt(
            F.aggregate(
                F.transform(av, lambda x: x * x), F.lit(0.0), lambda s, x: s + x
            )
        )
        nb = F.sqrt(
            F.aggregate(
                F.transform(bv, lambda x: x * x), F.lit(0.0), lambda s, x: s + x
            )
        )
        return dot / (na * nb)

    q_emb = emb.filter(F.col("vec_id") < _NQUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    n_emb = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb")
    )
    cand = (
        F.broadcast(probes)
        .join(assign, "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(q_emb), "query_id")
        .join(n_emb, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cos("q_emb", "n_emb"), 4).alias("cos_sim"),
        )
    )
    w_rank = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= _TOPK)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def _quality_oracle() -> str:
    last = _ITER
    return f"""
    WITH {_kmeans_ctes()},
    ad AS (
      -- final assignment WITH its (exact integer) squared distance
      SELECT vec_id, cid, CAST(d2 AS BIGINT) AS d2 FROM (
        SELECT vec_id, cid, d2,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rn
        FROM (
          SELECT qn.vec_id, c.cid,
                 qn.qq
                 - 2 * list_dot_product(CAST(qn.qv AS DOUBLE[]),
                                        CAST(c.cv AS DOUBLE[]))
                 + list_dot_product(CAST(c.cv AS DOUBLE[]),
                                    CAST(c.cv AS DOUBLE[])) AS d2
          FROM qn, c{last} c
        )
      ) WHERE rn = 1
    ),
    wss AS (
      SELECT cid, CAST(sum(d2) AS BIGINT) AS wss,
             CAST(count(*) AS BIGINT) AS n
      FROM ad GROUP BY 1
    ),
    sep AS (
      -- nearest OTHER centroid (exact integer separation; K*K grid)
      SELECT cid, nn_cid, nn_d2 FROM (
        SELECT a.cid, b.cid AS nn_cid,
               CAST(list_dot_product(CAST(a.cv AS DOUBLE[]),
                                     CAST(a.cv AS DOUBLE[]))
               - 2 * list_dot_product(CAST(a.cv AS DOUBLE[]),
                                      CAST(b.cv AS DOUBLE[]))
               + list_dot_product(CAST(b.cv AS DOUBLE[]),
                                  CAST(b.cv AS DOUBLE[])) AS BIGINT) AS nn_d2,
               row_number() OVER (
                 PARTITION BY a.cid
                 ORDER BY list_dot_product(CAST(a.cv AS DOUBLE[]),
                                           CAST(a.cv AS DOUBLE[]))
                 - 2 * list_dot_product(CAST(a.cv AS DOUBLE[]),
                                        CAST(b.cv AS DOUBLE[]))
                 + list_dot_product(CAST(b.cv AS DOUBLE[]),
                                    CAST(b.cv AS DOUBLE[])), b.cid) AS rn
        FROM c{last} a, c{last} b WHERE a.cid <> b.cid
      ) WHERE rn = 1
    )
    SELECT CAST(c.cid AS INTEGER) AS cid,
           CAST(COALESCE(w.n, 0) AS BIGINT) AS n_members,
           CAST(COALESCE(w.wss, 0) AS BIGINT) AS wss,
           CAST(s.nn_cid AS INTEGER) AS nn_cid,
           s.nn_d2 AS nn_d2
    FROM c{last} c
    LEFT JOIN wss w USING (cid)
    JOIN sep s USING (cid)
    """


def _quality_kernel(C: np.ndarray):
    """mapInPandas kernel: per-partition per-cluster member count and
    within-cluster sum of (exact int64) squared distances — K rows per
    partition regardless of corpus size."""
    import pandas as pd

    def kernel(iterator):
        wss = np.zeros(_K, dtype=np.int64)
        cnts = np.zeros(_K, dtype=np.int64)
        for pdf in iterator:
            pdf = pdf[pdf["embedding"].notna()]
            if not len(pdf):
                continue
            Q = _quantize(np.array(pdf["embedding"].to_list()))
            d2 = (
                (Q * Q).sum(axis=1)[:, None]
                - 2 * (Q @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            a = np.argmin(d2, axis=1)
            dmin = d2[np.arange(len(Q)), a]
            for k in range(_K):
                sel = a == k
                if sel.any():
                    wss[k] += dmin[sel].sum()
                    cnts[k] += int(sel.sum())
        live = cnts > 0
        if live.any():
            ks = np.nonzero(live)[0]
            yield pd.DataFrame(
                {
                    "cid": (ks + 1).astype(np.int32),
                    "wss": wss[ks],
                    "cnt": cnts[ks],
                }
            )

    return kernel


@register(
    "kmeans_cluster_quality",
    oracle=_quality_oracle(),
    doc="X178: quality census of the X176 learned codebook — per cluster "
    "the member count, the exact-integer within-cluster sum of squared "
    "distances (cohesion), and the nearest OTHER centroid with its "
    "exact separation (the K*K grid, driver-side numpy on the bounded "
    "codebook). Completes the clustering story: train (X176) -> index "
    "(X177) -> evaluate (X178). All values exact int64 (milli-unit "
    "squared distances; sum <= n * 64 * 4e6 -- int64-safe to ~3e10 "
    "vectors), so the cross-engine match is exact. Scale: training's "
    "3 map-reduced scans + ONE quality scan whose shuffle carries "
    "K rows per partition; the separation grid never touches the "
    "corpus.",
    tags=("embeddings", "clustering", "kmeans", "evaluation", "pipeline"),
)
def kmeans_cluster_quality(spark, sf_dir):
    import pandas as pd

    C = _train(spark, sf_dir, _ITER)
    # nearest-other-centroid separation on the K-row codebook: exact
    # integers, smallest-cid tie-break (stable argsort mirror of the
    # oracle's ORDER BY d2, cid)
    G = (
        (C * C).sum(axis=1)[:, None]
        - 2 * (C @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )
    np.fill_diagonal(G, np.iinfo(np.int64).max)
    nn = G.argmin(axis=1)  # first min = smallest cid on ties
    grid = spark.createDataFrame(
        pd.DataFrame(
            {
                "cid": np.arange(1, _K + 1, dtype=np.int32),
                "nn_cid": (nn + 1).astype(np.int32),
                "nn_d2": G[np.arange(_K), nn],
            }
        )
    )
    partials = (
        _emb(spark, sf_dir)
        .select("embedding")
        .mapInPandas(_quality_kernel(C), "cid int, wss long, cnt long")
        .groupBy("cid")
        .agg(F.sum("wss").alias("wss_s"), F.sum("cnt").alias("cnt_s"))
    )
    return (
        F.broadcast(partials)
        .join(grid, partials.cid == grid.cid, "right")
        .select(
            grid.cid.cast("int").alias("cid"),
            F.coalesce(F.col("cnt_s"), F.lit(0)).cast("bigint").alias("n_members"),
            F.coalesce(F.col("wss_s"), F.lit(0)).cast("bigint").alias("wss"),
            F.col("nn_cid").cast("int").alias("nn_cid"),
            F.col("nn_d2").cast("bigint").alias("nn_d2"),
        )
    )
