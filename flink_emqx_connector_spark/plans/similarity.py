"""Similarity-search queries over ``embeddings`` (operators/similarity.py)."""

from __future__ import annotations

import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators import similarity as S
from .registry import register


def _emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _query_vec(spark, sf_dir) -> list[float]:
    """The embedding of vec_id=0 — a data-derived, deterministic query."""
    row = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .head()
    )
    return [float(x) for x in row[0]]


@register(
    "ann_topk_cosine",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT 10
    """,
    doc="Exact brute-force cosine top-10 to a query vector (the ANN "
    "baseline): one scan + TakeOrdered, scoring as one numpy matvec per "
    "Arrow batch. operators/similarity.py:cosine_topk.",
    tags=("similarity", "topk"),
)
def ann_topk_cosine(spark, sf_dir):
    q = _query_vec(spark, sf_dir)
    return S.cosine_topk(_emb(spark, sf_dir), q, k=10, exclude_id=0)


def _lsh_oracle_sql() -> str:
    """Full SQL replica of the RP-LSH query: the 8 seeded hyperplanes are
    deterministic constants, so they inline as DOUBLE[] literals; the
    query's bucket and its Hamming-1 multi-probe are computed in SQL."""
    planes = S._rp_planes(64, 8, 42)
    plane_cols = ", ".join(
        f"[{', '.join(repr(float(x)) for x in planes[i])}]::DOUBLE[] AS p{i}"
        for i in range(8)
    )
    bucket_expr = " || ".join(
        f"(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]), p.p{i}) >= 0 "
        "THEN '1' ELSE '0' END)"
        for i in range(8)
    )
    ham = " + ".join(
        f"(CASE WHEN substr(b.bucket,{i+1},1) <> substr(q.qb,{i+1},1) "
        "THEN 1 ELSE 0 END)"
        for i in range(8)
    )
    return f"""
    WITH p AS (SELECT {plane_cols}),
    b AS (
      SELECT e.vec_id, e.embedding, {bucket_expr} AS bucket
      FROM embeddings e, p
    ),
    q AS (SELECT bucket AS qb, CAST(embedding AS DOUBLE[]) AS qv FROM b WHERE vec_id = 0)
    SELECT b.vec_id,
           round(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]), q.qv), 4) AS cos_sim
    FROM b, q
    WHERE b.vec_id <> 0 AND ({ham}) <= 1
    ORDER BY cos_sim DESC, b.vec_id
    LIMIT 10
    """


@register(
    "ann_lsh_topk",
    oracle=_lsh_oracle_sql(),
    doc="Random-hyperplane LSH ANN: 8 seeded planes → 256 buckets, "
    "multi-probe Hamming-1, exact re-rank of candidates. The scale path: "
    "a query touches ~9/256 of the corpus. Fully deterministic, so the "
    "oracle replays it in SQL with the planes inlined as literals. "
    "operators/similarity.py:rp_lsh_topk.",
    tags=("similarity", "approx", "lsh"),
)
def ann_lsh_topk(spark, sf_dir):
    q = _query_vec(spark, sf_dir)
    return S.rp_lsh_topk(_emb(spark, sf_dir), q, k=10, exclude_id=0)


@register(
    "ann_ivf_topk",
    oracle="""
    WITH cents AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings WHERE vec_id < 16
    ),
    scored AS (
      SELECT e.vec_id, c.cid,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv), 6)
               AS csim
      FROM embeddings e, cents c
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
        FROM scored WHERE vec_id < 5
      ) WHERE rn <= 4
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a ON p.cid = a.cid
      WHERE a.vec_id <> p.query_id
    ),
    reranked AS (
      SELECT cand.query_id, cand.neighbor_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(n.embedding AS DOUBLE[])), 4) AS cos_sim
      FROM cand
      JOIN embeddings q ON q.vec_id = cand.query_id
      JOIN embeddings n ON n.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, rk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rk
      FROM reranked
    ) WHERE rk <= 5
    """,
    doc="IVF-style ANN: 16 deterministic coarse centroids (vec_id < 16 as "
    "the 'trained' codebook), every vector assigned to its nearest centroid "
    "(one broadcast nested-loop pass — the inverted file), queries probe "
    "their nprobe=4 nearest cells and exactly re-rank only those cells' "
    "members. At 100 TB the assignment is a write-once partitioning column: "
    "probing reads ~nprobe/nlist of the corpus via partition pruning.",
    tags=("similarity", "approx", "ivf"),
)
def ann_ivf_topk(spark, sf_dir):
    import numpy as np
    import pandas as pd

    emb = _emb(spark, sf_dir)
    # The 'trained' codebook is tiny by construction — collect and close
    # over it (the broadcast-build-side of the assignment). Columns are
    # ordered by cid, so numpy argmax/stable-argsort tie-break = smallest
    # cid, matching the oracle's ORDER BY csim DESC, cid.
    cent_rows = sorted(
        emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )
    cids = np.array([r.vec_id for r in cent_rows], dtype=np.int64)
    C = np.array([r.embedding for r in cent_rows], dtype=np.float64)
    c_norm = np.sqrt((C * C).sum(axis=1))

    def _round_half_away(x, decimals):
        # DuckDB/Spark round() semantics; np.round is banker's.
        p = 10.0**decimals
        return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p

    def _cell_kernel(nprobe):
        def kernel(iterator):
            for pdf in iterator:
                if not len(pdf):
                    continue
                V = np.array(pdf["embedding"].to_list(), dtype=np.float64)
                v_norm = np.sqrt((V * V).sum(axis=1))
                sims = _round_half_away(
                    (V @ C.T) / (v_norm[:, None] * c_norm[None, :]), 6
                )
                # stable argsort on -sims: ties keep cid-ascending order
                top = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
                ids = pdf["vec_id"].to_numpy()
                yield pd.DataFrame(
                    {
                        "vec_id": np.repeat(ids, nprobe),
                        "cid": cids[top].ravel(),
                    }
                )

        return kernel

    # Inverted file: every vector → its nearest cell. One numpy GEMM per
    # Arrow batch — at 100 TB this is the write-once partitioning pass.
    assign = emb.select("vec_id", "embedding").mapInPandas(
        _cell_kernel(1), "vec_id long, cid long"
    ).withColumnRenamed("vec_id", "neighbor_id")
    probes = (
        emb.filter(F.col("vec_id") < 5)
        .select("vec_id", "embedding")
        .mapInPandas(_cell_kernel(4), "vec_id long, cid long")
        .withColumnRenamed("vec_id", "query_id")
    )

    def _cos(a, b):
        av, bv = F.col(a).cast("array<double>"), F.col(b).cast("array<double>")
        dot = F.aggregate(F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
        na = F.sqrt(F.aggregate(F.transform(av, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
        nb = F.sqrt(F.aggregate(F.transform(bv, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
        return dot / (na * nb)

    q_emb = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    n_emb = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb"))
    cand = (
        F.broadcast(probes)
        .join(assign, "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(q_emb.filter(F.col("query_id") < 5)), "query_id")
        .join(n_emb, "neighbor_id")
        .select("query_id", "neighbor_id", F.round(_cos("q_emb", "n_emb"), 4).alias("cos_sim"))
    )
    w_rank = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


# --------------------------------------------------------------------------
# knn_graph_lsh: occupancy-targeted plane count (r9 verdict item 3).
#
# Any FIXED plane count makes in-bucket pair work Σm² ≈ n²/2^planes —
# quadratic in the corpus; the round-9 probe measured the old planes=8 demo
# at 12.9× per 10× data (9.0 → 116.7 s sf1→sf10). The fix is the
# auto_n_planes policy (operators/similarity.py) made SQL-replayable via
# the packing-shards pattern: generate 16 seeded planes (the first 8 rows
# of the seed-42 matrix are bit-identical to the old 8-plane matrix, so
# small-SF results are unchanged), compute the full 16-bit bucket string,
# and use only its first `blen` bits where
#
#   blen = 8 + Σ_{j=8}^{15} [n > 64·2^j]   (n = corpus count)
#
# — i.e. clamp(ceil(log2(n/64)), 8, 16): the expected bucket holds ~64
# vectors, so per-bucket pair cost is constant and total pair work is
# O(n·64) — linear. The indicator-sum form is pure integer arithmetic, so
# BOTH engines derive the identical blen with zero float-log2 edge risk:
# the oracle via a scalar subquery over count(*), the Spark plan from the
# parquet footer row count (no job). At the test regime: 2k vecs → 8 bits,
# 20k → 9, 200k → 12 (occupancy ~49).
# --------------------------------------------------------------------------

_KNN_OCCUPANCY = 64
_KNN_MIN_PLANES, _KNN_MAX_PLANES = 8, 16


def _knn_prefix_len(n: int) -> int:
    blen = _KNN_MIN_PLANES
    for j in range(_KNN_MIN_PLANES, _KNN_MAX_PLANES):
        blen += int(n > _KNN_OCCUPANCY * (1 << j))
    return blen


def _emb_count(sf_dir: str) -> int:
    """Embeddings row count from parquet footer metadata — the same value
    the oracle's scalar subquery computes, without running a Spark job.
    Dataset-aware: handles both a single file and a directory dataset."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(path):
        return pq.ParquetDataset(path).count_rows()
    return pq.ParquetFile(path).metadata.num_rows


def _knn_graph_oracle_sql() -> str:
    """kNN-graph oracle: 16 inlined seeded planes → 16-bit bucket string,
    truncated to the corpus-derived prefix length (scalar subquery, integer
    indicator sum — see the policy comment above), then per-vector top-3
    within the bucket by (rounded cosine desc, id)."""
    planes = S._rp_planes(64, _KNN_MAX_PLANES, 42)
    plane_cols = ", ".join(
        f"[{', '.join(repr(float(x)) for x in planes[i])}]::DOUBLE[] AS p{i}"
        for i in range(_KNN_MAX_PLANES)
    )
    bucket_expr = " || ".join(
        f"(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]), p.p{i}) >= 0 "
        "THEN '1' ELSE '0' END)"
        for i in range(_KNN_MAX_PLANES)
    )
    blen_expr = " + ".join(
        [str(_KNN_MIN_PLANES)]
        + [
            f"CAST(count(*) > {_KNN_OCCUPANCY * (1 << j)} AS INT)"
            for j in range(_KNN_MIN_PLANES, _KNN_MAX_PLANES)
        ]
    )
    return f"""
    WITH p AS (SELECT {plane_cols}),
    bl AS (SELECT {blen_expr} AS blen FROM embeddings),
    b AS (
      SELECT e.vec_id, e.embedding,
             substr({bucket_expr}, 1, bl.blen) AS bucket
      FROM embeddings e, p, bl
    ),
    scored AS (
      SELECT a.vec_id AS src, c.vec_id AS dst,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 4) AS cos_sim
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
    )
    SELECT src, dst, cos_sim, rk FROM (
      SELECT *, row_number() OVER (PARTITION BY src
                                   ORDER BY cos_sim DESC, dst) AS rk
      FROM scored
    ) WHERE rk <= 3
    """


@register(
    "knn_graph_lsh",
    oracle=_knn_graph_oracle_sql(),
    doc="Self-kNN graph: every vector's top-3 neighbors within its LSH "
    "bucket — the blocked all-pairs shape that builds the neighbor graph "
    "for graph-based clustering/dedup (bucket = join key = partition key; "
    "no quadratic cross join). The plane count is occupancy-targeted from "
    "the corpus count (auto_n_planes policy, ~64 vectors/bucket expected) "
    "so in-bucket pair work stays O(n·64) — LINEAR in the corpus, unlike "
    "the fixed-plane variant round 9 measured at 12.9× per 10× data. Both "
    "engines derive the identical plane count by integer arithmetic "
    "(oracle: scalar subquery; plan: parquet footer), keeping the query "
    "fully SQL-replayable with static inlined plane literals.",
    tags=("similarity", "knn", "graph", "lsh"),
)
def knn_graph_lsh(spark, sf_dir):
    from ..operators.similarity import cosine_pairs_vectorized, rp_lsh_buckets

    blen = _knn_prefix_len(_emb_count(sf_dir))
    b = (
        rp_lsh_buckets(_emb(spark, sf_dir), n_planes=_KNN_MAX_PLANES, dim=64)
        .withColumn("bucket", F.substring("bucket", 1, blen))
        .select("vec_id", "embedding", "bucket")
    )
    a = b.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("emb_a"),
        "bucket",
    )
    c = b.select(
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("emb_b"),
        F.col("bucket").alias("bucket_c"),
    )
    pairs = a.join(
        c, (a.bucket == c.bucket_c) & (F.col("src") != F.col("dst"))
    ).select("src", "dst", "emb_a", "emb_b")
    scored = cosine_pairs_vectorized(pairs, "emb_a", "emb_b").select(
        "src", "dst", F.round("cos_sim", 4).alias("cos_sim")
    )
    w = W.partitionBy("src").orderBy(F.col("cos_sim").desc(), F.col("dst"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("src", "dst", "cos_sim", "rk")
    )


@register(
    "knn_join_topk",
    oracle="""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 4) AS cos_sim
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 20
    )
    SELECT query_id, neighbor_id, cos_sim, rk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rk
      FROM scored
    )
    WHERE rk <= 3
    """,
    doc="k-NN join: top-3 neighbors for each of the first 20 vectors — "
    "broadcast the (tiny) query side, window re-rank per query. At scale "
    "the candidate side is first restricted by LSH bucket.",
    tags=("similarity", "knn", "join"),
)
def knn_join_topk(spark, sf_dir):
    from ..operators.similarity import cosine_pairs_vectorized

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cand = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    pairs = (
        F.broadcast(queries)
        .join(cand, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "q_emb", "c_emb")
    )
    scored = cosine_pairs_vectorized(pairs, "q_emb", "c_emb").select(
        "query_id", "neighbor_id", F.round("cos_sim", 4).alias("cos_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )
