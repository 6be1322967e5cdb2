"""Round-8 wave of ML linear-algebra / evaluation operators
(SURVEY.md §2.5 X100-X103): distributed Gram matrix, truncated-dimension
ANN recall, Markov stationary distribution by exact power iteration, and
a Pareto-frontier (skyline) query. Absent from the reference by design
scope (it is a connector — SURVEY §0); these are the model-side
analytics a training-data platform runs over its embedding store and
event logs.

Determinism strategy (the r7 lesson, generalized): every floating-point
reduction whose ACCUMULATION ORDER differs between engines is replaced
by integer arithmetic — embeddings quantize to exact milli-unit int64
before any product, Markov probabilities are exact micro-unit integer
divisions — so sums are associative and order-free, and the DuckDB
oracle hash-matches bit-for-bit at every scale factor instead of
agreeing "up to an ulp".

Scale posture, per operator:
- Gram matrix: the map side computes a per-partition 64x64 integer
  Q^T Q with one BLAS-shaped numpy product per Arrow batch and emits
  2 080 upper-triangle partials; the shuffle carries
  |partitions| x 2 080 rows regardless of corpus size — the classic
  distributed-covariance pattern (the 100 TB reduction is in the map).
- truncated-dim recall: the query set is a fixed bounded eval sample
  (<= 64 vectors, broadcast into the kernel); each Arrow batch emits
  only its LOCAL top-k per query per metric (global top-k is a subset
  of the union of batch top-ks), so the shuffle carries
  |batches| x |queries| x 2k rows, never |corpus| x |queries|.
- Markov stationary: the corpus-sized work is ONE (user) shuffle to
  order each user's events; everything after is |states|^2 rows. The
  three power-iteration steps are chained joins on that tiny relation —
  the iterative-dataflow shape, with exact integer state.
- Pareto frontier: dominance is resolved on the DISTINCT (price, size)
  point set — the corpus reduces via one groupBy before any ordering;
  the cumulative-max pass then runs over |distinct prices| rows. The
  window is a deliberate single-partition pass over that reduced set
  (bounded by the price domain); an unbounded domain would take the
  range-partitioned two-phase skyline merge instead (local frontier
  per range, then frontier-of-frontiers — same operators).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Window, functions as F

from .registry import register

_DIM = 64
_Q_SCALE = 1000  # milli-unit embedding quantization
_TRUNC = 16  # truncated prefix dimensions for the recall probe
_K = 10  # recall@k
_QUERY_MOD = 100  # vec_id % mod == 0 -> eval query
_QUERY_CAP = 6400  # vec_id bound: <= 64 eval queries at any scale
_P_SCALE = 1_000_000  # micro-unit transition probabilities
_N_ITER = 3  # power-iteration steps


def _emb(spark, sf_dir):
    from ..session import load_table

    return load_table(spark, sf_dir, "embeddings")


def _events(spark, sf_dir):
    from ..session import load_table

    return load_table(spark, sf_dir, "events")


_QUANT_SQL = (
    "list_transform(CAST(embedding AS DOUBLE[]), "
    f"e -> CAST(floor(e * {_Q_SCALE} + 0.5) AS BIGINT))"
)


def _quantize(V: np.ndarray) -> np.ndarray:
    """floor(x*1000 + 0.5) as int64 — the same IEEE steps as the SQL."""
    return np.floor(V.astype(np.float64) * _Q_SCALE + 0.5).astype(np.int64)


@register(
    "embedding_gram_matrix",
    oracle=f"""
    WITH q AS (
      SELECT {_QUANT_SQL} AS q
      FROM embeddings WHERE embedding IS NOT NULL
    ), p AS (
      SELECT i.range AS i, j.range AS j
      FROM range(1, {_DIM + 1}) i, range(1, {_DIM + 1}) j
      WHERE i.range <= j.range
    )
    SELECT CAST(p.i AS INTEGER) AS i, CAST(p.j AS INTEGER) AS j,
           CAST(sum(q.q[p.i] * q.q[p.j]) AS BIGINT) AS g_milli
    FROM q, p GROUP BY 1, 2
    """,
    doc="X100: distributed Gram matrix X^T X over the embedding store — "
    "the input to PCA / whitening / covariance drift monitoring. "
    "Elements quantize to exact milli-unit int64 (the X67 "
    "scaled-integer lesson), so partial products are associative and "
    "the cross-engine match is exact, not ulp-lucky. Map side: one "
    "numpy Q^T Q per Arrow batch, accumulated per partition; the "
    "shuffle moves |partitions| x 2080 upper-triangle rows no matter "
    "how many vectors were scanned — the classic distributed-"
    "covariance reduction. Output is dim-bounded (2 080 rows).",
    tags=("embeddings", "linalg", "pca", "pipeline"),
)
def embedding_gram_matrix(spark, sf_dir):
    import pandas as pd

    from pyspark.sql import types as T

    iu = np.triu_indices(_DIM)

    def kernel(iterator):
        G = np.zeros((_DIM, _DIM), dtype=np.int64)
        seen = False
        for pdf in iterator:
            pdf = pdf[pdf["embedding"].notna()]
            if not len(pdf):
                continue
            Q = _quantize(np.array(pdf["embedding"].to_list()))
            G += Q.T @ Q
            seen = True
        if seen:
            yield pd.DataFrame(
                {
                    "i": (iu[0] + 1).astype(np.int32),
                    "j": (iu[1] + 1).astype(np.int32),
                    "g": G[iu],
                }
            )

    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("g", T.LongType()),
        ]
    )
    partials = _emb(spark, sf_dir).select("embedding").mapInPandas(kernel, schema)
    return partials.groupBy("i", "j").agg(
        F.sum("g").cast("bigint").alias("g_milli")
    )


@register(
    "ann_truncated_dim_recall",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, {_QUANT_SQL} AS qv
      FROM embeddings WHERE embedding IS NOT NULL
    ), que AS (
      SELECT vec_id AS query_id, qv AS quv FROM q
      WHERE vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}
    ), sc AS (
      SELECT que.query_id, q.vec_id,
             CAST(list_sum(list_transform(range(1, {_DIM + 1}),
                  k -> q.qv[k] * que.quv[k])) AS BIGINT) AS dot_full,
             CAST(list_sum(list_transform(range(1, {_TRUNC + 1}),
                  k -> q.qv[k] * que.quv[k])) AS BIGINT) AS dot_trunc
      FROM q, que WHERE q.vec_id <> que.query_id
    ), rk AS (
      SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY dot_full DESC, vec_id) AS rf,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY dot_trunc DESC, vec_id) AS rt
      FROM sc
    )
    SELECT query_id,
           CAST(count(*) FILTER (WHERE rf <= {_K} AND rt <= {_K}) AS BIGINT)
             AS n_overlap,
           count(*) FILTER (WHERE rf <= {_K} AND rt <= {_K}) / {_K}.0
             AS recall_at_k
    FROM rk GROUP BY 1
    """,
    doc="X101: truncated-dimension retrieval recall (the Matryoshka-"
    "embedding question): for each eval query, recall@{k} of the "
    "{t}-dim-prefix dot-product ranking against the full {d}-dim "
    "ranking. Decides whether a cheaper truncated index is safe before "
    "rebuilding a 100 TB ANN index. Query set is a fixed bounded "
    "sample (<= 64 vectors, broadcast into the kernel); scoring is one "
    "integer GEMM per Arrow batch that emits only the batch-local "
    "top-{k} per query per metric — global top-{k} is a subset of the "
    "union of batch top-{k}s, so the shuffle carries "
    "|batches| x |queries| x 2k rows, never |corpus| x |queries|. "
    "Quantized int64 dots make both rankings exactly reproducible in "
    "the oracle.".format(k=_K, t=_TRUNC, d=_DIM),
    tags=("embeddings", "similarity", "evaluation", "recall"),
)
def ann_truncated_dim_recall(spark, sf_dir):
    import pandas as pd

    from pyspark.sql import types as T

    qrows = (
        _emb(spark, sf_dir)
        .filter(
            (F.col("vec_id") % _QUERY_MOD == 0)
            & (F.col("vec_id") < _QUERY_CAP)
            & F.col("embedding").isNotNull()
        )
        .select("vec_id", "embedding")
        .collect()  # bounded: <= 64 eval queries by construction
    )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    if not len(qids):  # no eval queries in this corpus: empty result plan
        return (
            _emb(spark, sf_dir)
            .select(
                F.col("vec_id").alias("query_id"),
                F.lit(0).cast("bigint").alias("n_overlap"),
                F.lit(0.0).alias("recall_at_k"),
            )
            .filter(F.lit(False))
        )
    QM = _quantize(np.array([list(r["embedding"]) for r in qrows]))

    def kernel(iterator):
        for pdf in iterator:
            pdf = pdf[pdf["embedding"].notna()]
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            Q = _quantize(np.array(pdf["embedding"].to_list()))
            S_full = Q @ QM.T  # (batch, n_queries) int64
            S_trunc = Q[:, :_TRUNC] @ QM[:, :_TRUNC].T
            out_q, out_v, out_f, out_t = [], [], [], []
            for c in range(len(qids)):
                mask = ids != qids[c]
                cand_ids = ids[mask]
                if not len(cand_ids):
                    continue
                fc, tc = S_full[mask, c], S_trunc[mask, c]
                # batch-local top-k per metric under the SAME total order
                # as the global ranking (dot desc, vec_id asc) — a tied
                # global winner must not lose a local tie by batch index
                keep = set()
                for col in (fc, tc):
                    top = np.lexsort((cand_ids, -col))[:_K]
                    keep.update(top.tolist())
                idx = sorted(keep)
                out_q.extend([qids[c]] * len(idx))
                out_v.extend(cand_ids[idx].tolist())
                out_f.extend(fc[idx].tolist())
                out_t.extend(tc[idx].tolist())
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.array(out_q, dtype=np.int64),
                        "vec_id": np.array(out_v, dtype=np.int64),
                        "dot_full": np.array(out_f, dtype=np.int64),
                        "dot_trunc": np.array(out_t, dtype=np.int64),
                    }
                )

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("dot_full", T.LongType()),
            T.StructField("dot_trunc", T.LongType()),
        ]
    )
    cand = (
        _emb(spark, sf_dir)
        .select("vec_id", "embedding")
        .mapInPandas(kernel, schema)
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("dot_full").desc(), "vec_id"
    )
    wt = Window.partitionBy("query_id").orderBy(
        F.col("dot_trunc").desc(), "vec_id"
    )
    rk = cand.select(
        "query_id",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wt).alias("rt"),
    )
    return rk.groupBy("query_id").agg(
        F.sum(((F.col("rf") <= _K) & (F.col("rt") <= _K)).cast("bigint"))
        .cast("bigint")
        .alias("n_overlap"),
    ).select(
        "query_id",
        "n_overlap",
        (F.col("n_overlap") / float(_K)).alias("recall_at_k"),
    )


@register(
    "markov_stationary_events",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ), trans AS (
      SELECT prev AS s, event_type AS d, count(*) AS cnt
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    ), tot AS (
      SELECT s, sum(cnt) AS tot FROM trans GROUP BY 1
    ), p AS (
      SELECT t.s, t.d, (t.cnt * {_P_SCALE}) // tot.tot AS pm
      FROM trans t JOIN tot USING (s)
    ), states AS (
      SELECT DISTINCT event_type AS st FROM events
    ), v0 AS (
      SELECT st, CAST({_P_SCALE} // count(*) OVER () AS BIGINT) AS v
      FROM states
    ), v1 AS (
      SELECT p.d AS st, sum(v0.v * p.pm) // {_P_SCALE} AS v
      FROM v0 JOIN p ON p.s = v0.st GROUP BY 1
    ), v2 AS (
      SELECT p.d AS st, sum(v1.v * p.pm) // {_P_SCALE} AS v
      FROM v1 JOIN p ON p.s = v1.st GROUP BY 1
    ), v3 AS (
      SELECT p.d AS st, sum(v2.v * p.pm) // {_P_SCALE} AS v
      FROM v2 JOIN p ON p.s = v2.st GROUP BY 1
    )
    SELECT s.st AS event_type,
           CAST(coalesce(v3.v, 0) AS BIGINT) AS stationary_micro,
           CAST(coalesce(v3.v, 0) AS DOUBLE) / {_P_SCALE} AS stationary_prob
    FROM states s LEFT JOIN v3 ON v3.st = s.st
    """,
    doc="X102: Markov stationary distribution of the user event-type "
    "chain by {n} exact power-iteration steps — where user behavior "
    "concentrates in the long run (the analytics twin of the X61 "
    "transition matrix). The corpus-sized work is ONE user-partitioned "
    "window to form transitions; the chain itself is |states|^2 rows "
    "and each iteration is a broadcast join + groupBy on it — the "
    "iterative-dataflow pattern with a deterministic trip count. All "
    "state is exact micro-unit integers (probabilities and vector "
    "entries are integer divisions), so three chained matrix-vector "
    "products reproduce bit-identically in SQL. Sub-stochastic rows "
    "(probability mass lost to integer floor) are intentional and "
    "identical on both engines.".format(n=_N_ITER),
    tags=("events", "markov", "iterative", "analytics"),
)
def markov_stationary_events(spark, sf_dir):
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    trans = seq.groupBy(F.col("prev").alias("s"), F.col("event_type").alias("d")).agg(
        F.count("*").alias("cnt")
    )
    tot = trans.groupBy("s").agg(F.sum("cnt").alias("tot"))
    p = (
        trans.join(tot, "s")
        .select("s", "d", F.expr(f"cnt * {_P_SCALE} div tot").alias("pm"))
        .localCheckpoint(eager=False)  # reused by all 3 iterations
    )
    states = ev.select(F.col("event_type").alias("st")).distinct()
    # uniform start: micro-mass 1e6 split evenly over the states (exact
    # integer division, mirrored in the oracle's window form)
    nw = Window.partitionBy()
    v = states.withColumn("n", F.count("*").over(nw)).select(
        "st", F.expr(f"{_P_SCALE} div n").cast("bigint").alias("v")
    )
    for _ in range(_N_ITER):
        v = (
            F.broadcast(v)
            .join(p, F.col("st") == F.col("s"))
            .groupBy(F.col("d").alias("st2"))
            .agg(F.expr(f"sum(v * pm) div {_P_SCALE}").alias("v"))
            .withColumnRenamed("st2", "st")
        )
    return states.join(v, "st", "left").select(
        F.col("st").alias("event_type"),
        F.coalesce(F.col("v"), F.lit(0)).cast("bigint").alias("stationary_micro"),
        (
            F.coalesce(F.col("v"), F.lit(0)).cast("double") / _P_SCALE
        ).alias("stationary_prob"),
    )


def pareto_frontier(pts, price_col: str = "price", size_col: str = "size"):
    """Skyline of distinct (price, size) points: minimize price, maximize
    size; ties on both coordinates survive together. One max-per-price
    reduction, then a cumulative-max scan over |distinct prices| rows
    (single-partition by design — the input must already be reduced)."""
    bp = pts.groupBy(price_col).agg(F.max(size_col).alias("msize"))
    w = Window.orderBy(price_col).rowsBetween(Window.unboundedPreceding, -1)
    return (
        bp.withColumn("cm", F.max("msize").over(w))
        .filter(F.col("cm").isNull() | (F.col("msize") > F.col("cm")))
        .select(price_col, F.col("msize").alias(size_col))
    )


@register(
    "pareto_frontier_parts",
    oracle="""
    WITH pts AS (
      SELECT p_retailprice AS price, p_size AS size,
             count(*) AS n_parts
      FROM part GROUP BY 1, 2
    )
    , bp AS (
      SELECT price, max(size) AS msize FROM pts GROUP BY 1
    ), sk AS (
      SELECT price, msize,
             max(msize) OVER (ORDER BY price
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cm
      FROM bp
    )
    SELECT s.price, s.msize AS size, CAST(p.n_parts AS BIGINT) AS n_parts
    FROM sk s JOIN pts p ON p.price = s.price AND p.size = s.msize
    WHERE s.cm IS NULL OR s.msize > s.cm
    """,
    doc="X103: Pareto frontier (skyline) over parts — the points where "
    "no other part is both cheaper and larger (price minimized, size "
    "maximized; classic Borzsony/Kossmann skyline operator). The "
    "corpus collapses to DISTINCT (price, size) points via one "
    "groupBy, then to one max-size row per price, and the frontier "
    "falls out of a single cumulative-max scan in price order: a "
    "price survives iff its best size strictly exceeds the best size "
    "of every strictly-cheaper price. The ordered pass runs over "
    "|distinct prices| rows (domain-bounded after the reduction); an "
    "unbounded price domain would use the two-phase range-partitioned "
    "skyline merge (local frontier per range, then frontier of "
    "frontiers) — same operator shapes. The oracle uses the same "
    "prefix-max algebra (the direct NOT-EXISTS dominance form is "
    "quadratic in distinct points — it sat unbounded at sf10's ~110k "
    "prices); tests/test_layout_ml.py pins window-form ≡ NOT-EXISTS "
    "dominance inside DuckDB itself at driver scale.",
    tags=("analytics", "skyline", "optimization"),
)
def pareto_frontier_parts(spark, sf_dir):
    from ..session import load_table

    pts = (
        load_table(spark, sf_dir, "part")
        .groupBy(
            F.col("p_retailprice").alias("price"), F.col("p_size").alias("size")
        )
        .agg(F.count("*").cast("bigint").alias("n_parts"))
    )
    return pareto_frontier(pts).join(pts, ["price", "size"]).select(
        "price", "size", "n_parts"
    )


_DRIFT_BUCKETS = 8  # equi-width histogram buckets over [-1, 1]


@register(
    "embedding_drift_scores",
    oracle=f"""
    WITH ex AS (
      SELECT vec_id % 2 AS grp,
             unnest(range(len(embedding))) + 1 AS dim,
             unnest(CAST(embedding AS DOUBLE[])) AS e
      FROM embeddings WHERE embedding IS NOT NULL
    ), b AS (
      SELECT grp, dim,
             least(CAST(floor((least(greatest(e, -1.0), 1.0) + 1.0) * 4)
                        AS BIGINT), {_DRIFT_BUCKETS - 1}) AS bucket
      FROM ex
    ), cnt AS (
      SELECT dim, bucket,
             count(*) FILTER (WHERE grp = 0) AS c0,
             count(*) FILTER (WHERE grp = 1) AS c1
      FROM b GROUP BY 1, 2
    ), tot AS (
      SELECT dim, sum(c0) AS n0, sum(c1) AS n1 FROM cnt GROUP BY 1
    ), pq AS (
      SELECT c.dim, c.bucket,
             (c.c0 * 1000000) // t.n0 AS p,
             (c.c1 * 1000000) // t.n1 AS q
      FROM cnt c JOIN tot t USING (dim)
    )
    SELECT CAST(dim AS INTEGER) AS dim,
           CAST(sum((p - q) * (p - q) // (p + q + 1)) AS BIGINT)
             AS drift_micro,
           CAST(min(bucket) FILTER (
             WHERE abs(p - q) = (SELECT max(abs(p2.p - p2.q)) FROM pq p2
                                 WHERE p2.dim = pq.dim)) AS BIGINT)
             AS top_shift_bucket
    FROM pq GROUP BY dim
    """,
    doc="X107: per-dimension embedding distribution drift between two "
    "ingest cohorts (vec_id parity stands in for batch id) — the "
    "monitor a training platform runs before trusting a new embedding "
    "batch against a serving index. Each dimension gets an 8-bucket "
    "histogram per cohort; the drift score is a chi-square-shaped "
    "statistic on exact micro-unit integer probabilities "
    "(sum (p-q)^2 div (p+q+1)) — all integer arithmetic after the "
    "bucket floor, so cross-engine parity is exact, and the +1 "
    "regularizer bounds empty-bucket terms. Spark side accumulates the "
    "2 x 64 x 8 count tensor per partition in one numpy kernel (the "
    "X100 pattern): the shuffle carries |partitions| x 1024 count "
    "rows, never exploded elements. Output is dim-bounded (64 rows) "
    "with the most-shifted bucket per dimension.",
    tags=("embeddings", "drift", "quality", "monitoring"),
)
def embedding_drift_scores(spark, sf_dir):
    import pandas as pd

    from pyspark.sql import types as T

    nb = _DRIFT_BUCKETS

    def kernel(iterator):
        C = np.zeros((2, _DIM, nb), dtype=np.int64)
        seen = False
        for pdf in iterator:
            pdf = pdf[pdf["embedding"].notna()]
            if not len(pdf):
                continue
            V = np.array(pdf["embedding"].to_list(), dtype=np.float64)
            g = (pdf["vec_id"].to_numpy(dtype=np.int64) % 2).astype(np.int64)
            B = np.minimum(
                np.floor((np.clip(V, -1.0, 1.0) + 1.0) * 4).astype(np.int64),
                nb - 1,
            )
            for grp in (0, 1):
                sub = B[g == grp]
                if len(sub):
                    for d in range(_DIM):
                        C[grp, d] += np.bincount(sub[:, d], minlength=nb)
            seen = True
        if seen:
            dims, buckets = np.meshgrid(
                np.arange(_DIM), np.arange(nb), indexing="ij"
            )
            yield pd.DataFrame(
                {
                    "dim": (dims.ravel() + 1).astype(np.int32),
                    "bucket": buckets.ravel().astype(np.int64),
                    "c0": C[0].ravel(),
                    "c1": C[1].ravel(),
                }
            )

    schema = T.StructType(
        [
            T.StructField("dim", T.IntegerType()),
            T.StructField("bucket", T.LongType()),
            T.StructField("c0", T.LongType()),
            T.StructField("c1", T.LongType()),
        ]
    )
    cnt = (
        _emb(spark, sf_dir)
        .select("vec_id", "embedding")
        .mapInPandas(kernel, schema)
        .groupBy("dim", "bucket")
        .agg(F.sum("c0").alias("c0"), F.sum("c1").alias("c1"))
        # the kernel emits the full dense 64x8 tensor; drop never-observed
        # cells so the tie-break domain matches the oracle's cnt CTE
        # (observed buckets only) — with a constant dimension the max
        # shift is 0 and min(bucket) would otherwise resolve to an empty
        # bucket 0 on this side but the populated bucket on the oracle's
        .filter((F.col("c0") > 0) | (F.col("c1") > 0))
    )
    tw = Window.partitionBy("dim")
    pq = cnt.select(
        "dim",
        "bucket",
        F.expr("c0 * 1000000 div sum(c0) over (partition by dim)").alias("p"),
        F.expr("c1 * 1000000 div sum(c1) over (partition by dim)").alias("q"),
    )
    shift = F.abs(F.col("p") - F.col("q"))
    mx = F.max(shift).over(tw)
    return (
        pq.withColumn("is_top", shift == mx)
        .groupBy("dim")
        .agg(
            F.sum(F.expr("(p - q) * (p - q) div (p + q + 1)"))
            .cast("bigint")
            .alias("drift_micro"),
            F.min(F.when(F.col("is_top"), F.col("bucket")))
            .cast("bigint")
            .alias("top_shift_bucket"),
        )
    )


def _cov_oracle() -> str:
    """Compose the CERTIFIED gram oracle verbatim (round-8 composition
    rule) with per-dim sums and the count scalar."""
    gram = QUERIES["embedding_gram_matrix"].oracle
    return f"""
    WITH g AS MATERIALIZED (
      SELECT i, j, g_milli FROM ({gram})
    ),
    q AS MATERIALIZED (
      SELECT {_QUANT_SQL} AS q
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    s AS (
      SELECT i.range AS d, CAST(sum(q.q[i.range]) AS BIGINT) AS s
      FROM q, range(1, {_DIM + 1}) i GROUP BY 1
    ),
    c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q)
    SELECT g.i AS i, g.j AS j,
           CAST(c.n * g.g_milli - si.s * sj.s AS BIGINT) AS cov_n2
    FROM g JOIN s si ON si.d = g.i JOIN s sj ON sj.d = g.j CROSS JOIN c
    """


@register(
    "embedding_covariance_exact",
    oracle=None,  # installed below (needs the gram entry registered)
    doc="X121: exact integer covariance matrix of the embedding store — "
    "the whitening/PCA preprocessing input — via the identity "
    "n²·cov_ij = n·Σ x_i x_j − (Σ x_i)(Σ x_j) over milli-quantized "
    "int64 elements: every term is an exact integer, so the full 64×64 "
    "matrix hash-matches with no FP-summation hazard (centering first "
    "would make every element a rational — the identity avoids division "
    "entirely; consumers divide by n² at use time). Composes the "
    "CERTIFIED gram plan (X100) unchanged; the per-dim sum vector is a "
    "second numpy partial per partition (the gram kernel's cost model: "
    "the shuffle carries |partitions|×64 rows, never the corpus) and "
    "joins back as a broadcast 64-row side, twice. int64 margin: "
    "n·Σx_ix_j ≤ n²·1e6 — safe to ~3e6 vectors (ANSI throws on "
    "overflow rather than corrupt).",
    tags=("embeddings", "linalg", "covariance", "pipeline"),
)
def embedding_covariance_exact(spark, sf_dir):
    import pandas as pd

    from pyspark.sql import types as T

    gram = embedding_gram_matrix(spark, sf_dir)

    def sums_kernel(iterator):
        s = np.zeros(_DIM, dtype=np.int64)
        n = 0
        for pdf in iterator:
            pdf = pdf[pdf["embedding"].notna()]
            if not len(pdf):
                continue
            Q = _quantize(np.array(pdf["embedding"].to_list()))
            s += Q.sum(axis=0)
            n += len(pdf)
        if n:
            yield pd.DataFrame(
                {
                    "d": np.arange(1, _DIM + 1, dtype=np.int32),
                    "s": s,
                    "np": np.full(_DIM, n, dtype=np.int64),
                }
            )

    schema = T.StructType(
        [
            T.StructField("d", T.IntegerType()),
            T.StructField("s", T.LongType()),
            T.StructField("np", T.LongType()),
        ]
    )
    sums = (
        _emb(spark, sf_dir)
        .select("embedding")
        .mapInPandas(sums_kernel, schema)
        .groupBy("d")
        .agg(
            F.sum("s").cast("bigint").alias("s"),
            F.sum("np").cast("bigint").alias("n"),
        )
    )
    si = sums.select(F.col("d").alias("i"), F.col("s").alias("si"),
                     F.col("n").alias("n"))
    sj = sums.select(F.col("d").alias("j"), F.col("s").alias("sj"))
    return (
        gram.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .select(
            "i",
            "j",
            (F.col("n") * F.col("g_milli") - F.col("si") * F.col("sj"))
            .cast("bigint")
            .alias("cov_n2"),
        )
    )


def _install_cov_oracle() -> None:
    from dataclasses import replace

    QUERIES["embedding_covariance_exact"] = replace(
        QUERIES["embedding_covariance_exact"], oracle=_cov_oracle()
    )


from .registry import QUERIES  # noqa: E402  (used by the composers above)

_install_cov_oracle()


_PCA_ITER = 3
_C_CAP = 1_000_000  # rescaled covariance magnitude cap (int64 headroom)


def _pca_oracle() -> str:
    cov = QUERIES["embedding_covariance_exact"].oracle
    parts = [
        f"""
    WITH cov AS MATERIALIZED (
      SELECT i, j, cov_n2 FROM ({cov})
    ),
    full_m AS (
      SELECT i, j, cov_n2 FROM cov
      UNION ALL
      SELECT j AS i, i AS j, cov_n2 FROM cov WHERE i < j
    ),
    cs AS (
      SELECT greatest(CAST(max(abs(cov_n2)) AS BIGINT) // {_C_CAP}, 1) AS s
      FROM full_m
    ),
    cm AS (SELECT i, j, cov_n2 // cs.s AS c FROM full_m, cs),
    v0 AS (
      SELECT r.range AS d, CAST(1000 AS BIGINT) AS v FROM range(1, {_DIM + 1}) r
    )"""
    ]
    for k in range(1, _PCA_ITER + 1):
        parts.append(
            f""",
    w{k} AS (
      SELECT cm.i AS d, CAST(sum(cm.c * v{k - 1}.v) AS BIGINT) AS w
      FROM cm JOIN v{k - 1} ON v{k - 1}.d = cm.j GROUP BY 1
    ),
    m{k} AS (SELECT greatest(max(abs(w)), 1) AS mx FROM w{k}),
    v{k} AS (SELECT d, CAST(w * 1000 // m{k}.mx AS BIGINT) AS v
             FROM w{k}, m{k})"""
        )
    parts.append(
        f"""
    SELECT CAST(d AS INTEGER) AS dim, v AS v_milli FROM v{_PCA_ITER}
    """
    )
    return "".join(parts)


@register(
    "embedding_pca_power_iteration",
    oracle=None,  # installed below (composes the covariance oracle)
    doc="X122: dominant principal component of the embedding store by "
    "{k} exact integer power-iteration steps over the X121 covariance "
    "— the PCA/whitening direction a 100 TB pipeline extracts before "
    "index build or drift monitoring. The corpus-sized work is the one "
    "covariance pass (certified, composed unchanged); the iteration "
    "itself runs on the 64x64 matrix: rescale C once to <= ~1e6 by an "
    "integer data-derived divisor (int64 headroom for C.v products), "
    "then each step is a broadcast join + groupBy matvec and an "
    "inf-norm renormalization to milli-units — all integer divisions, "
    "identical truncation semantics on both engines (verified: DuckDB "
    "`//` truncates toward zero on negatives exactly like Spark "
    "`div`). The deterministic trip count makes the whole iteration "
    "one declarative plan; convergence to the true eigvec is pinned "
    "against numpy in tests, cross-engine equality by the oracle "
    "hash.".format(k=_PCA_ITER),
    tags=("embeddings", "linalg", "pca", "iterative", "pipeline"),
)
def embedding_pca_power_iteration(spark, sf_dir):
    cov = embedding_covariance_exact(spark, sf_dir)
    full_m = cov.union(
        cov.filter(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "cov_n2"
        )
    )
    cs = full_m.agg(
        F.greatest(
            F.expr(f"CAST(max(abs(cov_n2)) AS BIGINT) div {_C_CAP}"), F.lit(1)
        ).alias("s")
    )
    cm = (
        full_m.crossJoin(F.broadcast(cs))
        .select("i", "j", F.expr("cov_n2 div s").alias("c"))
        .localCheckpoint(eager=False)  # reused by all iterations
    )
    v = spark.range(1, _DIM + 1).select(
        F.col("id").cast("int").alias("d"), F.lit(1000).cast("bigint").alias("v")
    )
    for _ in range(_PCA_ITER):
        w = (
            cm.join(F.broadcast(v), cm["j"] == v["d"])
            .groupBy(cm["i"].alias("wd"))
            .agg(F.sum(F.col("c") * F.col("v")).cast("bigint").alias("w"))
        )
        m = w.agg(F.greatest(F.max(F.abs(F.col("w"))), F.lit(1)).alias("mx"))
        v = w.crossJoin(F.broadcast(m)).select(
            F.col("wd").alias("d"),
            F.expr("w * 1000 div mx").cast("bigint").alias("v"),
        )
    return v.select(F.col("d").cast("int").alias("dim"), F.col("v").alias("v_milli"))


def _install_pca_oracle() -> None:
    from dataclasses import replace

    QUERIES["embedding_pca_power_iteration"] = replace(
        QUERIES["embedding_pca_power_iteration"], oracle=_pca_oracle()
    )


_install_pca_oracle()


# ±1 Johnson-Lindenstrauss projection signs, md5-derived so both engines
# embed the SAME literal sign vectors (no RNG, no seed drift): sign(i,j)
# = +1 iff the first md5 byte of "jl:i:j" is even.
_JL_K = 16


def _jl_signs() -> list[list[int]]:
    import hashlib as _h

    return [
        [
            1 if _h.md5(f"jl:{i}:{j}".encode()).digest()[0] % 2 == 0 else -1
            for i in range(_DIM)
        ]
        for j in range(_JL_K)
    ]


def _jl_oracle() -> str:
    signs = _jl_signs()
    proj_terms = ", ".join(
        "list_sum(list_transform(range(1, %d), i -> q[i] * ([%s])[i])) AS p%d"
        % (_DIM + 1, ", ".join(str(s) for s in sj), j)
        for j, sj in enumerate(signs)
    )
    proj_sq = " + ".join(
        f"(a.p{j} - b.p{j}) * (a.p{j} - b.p{j})" for j in range(_JL_K)
    )
    return f"""
    WITH q AS (
      SELECT vec_id, {_QUANT_SQL} AS q
      FROM embeddings
      WHERE embedding IS NOT NULL
        AND vec_id % {_QUERY_MOD} = 0 AND vec_id <= {_QUERY_CAP}
    ), p AS (
      SELECT vec_id, q, {proj_terms} FROM q
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_sum(list_transform(range(1, {_DIM + 1}),
                 i -> (a.q[i] - b.q[i]) * (a.q[i] - b.q[i]))) AS orig_sq,
             {proj_sq} AS proj_sq
      FROM p a JOIN p b ON a.vec_id < b.vec_id
    ), dist AS (
      SELECT CAST(proj_sq * 1000 // ({_JL_K} * orig_sq) AS BIGINT)
               AS distortion_milli
      FROM pairs WHERE orig_sq > 0
    )
    SELECT CAST(distortion_milli // 100 AS BIGINT) AS band,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(distortion_milli) AS BIGINT) AS min_milli,
           CAST(max(distortion_milli) AS BIGINT) AS max_milli
    FROM dist GROUP BY 1 ORDER BY 1
    """


@register(
    "jl_projection_distortion",
    oracle=_jl_oracle(),
    doc="X134: Johnson-Lindenstrauss distance-preservation audit — "
    "project the milli-quantized embeddings through a deterministic "
    "±1 sign matrix (md5-derived literals, identical in both engines) "
    "from 64 to 16 dims and census the squared-distance distortion "
    "ratio proj²/(k·orig²) in milli units over the bounded eval pair "
    "set (≤64 query vectors → ≤2016 pairs, the registry's standard "
    "eval cap). The band histogram answers 'how many dims can the ANN "
    "tier drop before neighbor ordering degrades' with evidence, "
    "complementing ann_truncated_dim_recall's prefix-truncation probe "
    "(prefix keeps trained dims; JL mixes ALL dims, so it survives "
    "embeddings whose energy is not front-loaded). Scale shape: the "
    "projection is a row-local zip_with/aggregate over plan-literal "
    "sign arrays — zero shuffle, codegen'd, no UDF; the corpus scan "
    "prunes to the eval sample by vec_id predicate pushdown; the pair "
    "join is broadcast (≤64 rows).",
    tags=("embeddings", "linalg", "ann", "eval"),
)
def jl_projection_distortion(spark, sf_dir):
    signs = _jl_signs()
    emb = (
        _emb(spark, sf_dir)
        .filter(
            F.col("embedding").isNotNull()
            & (F.col("vec_id") % _QUERY_MOD == 0)
            & (F.col("vec_id") <= _QUERY_CAP)
        )
        .select(
            "vec_id",
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda e: F.floor(e * _Q_SCALE + 0.5).cast("long"),
            ).alias("q"),
        )
    )
    zero = F.lit(0).cast("long")
    # ONE matrix-transform expression instead of 16 separate
    # aggregate(zip_with(...)) columns: the sign matrix is a single
    # 16×64 literal and the lambda is shared, which cuts driver-side
    # analysis from ~2.3 s to ~1.5 s warm (measured — the plan BUILD,
    # not execution, dominates this eval-sized query; the remainder is
    # the self-join analyzing the literal-heavy subtree once per side)
    signs_lit = F.array(
        *[F.array(*[F.lit(s).cast("long") for s in sj]) for sj in signs]
    )
    proj = F.transform(
        signs_lit,
        lambda sj: F.aggregate(
            F.zip_with(F.col("q"), sj, lambda x, s: x * s),
            zero,
            lambda acc, x: acc + x,
        ),
    )
    p = emb.select("vec_id", "q", proj.alias("parr"))
    a = p.select(
        F.col("vec_id").alias("id_a"),
        F.col("q").alias("qa"),
        F.col("parr").alias("pa"),
    )
    b = p.select(
        F.col("vec_id").alias("id_b"),
        F.col("q").alias("qb"),
        F.col("parr").alias("pb"),
    )
    orig_sq = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: (x - y) * (x - y)),
        zero,
        lambda acc, x: acc + x,
    )
    proj_sq = F.aggregate(
        F.zip_with(F.col("pa"), F.col("pb"), lambda x, y: (x - y) * (x - y)),
        zero,
        lambda acc, x: acc + x,
    )
    pairs = (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(orig_sq.alias("orig_sq"), proj_sq.alias("proj_sq"))
        .filter(F.col("orig_sq") > 0)
        .select(
            F.expr(f"proj_sq * 1000 div ({_JL_K} * orig_sq)")
            .cast("bigint")
            .alias("distortion_milli")
        )
    )
    return (
        pairs.select(
            F.expr("distortion_milli div 100").cast("bigint").alias("band"),
            "distortion_milli",
        )
        .groupBy("band")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.min("distortion_milli").cast("bigint").alias("min_milli"),
            F.max("distortion_milli").cast("bigint").alias("max_milli"),
        )
        .orderBy("band")
    )
