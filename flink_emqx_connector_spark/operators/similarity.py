"""Similarity search over embedding columns (``array<float>``).

BASELINE.json extension — absent from the reference. Two tiers:

- ``cosine_topk``: brute-force exact top-k against a query vector. One scan,
  per-partition TakeOrdered, no shuffle of the vectors themselves. This is
  the baseline and the verification oracle for the approximate tier.
- ``rp_lsh_buckets`` / ``rp_lsh_topk``: random-hyperplane (SimHash-family)
  LSH — deterministic seeded projections; candidates share the query's
  bucket (with multi-probe on Hamming-1 neighbors), exact cosine re-rank on
  the candidates only. At 100 TB the bucket id is the partition/cluster
  key, so a query touches a handful of partitions instead of the corpus.

Cosine is computed with built-in higher-order functions (zip_with +
aggregate) — JVM-side; no Python in the per-row path.
"""

from __future__ import annotations

import hashlib

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine_to_query(vec_col: Column, query: list[float]) -> Column:
    """Cosine similarity of an array column to a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query])
    v = vec_col.cast("array<double>")
    return _dot(v, q) / (_norm(v) * _norm(q))


def cosine_topk(
    emb: DataFrame,
    query: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact brute-force top-k by cosine. Deterministic: ranked on the
    rounded score with the id as tie-break."""
    scored = emb.select(
        F.col(id_col),
        F.round(cosine_to_query(F.col(vec_col), query), 4).alias("cos_sim"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def _rp_planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes (fixed seed → reproducible buckets)."""
    rs = np.random.RandomState(seed)
    return rs.standard_normal((n_planes, dim))


def rp_bucket_col(vec_col: Column, planes: np.ndarray) -> Column:
    """LSH bucket id = sign-bit string of the hyperplane projections."""
    bits = [
        F.when(_dot(vec_col.cast("array<double>"), F.array(*[F.lit(float(x)) for x in p])) >= 0, "1").otherwise("0")
        for p in planes
    ]
    return F.concat(*bits)


def rp_lsh_buckets(
    emb: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach the deterministic LSH ``bucket`` column (2^n_planes buckets).
    At scale: ``.repartition("bucket")`` / partitioned write by bucket."""
    planes = _rp_planes(dim, n_planes, seed)
    return emb.withColumn("bucket", rp_bucket_col(F.col(vec_col), planes))


def _hamming1_neighbors(bucket: str) -> list[str]:
    out = [bucket]
    for i in range(len(bucket)):
        flipped = bucket[:i] + ("1" if bucket[i] == "0" else "0") + bucket[i + 1 :]
        out.append(flipped)
    return out


def rp_lsh_topk(
    emb: DataFrame,
    query: list[float],
    k: int,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Approximate top-k: restrict to the query's bucket plus Hamming-1
    neighbors (multi-probe), then exact cosine re-rank. Scans ~(n_planes+1)/
    2^n_planes of the corpus instead of all of it."""
    planes = _rp_planes(len(query), n_planes, seed)
    qv = np.asarray(query, dtype=np.float64)
    qbucket = "".join("1" if float(p @ qv) >= 0 else "0" for p in planes)
    probes = _hamming1_neighbors(qbucket)
    bucketed = rp_lsh_buckets(emb, n_planes, len(query), seed, vec_col)
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return cosine_topk(cand, query, k, id_col, vec_col, exclude_id)


def deterministic_query_vector(dim: int = 64, seed: str = "ann-query") -> list[float]:
    """A fixed query vector derived from sha256 — stable across runs/hosts."""
    vals = []
    for i in range(dim):
        d = hashlib.sha256(f"{seed}-{i}".encode()).digest()
        vals.append(int.from_bytes(d[:4], "big") / 2**31 - 1.0)
    return vals
