"""Skew mitigation: salted aggregation and salted broadcast-side join.

At 100 TB a single hot key (one viral topic, one null-heavy column) can
pin an entire stage on one task. Two standard remedies, both deterministic:

- ``salted_agg``: two-phase aggregation — add a salt ∈ [0, S) to the key,
  aggregate (key, salt) partials, then aggregate partials by key. Correct
  for any algebraic aggregate (sum/count/min/max); the first shuffle
  spreads the hot key over S reducers.
- ``salted_broadcast_join``: replicate the (small) build side S× with an
  explicit salt column and salt the probe side — spreads a hot probe key
  across S tasks even when AQE's skew-join can't kick in (e.g. forced
  shuffle-hash joins).

AQE (`spark.sql.adaptive.skewJoin.enabled`, on in session.py) handles most
sort-merge-join skew automatically; these are for aggregations and
non-AQE-eligible paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(col: Column, buckets: int) -> Column:
    # deterministic pseudo-salt from the row content — xxhash64 of all
    # columns would need the full row; a per-partition counter is cheaper
    # and spreads uniformly: spark_partition_id ^ monotonic id low bits
    return F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    ``aggs`` maps output column name → 'sum:col' | 'count:*' | 'min:col' |
    'max:col' (algebraic aggregates that re-aggregate losslessly).
    """
    partial_exprs = []
    final_exprs = []
    for out, spec in aggs.items():
        op, col = spec.split(":", 1)
        if op == "count":
            partial_exprs.append(F.count("*").alias(out))
            final_exprs.append(F.sum(out).cast("bigint").alias(out))
        elif op == "sum":
            partial_exprs.append(F.sum(col).alias(out))
            final_exprs.append(F.sum(out).alias(out))
        elif op == "min":
            partial_exprs.append(F.min(col).alias(out))
            final_exprs.append(F.min(out).alias(out))
        elif op == "max":
            partial_exprs.append(F.max(col).alias(out))
            final_exprs.append(F.max(out).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate: {spec}")
    salted = df.withColumn("__salt", _salt(F.lit(0), buckets))
    partial = salted.groupBy(*key_cols, "__salt").agg(*partial_exprs)
    return partial.groupBy(*key_cols).agg(*final_exprs)


def salted_broadcast_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    buckets: int = 8,
) -> DataFrame:
    """Inner equi-join with the build side replicated ``buckets``× and the
    probe side salted — every probe partition of a hot key lands on a
    distinct (key, salt) bucket."""
    salts = probe.sparkSession.range(buckets).select(
        F.col("id").cast("int").alias("__salt")
    )
    build_rep = build.crossJoin(F.broadcast(salts))
    probe_salted = probe.withColumn("__salt", _salt(F.lit(0), buckets).cast("int"))
    out = probe_salted.join(F.broadcast(build_rep), [on, "__salt"], "inner")
    return out.drop("__salt")
