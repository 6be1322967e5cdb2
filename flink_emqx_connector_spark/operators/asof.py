"""As-of join — an operator the reference lacks and Spark has no native
primitive for (SURVEY.md §2.4).

Two strategies:

- ``asof_join`` (default): equi-join on the key + range predicate
  (``right_time <= left_time``) + ``row_number`` to keep the latest match.
  Declarative — Catalyst plans it as a shuffled hash/sort-merge join and the
  window reuses the join's partitioning. Correct at any scale, but the join
  can multiply rows when a key has many right-side rows before dedup.

- ``asof_join_merge`` (the 100 TB path for dense right sides): co-partition
  both sides by key, then ``applyInPandas`` running ``pandas.merge_asof``
  per key group — linear in group size after the single co-partitioning
  shuffle, never materializes the row-multiplied intermediate.

Both emit one row per left row that has ≥1 match (inner as-of).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    left_key: str,
    tie_break: str,
    strict: bool = False,
) -> DataFrame:
    """Latest right row per left row with ``right_time <= left_time``
    (``<`` when ``strict``). ``left_key`` must uniquely identify left rows;
    ``tie_break`` breaks right-side time ties deterministically."""
    cond = (left[left_on] == right[right_on]) & (
        (right[right_time] < left[left_time])
        if strict
        else (right[right_time] <= left[left_time])
    )
    joined = left.join(right, cond, "inner")
    w = W.partitionBy(left_key).orderBy(
        F.col(right_time).desc(), F.col(tie_break).desc()
    )
    return joined.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") == 1
    ).drop("__rk")


def asof_join_merge(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    schema: str,
) -> DataFrame:
    """Scale path: per-key ``pandas.merge_asof`` via ``applyInPandas``.

    Requires both sides to share the key column name ``on``. ``schema`` is
    the output DDL (left columns + right columns suffixed ``_r``).
    """
    import pandas as pd

    lcols = left.columns
    rcols = [c for c in right.columns if c != on]

    tagged = left.withColumn("__side", F.lit(0)).unionByName(
        right.withColumnRenamed(right_time, left_time).withColumn("__side", F.lit(1)),
        allowMissingColumns=True,
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        lt = pdf[pdf["__side"] == 0][lcols + [left_time]].sort_values(left_time)
        rt = (
            pdf[pdf["__side"] == 1][[on, left_time] + rcols]
            .rename(columns={left_time: right_time, **{c: f"{c}_r" for c in rcols}})
            .sort_values(right_time)
        )
        if lt.empty or rt.empty:
            return pd.DataFrame(columns=lt.columns.tolist())
        out = pd.merge_asof(
            lt, rt.drop(columns=[on]), left_on=left_time, right_on=right_time
        )
        return out

    return tagged.groupBy(on).applyInPandas(merge, schema)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    left_key: str,
    tie_break: str,
    tolerance_us: int,
) -> DataFrame:
    """Nearest-match as-of join (kdb ``aj`` nearest variant): for each
    left row that HAS a right row within ``tolerance_us``, keep exactly
    one match — the smallest |time difference|, ties preferring the
    earlier right row then ``tie_break`` ascending. INNER semantics:
    left rows with no right row inside the tolerance band are DROPPED
    (unlike pandas ``merge_asof(direction='nearest')``, which keeps
    them with null match columns — filter-then-left-join if you need
    that shape).

    The tolerance predicate keeps the pre-dedup join bounded: only right
    rows inside the ±tolerance band multiply, so the intermediate is
    (left rows × band density), not (left rows × right history) — the
    knob that makes the declarative form survive dense right sides.
    """
    gap = F.abs(
        F.unix_micros(left[left_time].cast("timestamp"))
        - F.unix_micros(right[right_time].cast("timestamp"))
    )
    cond = (left[left_on] == right[right_on]) & (gap <= F.lit(int(tolerance_us)))
    joined = left.join(right, cond, "inner").withColumn("__gap_us", gap)
    w = W.partitionBy(left_key).orderBy(
        F.col("__gap_us").asc(), F.col(right_time).asc(), F.col(tie_break).asc()
    )
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )
