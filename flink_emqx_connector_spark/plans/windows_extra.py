"""Second wave of operator coverage: the full window-function family,
percentiles, unpivot, correlated-subquery aggregates, and the dead-letter
decode path (SURVEY.md §2.4 — all absent from the reference, all native
PySpark here)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import register


def _t(spark, sf_dir, name):
    from ..session import load_table

    return load_table(spark, sf_dir, name)


@register(
    "window_functions_family",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS quartile,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           round(o_totalprice - min(o_totalprice) OVER (PARTITION BY o_custkey), 2)
             AS diff_from_min
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    doc="rank/dense_rank/ntile/lag/lead/partition-avg in one pass — one "
    "shuffle on the partition key serves every window.",
    tags=("window",),
)
def window_functions_family(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wp = W.partitionBy("o_custkey")
    wq = W.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(wq).alias("quartile"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        # min (an exact input value) rather than avg: subtracting identical
        # doubles is bit-reproducible cross-engine, so round() never lands
        # on a half-boundary disagreement
        F.round(F.col("o_totalprice") - F.min("o_totalprice").over(wp), 2).alias(
            "diff_from_min"
        ),
    )


@register(
    "percentiles_lineitem",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
           round(min(l_extendedprice), 2) AS lo,
           round(max(l_extendedprice), 2) AS hi
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact continuous percentiles (≡ percentile_cont ≡ DuckDB "
    "quantile_cont, linear interpolation: k = p·(n−1), "
    "v_lo + (k−⌊k⌋)·(v_hi−v_lo)) — computed over the DISTINCT-VALUE "
    "HISTOGRAM, not a per-group value buffer. Spark's percentile() agg "
    "is holistic: its partial buffer carries every (value,count) of a "
    "group into ONE reducer (203 s / near-OOM at sf10's 20M-row "
    "groups). Here the groupBy(flag,value) count is map-side combined "
    "(shuffle = distinct values, ~110k/group at sf10 vs 20M rows), the "
    "cumulative-count window runs per flag over that bounded histogram, "
    "and the k-th order statistics fall out of conditional mins — "
    "203 s → ~17 s at sf10, hash-identical. The interpolation applies "
    "the same IEEE steps both engines use. approx_aggregates "
    "(approx_percentile, fixed-size mergeable sketch) remains the "
    "route when even the distinct-value domain is unbounded.",
    tags=("agg", "percentile"),
)
def percentiles_lineitem(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    hist = li.groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("v")
    ).agg(F.count("*").alias("c"))
    w = W.partitionBy("l_returnflag").orderBy("v")
    cum = hist.withColumn("cum", F.sum("c").over(w))
    totals = hist.groupBy("l_returnflag").agg(F.sum("c").alias("n"))
    j = cum.join(totals, "l_returnflag")

    def order_stat(idx):
        """Value at 0-based rank ``idx``: first v whose inclusive
        cumulative count exceeds idx."""
        return F.min(F.when(F.col("cum") > idx, F.col("v")))

    def pct(p):
        k = F.lit(p) * (F.col("n") - 1).cast("double")
        lo_v = order_stat(F.floor(k))
        hi_v = order_stat(F.ceil(k))
        # F.first(k) inside agg: k is group-constant (n is), grab it back
        return lo_v + (F.first(k) - F.floor(F.first(k))) * (hi_v - lo_v)

    return j.groupBy("l_returnflag").agg(
        F.round(pct(0.5), 4).alias("p50"),
        F.round(pct(0.95), 4).alias("p95"),
        F.round(F.min("v"), 2).alias("lo"),
        F.round(F.max("v"), 2).alias("hi"),
    )


@register(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey, measure, round(val, 2) AS val
    FROM (
      SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS val FROM part
      UNION ALL
      SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
    )
    """,
    doc="Unpivot (wide→long) via stack/unpivot — the inverse of pivot; "
    "no shuffle, pure projection+generate.",
    tags=("reshape",),
)
def unpivot_part_measures(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr(
            "stack(2, 'retailprice', p_retailprice, 'size', CAST(p_size AS DOUBLE))"
        ).alias("measure", "raw"),
    ).select("p_partkey", "measure", F.round("raw", 2).alias("val"))


@register(
    "correlated_subquery_agg",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 2 * (
      SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    """,
    doc="Correlated scalar subquery (orders > 2× their customer's average) — "
    "Catalyst decorrelates to an aggregate + join; expressed via window "
    "to keep a single shuffle.",
    tags=("subquery",),
)
def correlated_subquery_agg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    wp = W.partitionBy("o_custkey")
    return (
        o.withColumn("cust_avg", F.avg("o_totalprice").over(wp))
        .filter(F.col("o_totalprice") > 2 * F.col("cust_avg"))
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "union_all_counts",
    oracle="""
    SELECT src, count(*) AS n
    FROM (
      SELECT 'orders' AS src FROM orders
      UNION ALL
      SELECT 'lineitem' FROM lineitem
      UNION ALL
      SELECT 'events' FROM events
    )
    GROUP BY src
    """,
    doc="UNION ALL across heterogeneous scans (bag semantics; `union` in "
    "DataFrame API) + fold to counts.",
    tags=("setop",),
)
def union_all_counts(spark, sf_dir):
    parts = [
        _t(spark, sf_dir, "orders").select(F.lit("orders").alias("src")),
        _t(spark, sf_dir, "lineitem").select(F.lit("lineitem").alias("src")),
        _t(spark, sf_dir, "events").select(F.lit("events").alias("src")),
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)
    return u.groupBy("src").agg(F.count("*").alias("n"))


@register(
    "decode_dead_letter_split",
    oracle="""
    SELECT CASE WHEN json_valid(payload_str) THEN 'ok' ELSE 'dead' END AS lane,
           count(*) AS n
    FROM (
      SELECT CASE WHEN event_id % 7 = 0
                  THEN '{"broken":'
                  ELSE props END AS payload_str
      FROM events
    )
    GROUP BY 1
    """,
    doc="S9 upgraded: malformed payloads become a dead-letter lane instead "
    "of being dropped (reference logs-and-drops, "
    "EMQXSourceReader.java:80-82). from_json PERMISSIVE → NULL struct → "
    "lane split; one scan, both lanes.",
    tags=("parity", "decode", "dlq"),
)
def decode_dead_letter_split(spark, sf_dir):
    from ..functions.decode import decode_json

    ev = _t(spark, sf_dir, "events")
    # corrupt every 7th payload to exercise the malformed path
    raw = ev.select(
        F.when(F.col("event_id") % 7 == 0, F.lit('{"broken":'))
        .otherwise(F.col("props"))
        .alias("payload_str")
    )
    decoded = raw.select(
        F.from_json("payload_str", "k BIGINT").alias("decoded")
    )
    # PERMISSIVE from_json yields a struct of NULLs on parse failure; every
    # well-formed props payload carries "k", so decoded.k discriminates.
    lane = F.when(F.col("decoded.k").isNotNull(), "ok").otherwise("dead")
    return decoded.select(lane.alias("lane")).groupBy("lane").agg(
        F.count("*").alias("n")
    )


@register(
    "window_distribution_functions",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round(percent_rank() OVER w, 4) AS pr,
           round(cume_dist()    OVER w, 4) AS cd,
           nth_value(o_orderkey, 3) OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_key
    FROM orders
    WHERE o_totalprice > 450000
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderpriority, pr, o_orderkey
    """,
    doc="Window distribution-function family: percent_rank / cume_dist / "
    "nth_value over per-priority price order (completing the window "
    "surface beyond rank/lag/ntile/frames). Total order inside each "
    "partition (price, then key) keeps both engines' ranks identical; "
    "the selective price filter is pushed below the window sort.",
    tags=("window", "functions"),
)
def window_distribution_functions(spark, sf_dir):
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.percent_rank().over(w), 4).alias("pr"),
            F.round(F.cume_dist().over(w), 4).alias("cd"),
            F.nth_value("o_orderkey", 3).over(wrows).alias("third_key"),
        )
        .orderBy("o_orderpriority", "pr", "o_orderkey")
    )
