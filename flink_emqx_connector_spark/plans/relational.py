"""Relational operator surface over the TPC-H-ish tables.

The reference borrows every relational operator from Flink's DataStream API
and implements none itself (SURVEY.md §2.4 — joins, windows, sorts, set ops,
grouping sets, scalar functions are all absent). On Spark these are native
DataFrame/Catalyst territory; each query here exercises one category the
engine must expose and is written the way it should execute at 100 TB:
filters that push to the parquet scan, broadcasts for dimension joins,
single-shuffle aggregations, total orders on every top-k.
"""

from __future__ import annotations

import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import register


def _t(spark, sf_dir, name):
    from ..session import load_table

    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregation gauntlet (TPC-H Q1 shape): two-col groupBy, 8 aggregates.
# Map-side partial agg shrinks the shuffle to |groups|×partitions rows.
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) / 1e2                                        AS sum_base_price,
           CAST((CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                      AS BIGINT) + 50) // 100 AS BIGINT) / 1e2          AS sum_disc_price,
           CAST((CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100) AS BIGINT))
                            * (100 + CAST(round(l_tax * 100) AS BIGINT)))
                      AS BIGINT) + 5000) // 10000 AS BIGINT) / 1e2      AS sum_charge,
           floor(CAST(sum(l_quantity) AS DOUBLE) / count(*) * 1e4 + 0.5)
             / 1e4                                                      AS avg_qty,
           floor(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
                 * 100.0 / count(*) + 0.5) / 1e4                        AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Aggregation gauntlet (TPC-H Q1 shape). Filter pushes to the parquet "
    "scan; partial agg before the single shuffle. Money sums are EXACT "
    "fixed-point (price and discount/tax are 2-decimal, so price*(1-d) "
    "is an exact 1e4-scaled int64 and price*(1-d)*(1+t) an exact "
    "1e6-scaled one): identical VALUES to the float form wherever the "
    "float summation was correctly rounded, exact where a summation-"
    "order half-cent boundary would flip the 2nd decimal (the class "
    "the 365-day-draw gate caught in sql_interface_revenue; int64 "
    "headroom to ~8e7 rows/group at the 1e6 scale). Averages are "
    "floor-form over exact integer numerators (the q2 round-half-repr "
    "class).",
    tags=("agg",),
)
def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p100 = "CAST(round(l_extendedprice * 100) AS BIGINT)"
    d100c = "(100 - CAST(round(l_discount * 100) AS BIGINT))"
    t100c = "(100 + CAST(round(l_tax * 100) AS BIGINT))"
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            (F.expr(f"CAST(sum({p100}) AS BIGINT)") / 1e2).alias(
                "sum_base_price"
            ),
            (
                F.expr(
                    f"(CAST(sum({p100} * {d100c}) AS BIGINT) + 50) div 100"
                )
                / 1e2
            ).alias("sum_disc_price"),
            (
                F.expr(
                    f"(CAST(sum({p100} * {d100c} * {t100c}) AS BIGINT)"
                    " + 5000) div 10000"
                )
                / 1e2
            ).alias("sum_charge"),
            (
                F.floor(
                    F.sum("l_quantity").cast("double") / F.count("*") * 1e4
                    + 0.5
                )
                / 1e4
            ).alias("avg_qty"),
            (
                F.floor(
                    F.expr(
                        f"CAST(sum(CAST(round(l_discount * 100) AS BIGINT))"
                        f" AS DOUBLE)"
                    )
                    * 100.0
                    / F.count("*")
                    + 0.5
                )
                / 1e4
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Multi-way join + top-k (TPC-H Q3 shape).
# --------------------------------------------------------------------------
@register(
    "q3_top_revenue_orders",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="Fact-fact join + dimension filter + grouped top-k (TPC-H Q3 shape). "
    "customer side is small → Catalyst broadcasts it; total order on "
    "(revenue DESC, l_orderkey) makes the LIMIT deterministic.",
    tags=("join", "topk"),
)
def q3_top_revenue_orders(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem")
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "inner"
    ).join(cust, orders.o_custkey == cust.c_custkey, "inner")
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Dimension star-join — every dim broadcast, zero shuffles for the join.
# --------------------------------------------------------------------------
@register(
    "star_join_supplier_region",
    oracle="""
    SELECT r_name,
           count(*)                 AS n_suppliers,
           CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT))
                AS BIGINT) / 1e2 AS total_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="Star join with broadcast dims (nation/region are tiny at any scale) "
    "— no shuffle until the final agg.",
    tags=("join", "broadcast"),
)
def star_join_supplier_region(spark, sf_dir):
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            (
                F.expr(
                    "CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT))"
                    " AS BIGINT)"
                )
                / 1e2
            ).alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS).
# --------------------------------------------------------------------------
@register(
    "semi_join_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 150000)
    """,
    doc="Left-semi join (EXISTS): dedup-free existence check, no row "
    "multiplication — the scalable form of `IN (subquery)`.",
    tags=("join", "semi"),
)
def semi_join_customers_with_orders(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join (NOT EXISTS).",
    tags=("join", "anti"),
)
def anti_join_customers_without_orders(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# Window functions: per-group top-k and running aggregate.
# --------------------------------------------------------------------------
@register(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    )
    WHERE rk <= 3
    """,
    doc="Top-k per group via row_number window; unique tie-break key makes "
    "it deterministic. At scale: single shuffle on the partition key.",
    tags=("window", "topk"),
)
def window_topk_orders_per_customer(spark, sf_dir):
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


@register(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
    doc="Running per-key aggregate — the batch analogue of the reference's "
    "rolling sum() emission (WordCount.java:32).",
    tags=("window", "parity"),
)
def window_running_total(spark, sf_dir):
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


# --------------------------------------------------------------------------
# Set operations.
# --------------------------------------------------------------------------
@register(
    "set_intersect_users",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'error'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    doc="INTERSECT (distinct semantics) — users who both erred and purchased.",
    tags=("setop",),
)
def set_intersect_users(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select("user_id")
    buy = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return err.intersect(buy)


@register(
    "set_except_users",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'signup'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    doc="EXCEPT (distinct semantics) — signed up but never purchased.",
    tags=("setop",),
)
def set_except_users(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "signup").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.subtract(b)


# --------------------------------------------------------------------------
# Grouping sets: ROLLUP and CUBE.
# --------------------------------------------------------------------------
@register(
    "rollup_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets (absent from reference, SURVEY.md §2.4).",
    tags=("agg", "grouping-sets"),
)
def rollup_lineitem(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@register(
    "cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets. The grand total sums in exact integer cents: "
    "at sf10 the double-sum over 15M rows reaches ~3.8e12 where parallel "
    "summation order moves the 2nd decimal (found by the sf10 gate); int64 "
    "cents are exact to ~9e16 and both engines divide the same integer.",
    tags=("agg", "grouping-sets"),
)
def cube_orders(spark, sf_dir):
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(cents) / 100.0, 2).alias("total"),
        )
    )


# --------------------------------------------------------------------------
# Distinct aggregation.
# --------------------------------------------------------------------------
@register(
    "distinct_counts",
    oracle="""
    SELECT count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(*)                  AS n_rows
    FROM lineitem
    """,
    doc="Exact distinct aggregation (expand+two-phase under the hood); the "
    "approx_count_distinct variant is the 100 TB path when exactness "
    "isn't required.",
    tags=("agg", "distinct"),
)
def distinct_counts(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count("*").alias("n_rows"),
    )


# --------------------------------------------------------------------------
# Global top-k (ORDER BY + LIMIT with total order).
# --------------------------------------------------------------------------
@register(
    "topk_global_lineitems",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
    doc="Global top-k: Spark executes as per-partition TakeOrdered + merge — "
    "no global sort shuffle.",
    tags=("sort", "topk"),
)
def topk_global_lineitems(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Scalar function gauntlet (string / math).
# --------------------------------------------------------------------------
@register(
    "scalar_functions_part",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                       AS uname,
           substr(p_name, 1, 4)                AS pfx,
           length(p_name)                      AS name_len,
           p_brand || '-' || p_type            AS brand_type,
           abs(p_size - 25)                    AS size_dist,
           floor(p_retailprice * 1.1 * 100 + 0.5) / 100 AS bumped,
           p_partkey % 7                       AS mod7
    FROM part
    """,
    doc="Scalar string/math function surface (SURVEY.md §2.4 gap — all "
    "native pyspark.sql.functions, fully codegen'd).",
    tags=("scalar",),
)
def scalar_functions_part(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.substring("p_name", 1, 4).alias("pfx"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.abs(F.col("p_size") - 25).cast("bigint").alias("size_dist"),
        # floor-form: round(x*1.1, 2) diverges between engines when the
        # product lands on a ...5 shortest-repr boundary (first seen at
        # sf1 — Spark rounds the shortest decimal repr, DuckDB the binary
        # double); identical IEEE steps on both sides by construction
        (F.floor(F.col("p_retailprice") * 1.1 * 100 + 0.5) / 100).alias("bumped"),
        (F.col("p_partkey") % 7).alias("mod7"),
    )


@register(
    "date_functions_orders",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT)  AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mth,
           count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) / 1e2 AS total
    FROM orders
    GROUP BY 1, 2
    """,
    doc="Date/time function surface + calendar aggregation.",
    tags=("scalar", "date"),
)
def date_functions_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mth"),
    ).agg(
        F.count("*").alias("n"),
        # exact cents: calendar-month groups grow with data (q1 rationale)
        (
            F.expr(
                "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))"
                " AS BIGINT)"
            )
            / 1e2
        ).alias("total"),
    )


# --------------------------------------------------------------------------
# Pivot.
# --------------------------------------------------------------------------
@register(
    "pivot_lineitem_status",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Pivot = groupBy().pivot() — compiles to conditional aggregation, "
    "one shuffle.",
    tags=("agg", "pivot"),
)
def pivot_lineitem_status(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


# --------------------------------------------------------------------------
# As-of join (reference lacks it; Spark lacks a native one — composed from
# a range join + window, see operators/asof.py for the scale discussion).
# --------------------------------------------------------------------------
@register(
    "asof_join_purchase_view",
    oracle="""
    SELECT purchase_id, view_id, view_ts
    FROM (
      SELECT p.event_id AS purchase_id, v.event_id AS view_id, v.ts AS view_ts,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY v.ts DESC, v.event_id DESC) AS rk
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON v.user_id = p.user_id AND v.ts <= p.ts
    )
    WHERE rk = 1
    """,
    doc="As-of join: for each purchase, the latest preceding view by the same "
    "user. Implemented as equi-join on the key + range predicate + "
    "row_number; the 100 TB path is applyInPandas merge_asof per key "
    "bucket (operators/asof.py).",
    tags=("join", "asof"),
)
def asof_join_purchase_view(spark, sf_dir):
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
    )
    return asof_join(
        left=purchases,
        right=views,
        left_on="user_id",
        right_on="v_user_id",
        left_time="purchase_ts",
        right_time="view_ts",
        left_key="purchase_id",
        tie_break="view_id",
    ).select("purchase_id", "view_id", "view_ts")
