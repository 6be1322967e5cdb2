"""Additional TPC-H query shapes (Q4/Q10/Q19/Q22 adapted to the driver
schema — no partsupp/commitdate/phone columns exist, so the predicates are
adapted while keeping each query's *plan-defining* feature intact):

- Q4: EXISTS with a correlated non-equi predicate → left-semi join whose
  condition mixes the equi key with a cross-table date comparison.
- Q10: fact-fact-dim join with a selective fact filter, grouped top-k.
- Q19: disjunction of conjunctions (brand × quantity bands) — the classic
  pushdown test: the OR-of-ANDs must reach the scans as a residual filter
  while the join stays an equi hash join.
- Q22: uncorrelated scalar subquery (global average) + NOT EXISTS anti
  join with its own correlated filter.

The reference connector inherits all of this from Flink SQL (SURVEY §2.4);
here each is a native DataFrame plan Catalyst optimizes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register


def _t(spark, sf_dir, name):
    from ..session import load_table

    return load_table(spark, sf_dir, name)


@register(
    "q4_late_shipment_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: order-priority census of orders with at least one "
    "late-shipped line (shipdate > orderdate + 60d — the schema has no "
    "commitdate). The EXISTS becomes a left-semi join whose condition "
    "mixes the l_orderkey equi key with a correlated cross-table date "
    "comparison; the semi join dedups multi-line matches for free (no "
    "distinct), and the date filter on orders is pushed to its scan.",
    tags=("join", "semi", "tpch"),
)
def q4_late_shipment_priority(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q10_returned_revenue_topk",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: revenue lost to returned items per customer over "
    "one year, top 20. The returnflag filter is pushed into the lineitem "
    "scan and the date band into orders BEFORE the joins; the customer "
    "dimension broadcasts; the grouped top-k ends as TakeOrdered, never a "
    "global sort.",
    tags=("join", "topk", "tpch"),
)
def q10_returned_revenue_topk(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q19_brand_quantity_disjunction",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3'  AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: disjunction of brand × quantity-band conjunctions "
    "— the classic complex-predicate pushdown test. Catalyst derives the "
    "per-scan implied filters (brand IN (...) onto part, quantity <= 30 "
    "onto lineitem) from the OR-of-ANDs, keeps the residual above an "
    "equi BroadcastHashJoin on partkey, and the whole thing stays one "
    "codegen stage per side.",
    tags=("join", "pushdown", "tpch"),
)
def q19_brand_quantity_disjunction(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "q22_idle_wealthy_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name, count(*) AS n_cust,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    CROSS JOIN avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY n_name
    """,
    doc="TPC-H Q22 shape: above-average-balance customers with no recent "
    "orders (the schema has no phone column, so grouping is by nation and "
    "'inactive' means no orders since 2000). The global average is an "
    "uncorrelated scalar subquery → broadcast 1-row cross join; the NOT "
    "EXISTS (with its own date filter pushed into the orders scan) is a "
    "left-anti join; nation broadcasts.",
    tags=("join", "anti", "subquery", "tpch"),
)
def q22_idle_wealthy_customers(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )
