"""Join-type completeness (SURVEY.md §2.4 names every join family as a
gap in the reference): outer, cross/nested-loop, interval/range — plus the
approximate-aggregate surface (the 100 TB substitutes for exact distinct /
percentile) and the CSV decode layer."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register


def _t(spark, sf_dir, name):
    from ..session import load_table

    return load_table(spark, sf_dir, name)


@register(
    "full_outer_join_coverage",
    oracle="""
    SELECT coalesce(n.n_name, 'NO_NATION') AS nation,
           count(s.s_suppkey)              AS n_suppliers
    FROM nation n
    FULL OUTER JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY 1
    """,
    doc="Full outer join: nations with zero suppliers survive with count 0 "
    "(count over the null-extended side).",
    tags=("join", "outer"),
)
def full_outer_join_coverage(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    return (
        n.join(s, s.s_nationkey == n.n_nationkey, "full_outer")
        .groupBy(F.coalesce("n_name", F.lit("NO_NATION")).alias("nation"))
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@register(
    "left_outer_join_nulls",
    oracle="""
    SELECT c.c_custkey,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    GROUP BY c.c_custkey
    """,
    doc="Left outer join with a join-side predicate (kept in the ON clause, "
    "not WHERE — different semantics, easy to get wrong).",
    tags=("join", "outer"),
)
def left_outer_join_nulls(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    cond = (o.o_custkey == c.c_custkey) & (o.o_orderpriority == "1-URGENT")
    return (
        c.join(o, cond, "left_outer")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


@register(
    "cross_join_grid",
    oracle="""
    SELECT r.r_name, s.o_orderstatus, count(*) AS n
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    GROUP BY 1, 2
    """,
    doc="Cross (nested-loop) join for small dimension grids — broadcast "
    "NLJ; never for two large sides.",
    tags=("join", "cross"),
)
def cross_join_grid(spark, sf_dir):
    r = _t(spark, sf_dir, "region")
    s = _t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s).groupBy("r_name", "o_orderstatus").agg(
        F.count("*").alias("n")
    )


@register(
    "interval_join_event_pairs",
    oracle="""
    SELECT a.event_id AS first_id, b.event_id AS next_id,
           date_diff('second', a.ts, b.ts) AS gap_s
    FROM events a
    JOIN events b
      ON b.user_id = a.user_id
     AND a.event_type = 'view' AND b.event_type = 'purchase'
     AND b.ts >= a.ts
     AND b.ts <= a.ts + INTERVAL 10 MINUTE
    """,
    doc="Interval/range join: purchases within 10 minutes after a view by "
    "the same user. Equi-key + range predicate — Catalyst plans the hash "
    "join on user_id and applies the band as a post-filter; at scale, "
    "bucketize time into join keys to bound the band (operators/asof.py "
    "discussion).",
    tags=("join", "range"),
)
def interval_join_event_pairs(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("first_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("next_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
    )
    cond = (
        (F.col("b_user") == F.col("a_user"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    return a.join(b, cond).select(
        "first_id",
        "next_id",
        (F.unix_timestamp("b_ts") - F.unix_timestamp("a_ts")).alias("gap_s"),
    )


@register(
    "approx_aggregates",
    oracle=None,  # sketch values are engine-specific — no hash-match oracle
    # ... but the ERROR CONTRACT is a gate (plans/check.py bounded-oracle
    # mode): every sketch value must sit within its rated error of DuckDB's
    # exact aggregate, and the plain count must match exactly. rsd=0.02 →
    # 3σ ≈ 6% (+3 absolute for tiny groups); percentile accuracy 10000 →
    # ≤1% relative on these distributions.
    bounded={
        "sql": """
        SELECT l_returnflag,
               CAST(count(DISTINCT l_partkey) AS BIGINT) AS approx_parts,
               quantile_disc(l_extendedprice, 0.5) AS p50_approx,
               quantile_disc(l_extendedprice, 0.95) AS p95_approx,
               count(*) AS n
        FROM lineitem GROUP BY 1
        """,
        "key": ["l_returnflag"],
        "bounds": {
            "approx_parts": ("rel", 0.06, 3.0),
            "p50_approx": ("rel", 0.01),
            "p95_approx": ("rel", 0.01),
            "n": ("exact", 0),
        },
    },
    doc="The 100 TB aggregation surface: HLL++ approx distinct and "
    "approx percentiles — sketch-mergeable, constant memory per group, "
    "no expand step. Gate-checked against exact DuckDB values within "
    "rated error (bounded-oracle mode) and property-tested in tests/.",
    tags=("agg", "approx"),
)
def approx_aggregates(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # Both percentiles come out of ONE KLL-style sketch (array form) —
    # separate percentile_approx calls each build their own summary over
    # the same column, doubling the dominant map-side cost (A/B at sf0.1:
    # 0.96 s two-sketch vs 0.56 s one-sketch).
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.percentile_approx(
                "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10000)
            ).alias("ps"),
            F.count("*").alias("n"),
        )
        .select(
            "l_returnflag",
            "approx_parts",
            F.col("ps")[0].alias("p50_approx"),
            F.col("ps")[1].alias("p95_approx"),
            "n",
        )
    )


@register(
    "approx_aggregates_bounded",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS hll_within_3sigma,
           TRUE AS p50_within_1pct,
           TRUE AS p95_within_1pct
    FROM lineitem GROUP BY 1
    """,
    doc="Driver-hashable form of the sketch error contract (VERDICT r6 "
    "item 2): ONE Spark plan computes the HLL++ distinct sketch, the "
    "KLL-style percentile sketch, AND the exact aggregates (exact "
    "distinct count; exact discrete percentiles via one cume_dist "
    "window), then emits deterministic within-tolerance BOOLEANS "
    "(HLL within 3σ≈6% + 3 absolute; percentiles within 1%). The "
    "DuckDB oracle asserts the same booleans from its exact values, so "
    "a full hash-match ⟺ every sketch sits inside its rated error — "
    "the contract `approx_aggregates` can only express in the local "
    "bounded gate becomes driver-visible. The exact legs exist to "
    "VERIFY the sketches; production queries run the sketch-only "
    "`approx_aggregates` plan (no global sort, constant memory).",
    tags=("agg", "approx", "quality"),
)
def approx_aggregates_bounded(spark, sf_dir):
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    sk = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.percentile_approx(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10000)
        ).alias("ps"),
        F.count("*").alias("n"),
    )
    # Exact discrete percentile = min value with cume_dist >= p (both
    # targets from ONE window pass); exact distinct via count(distinct).
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    cd = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.cume_dist().over(w).alias("cd"),
    )
    exact = cd.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("cd") >= 0.5, F.col("l_extendedprice"))).alias("p50_exact"),
        F.min(F.when(F.col("cd") >= 0.95, F.col("l_extendedprice"))).alias("p95_exact"),
    )
    exact_parts = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").cast("bigint").alias("exact_parts")
    )
    j = sk.join(F.broadcast(exact), "l_returnflag").join(
        F.broadcast(exact_parts), "l_returnflag"
    )
    return j.select(
        "l_returnflag",
        "n",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 0.06 * F.col("exact_parts") + 3.0
        ).alias("hll_within_3sigma"),
        (
            F.abs(F.col("ps")[0] - F.col("p50_exact")) <= 0.01 * F.col("p50_exact")
        ).alias("p50_within_1pct"),
        (
            F.abs(F.col("ps")[1] - F.col("p95_exact")) <= 0.01 * F.col("p95_exact")
        ).alias("p95_within_1pct"),
    )


@register(
    "decode_csv_payload",
    oracle="""
    SELECT CAST(string_split(csv, ',')[1] AS BIGINT) % 3 AS bucket,
           count(*) AS cnt,
           CAST(sum(CAST(round(CAST(string_split(csv, ',')[2] AS DOUBLE)
                               * 100) AS BIGINT)) AS BIGINT) / 1e2 AS total
    FROM (SELECT CAST(user_id AS VARCHAR) || ',' || CAST(value AS VARCHAR) AS csv
          FROM events)
    GROUP BY 1
    """,
    doc="S8 decode layer, CSV codec: byte payload → from_csv struct "
    "(schema-on-read like the JSON path).",
    tags=("parity", "decode"),
)
def decode_csv_payload(spark, sf_dir):
    from ..functions.decode import decode_csv

    ev = _t(spark, sf_dir, "events")
    payload = F.encode(
        F.concat_ws(",", F.col("user_id").cast("string"), F.col("value").cast("string")),
        "UTF-8",
    )
    dec = ev.select(
        decode_csv(payload, "user_id BIGINT, value DOUBLE").alias("d")
    )
    return dec.groupBy((F.col("d.user_id") % 3).alias("bucket")).agg(
        F.count("*").alias("cnt"),
        # exact cents (q1 conversion rationale): n/3 rows per bucket
        (
            F.expr("CAST(sum(CAST(round(d.value * 100) AS BIGINT)) AS BIGINT)")
            / 1e2
        ).alias("total"),
    )


@register(
    "runtime_filter_join",
    oracle="""
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size = 1
    GROUP BY 1
    """,
    doc="Selective fact-to-dim join shaped for Spark's RUNTIME row-level "
    "filtering: the dim side (part) carries a ~2%-selectivity predicate "
    "(p_size = 1) that Catalyst cannot push into the fact scan "
    "statically, so at scale the win comes from an injected runtime "
    "filter — a bloom filter (spark.sql.optimizer.runtime.bloomFilter.*) "
    "or an InSubquery DPP-style semi-filter built from the filtered dim "
    "keys — that prunes lineitem rows BEFORE the join shuffle. On a "
    "100 TB fact table that is the difference between shuffling 100 TB "
    "and shuffling 2% of it. The query itself is engine-portable "
    "(revenue as exact cents, the r7 scaled-integer lesson); the "
    "runtime-filter plan shape is pinned by "
    "tests/test_plan_shapes.py::test_runtime_bloom_filter_injection "
    "under the thresholds a real cluster would clear.",
    tags=("join", "runtime-filter", "bloom", "scale"),
)
def runtime_filter_join(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 1)
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("bigint")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(cents).cast("bigint").alias("revenue_cents"),
        )
    )


@register(
    "null_safe_join_segments",
    oracle="""
    WITH c AS (
      SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg,
             CAST(count(*) AS BIGINT) AS n_customers
      FROM customer GROUP BY 1
    ),
    o AS (
      SELECT NULLIF(c.c_mktsegment, 'BUILDING') AS seg,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1
    )
    SELECT c.seg AS seg, c.n_customers, o.n_orders
    FROM c JOIN o ON c.seg IS NOT DISTINCT FROM o.seg
    ORDER BY seg NULLS FIRST
    """,
    doc="Null-safe equality join (Spark `<=>` / SQL IS NOT DISTINCT "
    "FROM): per-segment customer and order censuses joined on a "
    "NULLABLE segment key — the data-quality reality where an unknown "
    "segment is encoded as NULL (here NULLIF demotes one segment to "
    "model it). A plain equi-join silently DROPS the NULL group on both "
    "sides; the null-safe predicate matches NULL to NULL, so the "
    "unknown-segment row survives with its counts. Catalyst plans "
    "EqualNullSafe as a real hash/sort-merge join key (coalesce-"
    "normalized), NOT a nested loop — at 100 TB this shuffles exactly "
    "like an ordinary equi-join; verified by the plan containing a "
    "single join exchange per side.",
    tags=("join", "null-safe", "functions"),
)
def null_safe_join_segments(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    seg = F.expr("NULLIF(c_mktsegment, 'BUILDING')")
    c = cust.groupBy(seg.alias("seg")).agg(
        F.count("*").cast("bigint").alias("n_customers")
    )
    o = (
        orders.join(cust, cust["c_custkey"] == orders["o_custkey"])
        .groupBy(seg.alias("seg"))
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )
    return (
        c.join(o, c["seg"].eqNullSafe(o["seg"]))
        .select(c["seg"].alias("seg"), "n_customers", "n_orders")
        .orderBy(F.col("seg").asc_nulls_first())
    )


@register(
    "asof_nearest_purchase_view",
    # Nearest-direction as-of with tolerance (merge_asof
    # direction='nearest'): the closest view within ±30 min of each
    # purchase, ties to the earlier view then lower id. Timestamps are
    # compared as integer epoch micros on both engines (events ts is
    # micro-grain; epoch_us ≡ unix_micros — pinned by the micros-parity
    # check in load_table's docstring).
    oracle="""
    SELECT purchase_id, view_id, view_ts,
           CAST(gap_us AS BIGINT) AS gap_us, direction
    FROM (
      SELECT p.event_id AS purchase_id, v.event_id AS view_id, v.ts AS view_ts,
             abs(epoch_us(v.ts) - epoch_us(p.ts)) AS gap_us,
             CASE WHEN v.ts <= p.ts THEN 'backward' ELSE 'forward' END
               AS direction,
             row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY abs(epoch_us(v.ts) - epoch_us(p.ts)) ASC,
                        v.ts ASC, v.event_id ASC) AS rk
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON v.user_id = p.user_id
       AND abs(epoch_us(v.ts) - epoch_us(p.ts)) <= 1800000000
    )
    WHERE rk = 1
    """,
    doc="X131: nearest-match as-of join with tolerance — the attribution "
    "variant the backward-only as-of (asof_join_purchase_view) cannot "
    "express: a view logged moments AFTER the purchase (clock skew "
    "between client and server pipelines) still attributes, and a view "
    "hours before does not. One row per purchase: the view minimizing "
    "|Δt| within ±30 min, ties to the earlier view (backward "
    "preference) then id. Scale shape: the ±tolerance predicate bounds "
    "the pre-dedup intermediate to the band density (never the full "
    "per-user view history); equi-join on user_id shuffles once and "
    "the row_number window reuses that partitioning. Exact integer "
    "micro gaps; direction column audits skew symmetry.",
    tags=("join", "asof", "events"),
)
def asof_nearest_purchase_view(spark, sf_dir):
    from ..operators.asof import asof_join_nearest
    from ..session import load_table

    ev = load_table(spark, sf_dir, "events")
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
    out = asof_join_nearest(
        left=purchases,
        right=views,
        left_on="user_id",
        right_on="v_user_id",
        left_time="purchase_ts",
        right_time="view_ts",
        left_key="purchase_id",
        tie_break="view_id",
        tolerance_us=1_800_000_000,
    )
    return out.select(
        "purchase_id",
        "view_id",
        "view_ts",
        F.col("__gap_us").cast("bigint").alias("gap_us"),
        F.when(F.col("view_ts") <= F.col("purchase_ts"), "backward")
        .otherwise("forward")
        .alias("direction"),
    )
