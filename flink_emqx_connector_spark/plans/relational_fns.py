"""Second wave of relational + scalar-function coverage.

Like plans/relational.py, everything here is a gap in the reference
(SURVEY.md §2.4 — it borrows all relational operators from Flink's API and
implements none): conditional aggregation, HAVING, GROUPING SETS, array /
map / JSON scalar-function families, and sliding event-time windows. Each
query is written scale-first: filters that push to the scan, broadcasts for
dimension sides, one shuffle per aggregation, total orders on every top-k.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register


def _t(spark, sf_dir, name):
    from ..session import load_table

    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Conditional aggregation over a broadcast dimension join (TPC-H Q14 shape).
# --------------------------------------------------------------------------
@register(
    "q14_promo_share",
    oracle="""
    SELECT floor(100.0
                 * CAST(sum(CASE WHEN p_type = 'PROMO'
                            THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                               * (100 - CAST(round(l_discount * 100) AS BIGINT))
                            ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                        AS DOUBLE)
                 * 1e4 + 0.5) / 1e4 AS promo_share,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    doc="Promo revenue share (TPC-H Q14 shape): the part dimension joins into "
    "the fact scan (AQE broadcasts it while it is small; no hint, so huge "
    "part tables degrade safely), one conditional aggregate.",
    tags=("agg", "join", "conditional"),
)
def q14_promo_share(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    # exact 1e4-scaled integer revenue on BOTH legs of the ratio (the
    # q1 conversion rationale), ONE identical IEEE division, floor-form
    # rounding: the share can no longer flip on a summation-order draw
    rev4 = F.expr(
        "CAST(round(l_extendedprice * 100) AS BIGINT)"
        " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
    )
    promo4 = F.when(F.col("p_type") == "PROMO", rev4).otherwise(F.lit(0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.floor(
                    100.0
                    * F.sum(promo4).cast("double")
                    / F.sum(rev4).cast("double")
                    * 1e4
                    + 0.5
                )
                / 1e4
            ).alias("promo_share"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Grouped HAVING + semi-join back to the fact (TPC-H Q18 shape).
# --------------------------------------------------------------------------
@register(
    "q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, round(CAST(sum(l_quantity) AS DOUBLE), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 100
    )
    SELECT o_orderkey, o_orderdate, round(o_totalprice, 2) AS o_totalprice,
           total_qty
    FROM orders JOIN big ON o_orderkey = l_orderkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
    doc="Large-quantity orders (TPC-H Q18 shape): aggregate-then-join — the "
    "HAVING output is small, so AQE broadcasts it into orders at runtime; "
    "never join the raw fact tables first.",
    tags=("agg", "having", "join", "topk"),
)
def q18_large_orders(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 100)
        .select("l_orderkey", F.round(F.col("raw_qty").cast("double"), 2).alias("total_qty"))
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select(
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Six-table snowflake join (TPC-H Q5 shape): the heaviest relational
# pattern — two fact tables + four dimension hops.
# --------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST((CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                      AS BIGINT) + 50) // 100 AS BIGINT) / 1e2 AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="Local-supplier volume (TPC-H Q5 shape): 6-table snowflake — the "
    "two facts shuffle-join on orderkey, dimensions broadcast (fixed-size "
    "nation/region by hint, data-proportional sides by AQE), the "
    "region filter prunes nations before they ever touch a fact row.",
    tags=("join", "snowflake", "agg"),
)
def q5_local_supplier_volume(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(dims), supp.s_nationkey == dims.n_nationkey)
        .groupBy("n_name")
        .agg(
            # exact 1e4 fixed point: same value as the float sum wherever
            # that was correctly rounded (q1 conversion rationale)
            (
                F.expr(
                    "(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
                    " * (100 - CAST(round(l_discount * 100) AS BIGINT)))"
                    " AS BIGINT) + 50) div 100"
                )
                / 1e2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Binary codec functions: base64/hex round-trips on the payload path.
# --------------------------------------------------------------------------
@register(
    "codec_roundtrip_docs",
    oracle="""
    SELECT doc_id,
           substr(to_base64(encode(text)), 1, 16) AS b64_prefix,
           substr(lower(hex(encode(text))), 1, 16) AS hex_prefix,
           md5(decode(from_base64(to_base64(encode(text))))) AS roundtrip_fp
    FROM documents WHERE doc_id < 100
    """,
    doc="Payload codec surface (SURVEY.md §1.2 decode layer): "
    "base64/unbase64/hex round-trips, verifying binary fidelity via md5 of "
    "the decoded bytes.",
    tags=("codec", "functions", "binary"),
)
def codec_roundtrip_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    raw = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.substring(F.base64(raw), 1, 16).alias("b64_prefix"),
        F.substring(F.lower(F.hex(raw)), 1, 16).alias("hex_prefix"),
        F.md5(F.unbase64(F.base64(raw))).alias("roundtrip_fp"),
    )


# --------------------------------------------------------------------------
# GROUPING SETS with explicit level labels (cube/rollup cousins are in
# joins_extra/windows_extra; this is the general form).
# --------------------------------------------------------------------------
@register(
    "grouping_sets_orders",
    oracle="""
    SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN '<all>' ELSE o_orderstatus END
             AS status,
           CASE WHEN GROUPING(o_orderpriority) = 1 THEN '<all>' ELSE o_orderpriority END
             AS priority,
           count(*) AS cnt,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
             AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
    doc="GROUPING SETS ((a,b),(a),()) with grouping() → '<all>' labels so "
    "every level has a concrete key (no NULL ambiguity across engines). "
    "One pass, Expand operator — not three scans. The total sums in "
    "exact integer cents: the sf10 grand total (~3.8e12 over 15M rows) "
    "sits where double summation order moves the 2nd decimal.",
    tags=("agg", "grouping-sets"),
)
def grouping_sets_orders(spark, sf_dir):
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT CASE WHEN grouping(o_orderstatus) = 1 THEN '<all>' ELSE o_orderstatus END
                 AS status,
               CASE WHEN grouping(o_orderpriority) = 1 THEN '<all>' ELSE o_orderpriority END
                 AS priority,
               count(*) AS cnt,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0D, 2)
                 AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


# --------------------------------------------------------------------------
# Array function family: collect → sort → slice → higher-order aggregate.
# --------------------------------------------------------------------------
@register(
    "array_agg_order_quantities",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             list(l_quantity ORDER BY l_quantity DESC, l_linenumber) AS qs
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           len(qs) AS n_items,
           round(list_sum(qs[1:3]), 2) AS top3_qty,
           round(qs[1] - qs[-1], 2) AS qty_range
    FROM per_order
    """,
    doc="Array-function family over per-order quantity vectors: "
    "collect_list → sort_array(desc) → slice → aggregate (higher-order "
    "fold), all JVM-side built-ins.",
    tags=("array", "functions", "agg"),
)
def array_agg_order_quantities(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    qs = F.sort_array(F.collect_list("l_quantity"), asc=False)
    per_order = li.groupBy("l_orderkey").agg(qs.alias("qs"))
    top3 = F.aggregate(
        F.slice("qs", 1, 3), F.lit(0.0), lambda acc, x: acc + x
    )
    return per_order.select(
        "l_orderkey",
        F.size("qs").cast("bigint").alias("n_items"),
        F.round(top3, 2).alias("top3_qty"),
        F.round(
            F.element_at("qs", 1) - F.element_at("qs", -1), 2
        ).alias("qty_range"),
    )


# --------------------------------------------------------------------------
# JSON scalar functions over the events payload column.
# --------------------------------------------------------------------------
@register(
    "json_functions_events",
    oracle="""
    SELECT event_type,
           count(*) AS cnt,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS max_k,
           CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_big
    FROM events
    GROUP BY event_type
    """,
    doc="JSON path extraction (get_json_object) + typed aggregation over the "
    "events props column — the payload-decode surface of SURVEY.md §1.2 "
    "applied to a JSON field.",
    tags=("json", "functions", "agg"),
)
def json_functions_events(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).cast("bigint").alias("max_k"),
        F.sum(F.when(k > 50, 1).otherwise(0)).cast("bigint").alias("n_big"),
    )


# --------------------------------------------------------------------------
# Map function family: build per-user event-type→count maps, then consume
# them with map_keys/map_values + higher-order aggregate.
# --------------------------------------------------------------------------
@register(
    "map_functions_events",
    oracle="""
    SELECT user_id,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           count(*) AS total_events
    FROM events
    GROUP BY user_id
    """,
    doc="Map-function family: map_from_entries(collect_list(struct)) builds "
    "a per-user event-type→count map; map_keys/map_values + aggregate fold "
    "consume it. Oracle states the same result relationally.",
    tags=("map", "functions", "agg"),
)
def map_functions_events(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "c"))
        ).alias("m")
    )
    total = F.aggregate(
        F.map_values("m"), F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    return as_map.select(
        "user_id",
        F.size(F.map_keys("m")).cast("bigint").alias("n_types"),
        total.alias("total_events"),
    )


# --------------------------------------------------------------------------
# Time-series resample + gap-fill (the IoT/sensor-stream shape: regularize
# an irregular event stream onto a 1-minute grid, forward-filling holes).
# --------------------------------------------------------------------------
@register(
    "resample_gapfill_events",
    oracle="""
    WITH per_min AS (
      SELECT user_id, date_trunc('minute', ts) AS m, round(sum(value), 2) AS v
      FROM events WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
      GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, min(m) AS mn, max(m) AS mx FROM per_min GROUP BY 1),
    spine AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL '1 minute')) AS minute
      FROM bounds
    ),
    joined AS (
      SELECT s.user_id, s.minute, p.v
      FROM spine s LEFT JOIN per_min p
        ON p.user_id = s.user_id AND p.m = s.minute
    )
    SELECT user_id, minute,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY minute
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value,
           (v IS NULL) AS gap_filled
    FROM joined
    """,
    doc="Resample an irregular event stream to a per-user 1-minute grid "
    "(sequence spine from each user's own bounds — no global cross join) "
    "and forward-fill gaps with last(ignorenulls) — the sensor/MQTT "
    "time-series regularization every downstream window op assumes.",
    tags=("timeseries", "resample", "gapfill", "window"),
)
def resample_gapfill_events(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp")
    )
    per_min = ev.groupBy(
        "user_id", F.date_trunc("minute", "ts").alias("m")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    spine = (
        per_min.groupBy("user_id")
        .agg(F.min("m").alias("mn"), F.max("m").alias("mx"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(mn, mx, interval 1 minute)")).alias("minute"),
        )
    )
    joined = spine.join(
        per_min,
        (spine.user_id == per_min.user_id) & (spine.minute == per_min.m),
        "left",
    ).select(spine.user_id, "minute", "v")
    w = W.partitionBy("user_id").orderBy("minute").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return joined.select(
        "user_id",
        "minute",
        F.last("v", ignorenulls=True).over(w).alias("filled_value"),
        F.col("v").isNull().alias("gap_filled"),
    )


# --------------------------------------------------------------------------
# OHLC downsampling: open/high/low/close per user-hour — the other half of
# the time-series story (resample_gapfill_events regularizes; this
# summarizes). first/last are made deterministic with an explicit
# (ts, event_id) total order, not engine-dependent arg_min ties.
# --------------------------------------------------------------------------
@register(
    "ohlc_per_user_hour",
    oracle="""
    WITH ranked AS (
      SELECT user_id, date_trunc('hour', ts) AS h, value,
             row_number() OVER w_asc  AS rn_open,
             row_number() OVER w_desc AS rn_close
      FROM events
      WINDOW
        w_asc  AS (PARTITION BY user_id, date_trunc('hour', ts)
                   ORDER BY ts, event_id),
        w_desc AS (PARTITION BY user_id, date_trunc('hour', ts)
                   ORDER BY ts DESC, event_id DESC)
    )
    SELECT user_id, h,
           round(min(CASE WHEN rn_open  = 1 THEN value END), 2) AS open,
           round(max(value), 2) AS high,
           round(min(value), 2) AS low,
           round(min(CASE WHEN rn_close = 1 THEN value END), 2) AS close,
           count(*) AS n_events
    FROM ranked
    GROUP BY user_id, h
    """,
    doc="OHLC per user-hour: open/close via row_number over an explicit "
    "(ts, event_id) total order — deterministic across engines, unlike "
    "bare first()/arg_min on tied timestamps — plus min/max/count; one "
    "shuffle on (user, hour).",
    tags=("timeseries", "downsample", "window", "agg"),
)
def ohlc_per_user_hour(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events").withColumn(
        "h", F.date_trunc("hour", "ts")
    )
    w_asc = W.partitionBy("user_id", "h").orderBy("ts", "event_id")
    w_desc = W.partitionBy("user_id", "h").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = ev.select(
        "user_id",
        "h",
        "value",
        F.row_number().over(w_asc).alias("rn_open"),
        F.row_number().over(w_desc).alias("rn_close"),
    )
    return ranked.groupBy("user_id", "h").agg(
        F.round(F.min(F.when(F.col("rn_open") == 1, F.col("value"))), 2).alias("open"),
        F.round(F.max("value"), 2).alias("high"),
        F.round(F.min("value"), 2).alias("low"),
        F.round(F.min(F.when(F.col("rn_close") == 1, F.col("value"))), 2).alias("close"),
        F.count("*").alias("n_events"),
    )


# --------------------------------------------------------------------------
# Time-interval RANGE window frame (trailing 1 h per user).
# --------------------------------------------------------------------------
@register(
    "range_frame_trailing_sum",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW
           ), 2) AS trailing_1h
    FROM events
    """,
    doc="RANGE BETWEEN INTERVAL frame: per-user trailing 1-hour sum — the "
    "event-time rolling aggregate shape (vs ROWS frames in "
    "window_running_total). One shuffle on user_id serves the whole frame.",
    tags=("window", "range-frame"),
)
def range_frame_trailing_sum(spark, sf_dir):
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_rf")
    return spark.sql(
        """
        SELECT event_id, user_id,
               round(sum(value) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ), 2) AS trailing_1h
        FROM events_rf
        """
    )


# --------------------------------------------------------------------------
# posexplode: 1→N generator with position (ordinality).
# --------------------------------------------------------------------------
@register(
    "posexplode_doc_tokens",
    oracle="""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents WHERE doc_id < 10
    )
    SELECT doc_id,
           CAST(unnest(generate_series(1, len(w))) - 1 AS BIGINT) AS pos,
           unnest(w) AS token
    FROM ws
    """,
    doc="posexplode (generator with ordinality) over tokenized text — the "
    "1→N flatMap of WordCount (SURVEY.md §2.2 T1) with positions kept.",
    tags=("explode", "generator", "text"),
)
def posexplode_doc_tokens(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("bigint").alias("pos"), "token")


# --------------------------------------------------------------------------
# Python UDTF: user-defined table function in a SQL lateral join.
# --------------------------------------------------------------------------
@register(
    "udtf_tokenize",
    oracle="""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents WHERE doc_id < 10
    )
    SELECT doc_id,
           CAST(unnest(generate_series(1, len(w))) - 1 AS BIGINT) AS pos,
           unnest(w) AS token
    FROM ws
    """,
    doc="Python UDTF (spark.udtf.register) applied via LATERAL join — the "
    "user-defined 1→N surface (vs the built-in posexplode in "
    "posexplode_doc_tokens, which is the plan to prefer when built-ins "
    "suffice).",
    tags=("udtf", "udf", "generator"),
)
def udtf_tokenize(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, token string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate((text or "").split(" ")):
                yield i, tok

    spark.udtf.register("tokenize_udtf", Tokenize)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM docs_udtf d, LATERAL tokenize_udtf(d.text) t
        WHERE d.doc_id < 10
        """
    )


# --------------------------------------------------------------------------
# Multiset (bag) set operations: INTERSECT ALL / EXCEPT ALL.
# --------------------------------------------------------------------------
@register(
    "multiset_ops_users",
    oracle="""
    SELECT 'intersect_all' AS op, count(*) AS n FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT ALL
      SELECT user_id FROM events WHERE event_type = 'view'
    )
    UNION ALL
    SELECT 'except_all' AS op, count(*) AS n FROM (
      SELECT user_id FROM events WHERE event_type = 'view'
      EXCEPT ALL
      SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
    doc="Bag semantics set ops (intersectAll/exceptAll — duplicate "
    "multiplicities preserved), complementing the distinct-set ops in "
    "set_intersect_users/set_except_users.",
    tags=("setops", "multiset"),
)
def multiset_ops_users(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    ia = (
        purchases.intersectAll(views)
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "n")
    )
    ea = (
        views.exceptAll(purchases)
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "n")
    )
    return ia.unionAll(ea)


# --------------------------------------------------------------------------
# Edit-distance fuzzy matching (data-cleaning / entity-resolution surface).
# --------------------------------------------------------------------------
@register(
    "fuzzy_match_nations",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS dist
    FROM nation a JOIN nation b ON a.n_name < b.n_name
    WHERE levenshtein(a.n_name, b.n_name) <= 2
    """,
    doc="Levenshtein fuzzy self-match on the nation dimension — the "
    "entity-resolution primitive; at scale the cross join is first blocked "
    "(prefix/soundex/LSH) exactly like dedup blocking.",
    tags=("string", "fuzzy", "join"),
)
def fuzzy_match_nations(spark, sf_dir):
    n = _t(spark, sf_dir, "nation").select("n_name")
    a = n.select(F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_name").alias("name_b"))
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(F.broadcast(b), F.col("name_a") < F.col("name_b"))
        .filter(dist <= 2)
        .select("name_a", "name_b", dist.cast("bigint").alias("dist"))
    )


# --------------------------------------------------------------------------
# The composed cleaning pipeline: quality gate → exact dedup → stratified
# sample → corpus stats. One query chaining the training-data primitives
# the way a real ingestion job would.
# --------------------------------------------------------------------------
@register(
    "cleaning_pipeline_counts",
    oracle="""
    WITH gated AS (
      SELECT doc_id, lang, text,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
      WHERE n_chars BETWEEN 100 AND 2000
        AND len(string_split(text, ' ')) >= 20
    ),
    deduped AS (
      SELECT * FROM gated
      WHERE doc_id IN (SELECT min(doc_id) FROM gated GROUP BY md5(text))
    ),
    sampled AS (
      SELECT * FROM deduped
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100
            < CASE lang WHEN 'en' THEN 80 ELSE 40 END
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM sampled
    GROUP BY lang
    """,
    doc="End-to-end cleaning pipeline composition: length/token quality "
    "gate (pushed to the scan) → exact dedup keep-list (16-byte digest "
    "shuffle) → deterministic hash-bucket stratified sample → per-language "
    "corpus stats. Every stage is one of the registry's primitives; "
    "chaining them stays a single declarative plan Catalyst optimizes "
    "end-to-end.",
    tags=("pipeline", "dedup", "sampling", "quality"),
)
def cleaning_pipeline_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    gated = (
        d.filter(F.col("n_chars").between(100, 2000))
        .withColumn("n_tokens", n_tokens)
        .filter(F.col("n_tokens") >= 20)
    )
    keepers = gated.groupBy(F.md5(F.encode("text", "UTF-8"))).agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    deduped = gated.join(keepers, "doc_id")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    rate = F.when(F.col("lang") == "en", 80).otherwise(40)
    sampled = deduped.filter(bucket < rate)
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


# --------------------------------------------------------------------------
# Column profiling: the data-quality pass every ingestion pipeline runs
# before training — null rates, cardinalities, length stats, one scan.
# --------------------------------------------------------------------------
@register(
    "profile_documents",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(count(*) - count(text) AS BIGINT) AS null_text,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           round(avg(n_chars), 4) AS avg_chars,
           round(avg(CASE WHEN length(text) = n_chars THEN 1.0 ELSE 0.0 END), 4)
             AS len_consistency
    FROM documents
    """,
    doc="Single-scan corpus profile: null rates, column cardinalities, "
    "length stats, and a metadata-consistency rate (declared n_chars vs "
    "actual length) — the pre-training data-quality gate.",
    tags=("profiling", "quality", "agg"),
)
def profile_documents(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    consistent = F.when(F.length("text") == F.col("n_chars"), 1.0).otherwise(0.0)
    return d.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("text")).cast("bigint").alias("null_text"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(consistent), 4).alias("len_consistency"),
    )


# --------------------------------------------------------------------------
# Quality-gate drop diagnostics: WHY each rejected document was rejected —
# the debugging view every cleaning pipeline needs next to its keep-list.
# --------------------------------------------------------------------------
@register(
    "quality_drop_reasons",
    oracle="""
    WITH checked AS (
      SELECT doc_id,
             concat(
               CASE WHEN n_chars < 100 THEN 'too_short;' ELSE '' END,
               CASE WHEN n_chars > 2000 THEN 'too_long;' ELSE '' END,
               CASE WHEN len(string_split(text, ' ')) < 20 THEN 'too_few_tokens;' ELSE '' END
             ) AS reasons
      FROM documents
    )
    SELECT doc_id, reasons
    FROM checked WHERE reasons <> ''
    """,
    doc="Drop diagnostics for the cleaning gate: each rejected doc with its "
    "concatenated failure reasons (fixed check order → deterministic "
    "string). The complement of cleaning_pipeline_counts' keep set.",
    tags=("quality", "profiling", "pipeline"),
)
def quality_drop_reasons(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    reasons = F.concat(
        F.when(F.col("n_chars") < 100, F.lit("too_short;")).otherwise(F.lit("")),
        F.when(F.col("n_chars") > 2000, F.lit("too_long;")).otherwise(F.lit("")),
        F.when(n_tokens < 20, F.lit("too_few_tokens;")).otherwise(F.lit("")),
    )
    return (
        d.select("doc_id", reasons.alias("reasons"))
        .filter(F.col("reasons") != "")
    )


# --------------------------------------------------------------------------
# Reproducible stratified sampling / data mixing (training-data primitive):
# hash-bucket sampling — no RNG, so the sample is stable across runs,
# engines, and cluster layouts, and any engine can audit it.
# --------------------------------------------------------------------------
@register(
    "stratified_sample_docs",
    oracle="""
    WITH bucketed AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100
               AS bucket
      FROM documents
    )
    SELECT doc_id, lang, CAST(bucket AS BIGINT) AS bucket
    FROM bucketed
    WHERE bucket < CASE lang WHEN 'en' THEN 80
                             WHEN 'de' THEN 50
                             WHEN 'fr' THEN 50
                             ELSE 20 END
    """,
    doc="Deterministic stratified sampling for training-data mixing: keep "
    "probability per language stratum, membership decided by an md5 hash "
    "bucket of the stable id — reproducible across runs/engines/cluster "
    "layouts (unlike rand()-based sampleBy) and auditable by any engine, "
    "which is exactly what the oracle does.",
    tags=("sampling", "training-mix", "dedup-adjacent"),
)
def stratified_sample_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    rate = (
        F.when(F.col("lang") == "en", 80)
        .when(F.col("lang").isin("de", "fr"), 50)
        .otherwise(20)
    )
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"))
        .filter(F.col("bucket") < rate)
    )


# --------------------------------------------------------------------------
# Skew-mitigated aggregation: identical results to a plain groupBy, but the
# hot key is spread over 16 reducers in phase 1.
# --------------------------------------------------------------------------
@register(
    "salted_user_activity",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
    doc="Two-phase salted aggregation (operators/skew.py:salted_agg): key ⊕ "
    "salt∈[0,16) partials, then final re-aggregation by key — the remedy "
    "when one hot key would pin a reducer at 100 TB. Result is provably "
    "identical to the plain groupBy (algebraic aggregates re-aggregate "
    "losslessly), which is exactly what the oracle states.",
    tags=("agg", "skew", "salting"),
)
def salted_user_activity(spark, sf_dir):
    from ..operators.skew import salted_agg

    ev = _t(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        key_cols=["user_id"],
        aggs={"n_events": "count:*", "raw_total": "sum:value"},
        buckets=16,
    )
    return out.select(
        "user_id", "n_events", F.round("raw_total", 2).alias("total_value")
    )


# --------------------------------------------------------------------------
# Built-in linear-regression aggregates (no UDF, no collect).
# --------------------------------------------------------------------------
@register(
    "regression_per_segment",
    oracle="""
    SELECT c_mktsegment,
           round(regr_slope(o_totalprice, epoch(o_orderdate)), 6) AS slope,
           round(regr_r2(o_totalprice, epoch(o_orderdate)), 6) AS r2,
           count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Per-segment OLS slope/R² of order totals over time via the "
    "built-in regr_* aggregates — single-shuffle, map-side partials; the "
    "idiomatic replacement for collect-and-fit loops.",
    tags=("agg", "regression", "functions"),
)
def regression_per_segment(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    x = F.unix_timestamp("o_orderdate").cast("double")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.regr_slope(F.col("o_totalprice"), x), 6).alias("slope"),
            F.round(F.regr_r2(F.col("o_totalprice"), x), 6).alias("r2"),
            F.count("*").alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# applyInPandas: arbitrary per-group Python (grouped-map API surface).
# --------------------------------------------------------------------------
@register(
    "zscore_per_priority",
    oracle="""
    WITH stats AS (
      SELECT o_orderkey, o_orderpriority,
             (o_totalprice - avg(o_totalprice) OVER (PARTITION BY o_orderpriority))
               / stddev_samp(o_totalprice) OVER (PARTITION BY o_orderpriority) AS z
      FROM orders
    )
    SELECT o_orderkey, o_orderpriority, round(z, 4) AS z
    FROM stats WHERE abs(z) > 1.5
    """,
    doc="Per-group z-score outliers via applyInPandas (grouped-map pandas "
    "API — the escape hatch for per-group logic SQL can't express; here "
    "deliberately a SQL-checkable kernel so the oracle can verify the "
    "plumbing end-to-end). Groups are whole partitions; skew-safe for "
    "low-cardinality keys only — high-cardinality grouped-map goes through "
    "window functions instead.",
    tags=("udf", "pandas", "grouped-map"),
)
def zscore_per_priority(spark, sf_dir):
    import pandas as pd

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        z = (pdf["o_totalprice"] - pdf["o_totalprice"].mean()) / pdf[
            "o_totalprice"
        ].std(ddof=1)
        out = pdf[["o_orderkey", "o_orderpriority"]].copy()
        out["z"] = z
        return out[abs(z) > 1.5]

    grouped = orders.groupBy("o_orderpriority").applyInPandas(
        _z, "o_orderkey bigint, o_orderpriority string, z double"
    )
    # Round JVM-side: F.round is half-up like DuckDB's round (pandas'
    # .round is banker's — a silent oracle-parity hazard).
    return grouped.select(
        "o_orderkey", "o_orderpriority", F.round("z", 4).alias("z")
    )


# --------------------------------------------------------------------------
# Sliding event-time window (10 min length, 5 min slide): each event lands
# in exactly 2 windows. Streaming form is the same expression under
# readStream + watermark.
# --------------------------------------------------------------------------
@register(
    "sliding_window_events",
    oracle="""
    SELECT time_bucket(INTERVAL '5 minutes', ts) - k.k * INTERVAL '5 minutes'
             AS window_start,
           event_type,
           count(*) AS cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT))
                AS BIGINT) / 1e2 AS total_value
    FROM events, (SELECT unnest([0, 1]) AS k) k
    GROUP BY 1, 2
    """,
    doc="Sliding window via window(ts, '10 minutes', '5 minutes'): the "
    "built-in expands each event to its len/slide covering windows before "
    "one grouped aggregation (oracle states the same expansion with an "
    "explicit 2-phase bucket union).",
    tags=("window", "sliding", "streaming-equivalent"),
)
def sliding_window_events(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("cnt"),
            # exact cents: window groups grow with event density (q1
            # conversion rationale)
            (
                F.expr(
                    "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
                )
                / 1e2
            ).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# Avro codec round-trip: completes the decode layer's codec list (SURVEY.md
# §1.4) — encode events into Avro binary, decode back, aggregate decoded
# fields. Oracle computes the same aggregate from the raw columns, so any
# codec infidelity (zigzag, unions, utf8, IEEE754) breaks the value hash.
# --------------------------------------------------------------------------
@register(
    "decode_avro_payload",
    oracle="""
    SELECT event_type, count(*) AS cnt,
           CAST(sum(CAST(round("value" * 100) AS BIGINT))
                AS BIGINT) / 1e2 AS total_value
    FROM events WHERE event_id < 5000
    GROUP BY event_type
    """,
    doc="Avro binary codec (pure-Python, Avro 1.11 spec — pip pyspark has "
    "no spark-avro jar): events → to_avro → from_avro → aggregate on the "
    "decoded struct. Arrow-batched pandas UDFs; malformed payloads decode "
    "to NULL (dead-letterable) per the S9 contract.",
    tags=("codec", "avro", "decode"),
)
def decode_avro_payload(spark, sf_dir):
    from ..functions.avro_codec import from_avro, to_avro

    schema = {
        "type": "record",
        "name": "event",
        "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "event_type", "type": ["null", "string"]},
            {"name": "value", "type": ["null", "double"]},
        ],
    }
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    enc = e.select(
        to_avro(F.struct("event_id", "event_type", "value"), schema).alias("payload")
    )
    dec = enc.select(from_avro("payload", schema).alias("d"))
    return dec.groupBy(F.col("d.event_type").alias("event_type")).agg(
        F.count("*").alias("cnt"),
        # exact cents: per-type groups are n/|types| (q1 rationale)
        (
            F.expr("CAST(sum(CAST(round(d.value * 100) AS BIGINT)) AS BIGINT)")
            / 1e2
        ).alias("total_value"),
    )


# --------------------------------------------------------------------------
# UDAF surface (SURVEY §2.4 "UDAF registration"): a GROUPED_AGG pandas_udf
# — Arrow ships each group's column once, the aggregate returns one scalar.
# --------------------------------------------------------------------------
@register(
    "gini_by_priority",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS i,
             count(*)      OVER (PARTITION BY o_orderpriority) AS n,
             sum(o_totalprice) OVER (PARTITION BY o_orderpriority) AS tot
      FROM orders
    )
    SELECT o_orderpriority,
           round(2.0 * sum(i * o_totalprice) / (n * tot) - (n + 1.0) / n, 4)
             AS gini,
           count(*) AS n_orders
    FROM ranked
    GROUP BY o_orderpriority, n, tot
    ORDER BY o_orderpriority
    """,
    doc="Custom UDAF via GROUPED_AGG pandas_udf: Gini coefficient of order "
    "value per priority class (how concentrated spend is — the "
    "distribution-profiling aggregate a data-mix audit wants, and a "
    "shape plain SQL aggregates can't express without a window replay). "
    "The UDAF is 3 lines of numpy on a sorted group; Arrow moves each "
    "group's column once and the shuffle carries only (priority, price) "
    "pairs. The oracle replays the identical formula "
    "(2·Σ i·x_i/(n·Σx) − (n+1)/n over ascending x) with window "
    "functions. Works at any group count; per-group data must fit one "
    "worker (5 classes here — the documented GROUPED_AGG constraint, "
    "same as X17's grouped-map).",
    tags=("udf", "udaf", "agg"),
)
def gini_by_priority(spark, sf_dir):
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    orders = _t(spark, sf_dir, "orders")

    # functionType is explicit: this module has `from __future__ import
    # annotations`, so the hints are strings and eval-type inference
    # can't see the Series -> scalar (GROUPED_AGG) signature.
    @F.pandas_udf(T.DoubleType(), F.PandasUDFType.GROUPED_AGG)
    def gini(prices: pd.Series) -> float:
        x = np.sort(prices.to_numpy(dtype=np.float64))
        n = x.size
        i = np.arange(1, n + 1, dtype=np.float64)
        return float(2.0 * (i * x).sum() / (n * x.sum()) - (n + 1.0) / n)

    # A GROUPED_AGG pandas UDF cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT), so the count is its own tiny
    # aggregate joined back on the 5-row group key.
    g = orders.groupBy("o_orderpriority").agg(
        F.round(gini("o_totalprice"), 4).alias("gini")
    )
    n = orders.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))
    return g.join(n, "o_orderpriority").orderBy("o_orderpriority")


# --------------------------------------------------------------------------
# SQL-text interface (SURVEY §2.4 "SQL parsing" row, live): the query is
# authored as SQL and parsed/planned by Spark's own parser over registered
# temp views — same Catalyst plan quality as the DataFrame form.
# --------------------------------------------------------------------------
@register(
    "sql_interface_revenue_by_nation_quarter",
    oracle="""
    SELECT n_name,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) / 1e2 AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name, year(o_orderdate), quarter(o_orderdate)
    ORDER BY n_name, yr, qtr
    """,
    doc="The SQL-text entry point, exercised end-to-end: this query is "
    "submitted as a SQL string to spark.sql() over per-query temp views "
    "(not built with the DataFrame API), proving the parser/analyzer "
    "path the reference would have inherited from Flink SQL. Catalyst "
    "produces the same physical plan as the equivalent DataFrame "
    "program — date filter pushed to the orders scan, nation broadcast, "
    "partial aggregation — because both lower to the same logical plan. "
"Revenue sums exact integer cents (the r9 money template): the raw "
"double sum hit a 1-cent summation-order divergence on the 365-day "
"generated corpus at sf0.1 — the gate catch that closed VERDICT r9 "
"item 8 for the last remaining revenue-summing SQL text.",
    tags=("sql", "join", "agg", "tpch"),
)
def sql_interface_revenue_by_nation_quarter(spark, sf_dir):
    for t in ("lineitem", "orders", "customer", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(
        """
        SELECT n_name,
               CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) / 1e2 AS revenue
        FROM v_lineitem
        JOIN v_orders   ON l_orderkey = o_orderkey
        JOIN v_customer ON o_custkey = c_custkey
        JOIN v_nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name, year(o_orderdate), quarter(o_orderdate)
        ORDER BY n_name, yr, qtr
        """
    )


# --------------------------------------------------------------------------
# Spark 4 VARIANT type: semi-structured values parsed once into a binary
# variant encoding, then path-accessed without re-parsing — the modern
# engine answer to JSON-string columns (vs get_json_object re-parsing the
# string per access).
# --------------------------------------------------------------------------
@register(
    "variant_props_stats",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n,
           min(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
           max(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
    FROM events
    WHERE props IS NOT NULL
    GROUP BY 1
    ORDER BY k_bucket
    """,
    doc="Spark 4 VARIANT surface: events.props (a JSON string) is parsed "
    "ONCE per row into the binary variant encoding (parse_json), then "
    "path-accessed with variant_get — unlike get_json_object, repeated "
    "accesses don't re-parse the string, which is the difference between "
    "O(paths) and O(paths x parse) on wide semi-structured rows at "
    "scale. The oracle reads the same paths with DuckDB's JSON "
    "extraction.",
    tags=("functions", "json", "variant"),
)
def variant_props_stats(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return (
        ev.select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("k_bucket")
    )


# --------------------------------------------------------------------------
# ANSI-safe arithmetic: Spark 4 runs ANSI mode by default, so overflow /
# bad casts / division-by-zero THROW mid-job unless the pipeline opts into
# the try_* family — the difference between a 100 TB job dying at hour 9
# on one malformed row and it yielding NULL for that row.
# --------------------------------------------------------------------------
@register(
    "try_functions_safety",
    oracle="""
    SELECT CAST(sum(CASE WHEN q = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_qty,
           CAST(count(*) - count(safe_ratio) AS BIGINT) AS n_null_ratio,
           round(sum(safe_ratio), 2) AS sum_ratio,
           CAST(count(*) - count(parsed_flag) AS BIGINT) AS n_bad_casts
    FROM (
      SELECT l_quantity AS q,
             CASE WHEN l_quantity = 0 THEN NULL
                  ELSE l_extendedprice / l_quantity END AS safe_ratio,
             TRY_CAST(l_returnflag AS BIGINT) AS parsed_flag
      FROM lineitem
    )
    """,
    doc="ANSI-safe pipeline surface: try_divide yields NULL where strict "
    "ANSI division would throw on a zero denominator, and try_cast "
    "yields NULL for unparseable values ('A'/'N'/'R' as BIGINT) instead "
    "of failing the job — the posture a long-running ingest needs under "
    "Spark 4's default ANSI mode. The oracle reproduces the NULL "
    "semantics with CASE/TRY_CAST. (This corpus has no zero quantities, "
    "so n_zero_qty doubles as the proof the guard is exercised-but-"
    "clean; every l_returnflag cast fails by design.)",
    tags=("functions", "ansi", "quality"),
)
def try_functions_safety(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    safe_ratio = F.try_divide(
        "l_extendedprice",
        F.when(F.col("l_quantity") == 0, F.lit(None)).otherwise(
            F.col("l_quantity")
        ),
    )
    inner = li.select(
        F.col("l_quantity").alias("q"),
        safe_ratio.alias("safe_ratio"),
        F.try_to_number(F.col("l_returnflag"), F.lit("999")).alias("parsed_flag"),
    )
    return inner.agg(
        F.sum(F.when(F.col("q") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero_qty"),
        (F.count("*") - F.count("safe_ratio")).cast("bigint").alias("n_null_ratio"),
        F.round(F.sum("safe_ratio"), 2).alias("sum_ratio"),
        (F.count("*") - F.count("parsed_flag")).cast("bigint").alias("n_bad_casts"),
    )


# --------------------------------------------------------------------------
# XML decode codec (Spark 4 from_xml) — completes the payload decoder
# family (string/JSON/CSV/Avro/base64/hex already registered). Same
# schema-on-read pattern as decode_json/decode_csv: synthesize the wire
# bytes from events columns, then decode and aggregate the decoded struct.
# --------------------------------------------------------------------------
@register(
    "decode_xml_payload",
    oracle="""
    SELECT user_id % 5 AS bucket,
           count(*) AS cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT))
                AS BIGINT) / 1e2 AS total
    FROM events
    GROUP BY 1
    """,
    doc="S8 decode layer, XML codec: payload bytes carrying "
    "'<m><u>..</u><v>..</v></m>' decode via from_xml into a typed struct "
    "(schema-on-read, like the JSON/CSV/Avro paths), then aggregate. The "
    "oracle aggregates the source columns directly — decode fidelity IS "
    "the assertion: any parse drift changes every bucket's sum.",
    tags=("parity", "decode", "functions"),
)
def decode_xml_payload(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    xml = F.concat(
        F.lit("<m><u>"),
        F.col("user_id").cast("string"),
        F.lit("</u><v>"),
        F.col("value").cast("string"),
        F.lit("</v></m>"),
    )
    dec = ev.select(
        F.from_xml(xml, "u BIGINT, v DOUBLE").alias("d")
    )
    return dec.groupBy((F.col("d.u") % 5).alias("bucket")).agg(
        F.count("*").alias("cnt"),
        # exact cents: five buckets of n/5 rows (q1 rationale)
        (
            F.expr("CAST(sum(CAST(round(d.v * 100) AS BIGINT)) AS BIGINT)")
            / 1e2
        ).alias("total"),
    )
