"""SQL-surface family (VERDICT r8 item 6): the pure-SQL user contract.

A training-data platform's users live in SQL, not the DataFrame API —
one ``spark.sql()`` query (``sql_interface_revenue_by_nation_quarter``)
proves parsing works, but not that the surface is broad. This module
re-expresses twelve representative registry shapes (joins, FILTER
aggregates, ROLLUP, windows, EXISTS/scalar subqueries, set ops, ntile,
manual pivot, date bucketing) as **portable ANSI text executed verbatim
on BOTH engines**: the Spark side registers temp views over the same
parquet tables and runs ``spark.sql(TEXT)``; the oracle IS the identical
``TEXT`` string run by DuckDB. Drift between the query and its oracle is
impossible by construction — there is one string (pinned by
``tests/test_sql_surface.py``).

Portability rules the texts obey (the intersection of Spark 4 ANSI SQL
and DuckDB SQL, collected from rounds 1-8 of cross-engine lessons):

- ``CAST(count/sum AS BIGINT)`` everywhere (DuckDB widens to HUGEINT);
- floor-form rounding ``floor(x * 1e4 + 0.5) / 1e4`` on positive floats
  (``round()`` half-repr divergence — NOTES.md sf0.1 gate finding);
- ``NULLIF`` on every denominator (ANSI Spark aborts on /0, DuckDB
  yields NULL — NULLIF makes both NULL);
- no integer division (``div`` vs ``//`` differ), no engine-specific
  date functions — ``date_trunc``/``EXTRACT`` only;
- every window/top-k/ntile ORDER BY carries a unique tie-break key;
- plain ``WITH`` only — these texts are cheap enough that DuckDB's
  CTE re-inlining is harmless (the AS MATERIALIZED pin is DuckDB-only
  syntax and would break Spark);
- **no bare decimal-literal arithmetic on aggregate results** (r9
  verdict, the ``grouping_sets_orders`` bug class): Spark parses
  ``100.0`` as DECIMAL(4,1), so ``sum(BIGINT) / 100.0`` comes back
  DecimalType while DuckDB returns DOUBLE — the driver's typed hash
  fails even though values agree. Scientific notation (``1e2``) parses
  as DOUBLE in both engines and is safe; if a plain decimal literal
  must touch an integer aggregate, write ``100.0D`` is Spark-only —
  instead CAST the aggregate to DOUBLE first. ``plans/check.py`` now
  hard-fails any query whose Spark schema carries DecimalType against a
  non-DECIMAL oracle column, so this class can't pass the local gate
  again. (``0.5`` inside ``floor(dbl * 1e2 + 0.5)`` is fine: the
  double operand wins the numeric promotion in both engines.);
- **integer-cents for money sums whose groups can reach ~1e11** (the
  round-9 sf10 FP-summation finding, applied proactively here in r10):
  ``CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT) / 1e2`` —
  identical IEEE per-row product both engines, exact int64 sum, one
  double division at the end (the outer CAST collapses DuckDB's
  HUGEINT). Used by ``sql_segment_revenue`` (~7.5e11/segment at sf10),
  ``sql_returnflag_status_matrix`` (~5e11/flag), and
  ``sql_monthly_ship_flow`` (crosses 1e11 at ~sf30). Per-row rounding
  before the sum is the same documented ≤0.5-cent/row tradeoff as
  ``bucketed_colocated_join``.
- **the boundary is also DRAW-dependent, not only magnitude-dependent**
  (round-10 continuation finding): ``round(sum(money), 2)`` diverged on
  a fresh 365-day sf0.1 generated corpus at a ~4e7 group sum — any
  data draw can land a group's true sum within summation-order error of
  a half-cent boundary. For two-decimal inputs the EXACT escape costs
  nothing semantically: ``price*(1-d)`` is an exact 1e4-scaled int64
  (``CAST(round(price*100) AS BIGINT) * (100 - CAST(round(d*100) AS
  BIGINT))``), so sum exactly, half-away to cents with ``(S+50) // 100``
  (truncating div agrees across engines on positives), divide once —
  values are identical to the float form wherever it was right, correct
  where it wasn't. Applied to q1/q5/q6/q15/q17/q19 and
  ``sql_interface_revenue_by_nation_quarter`` (verified value-identical
  on driver data); q1's sum_charge uses the 1e6 three-factor scale
  (int64 headroom to ~8e7 rows/group).

Catalyst treats a parsed-SQL plan identically to the DataFrame API
(same logical plan, same optimizer rules), so every scale property the
DataFrame twins have — pushdown, pruning, broadcast choice, AQE — holds
unchanged; the scale posture of each shape is documented on its
DataFrame twin and not repeated here.
"""

from __future__ import annotations

from ..session import load_table
from .registry import register


def _run_sql(spark, sf_dir: str, text: str, tables: tuple[str, ...]):
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(text)


def _sql_query(name: str, text: str, tables: tuple[str, ...], doc: str):
    """Register a portable-text query: Spark executes TEXT over temp
    views; the oracle is the very same TEXT."""

    @register(name, oracle=text, doc=doc, tags=("sql", "sql-surface"))
    def _q(spark, sf_dir, _text=text, _tables=tables):
        return _run_sql(spark, sf_dir, _text, _tables)

    return _q


#: name -> (text, tables); module-level so the identity test can assert
#: the oracle string IS the executed string for every family member.
SQL_TEXTS: dict[str, tuple[str, tuple[str, ...]]] = {}


def _define(name: str, tables: tuple[str, ...], doc: str, text: str):
    SQL_TEXTS[name] = (text, tables)
    _sql_query(name, text, tables, doc)


_define(
    "sql_segment_revenue",
    ("customer", "orders"),
    "SQL surface: inner join + aggregate — revenue and order counts per "
    "market segment (the DataFrame twin family: star_join/semi_join).",
    """
    SELECT c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               / 1e2 AS total_revenue,
           floor(CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                      AS BIGINT) / 1e2 / count(*) * 1e4 + 0.5) / 1e4
               AS avg_order_value
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)

_define(
    "sql_priority_share_by_year",
    ("orders",),
    "SQL surface: FILTER-clause aggregates + guarded ratio — urgent/high "
    "order share per order year (twin: q4_late_shipment_priority shape).",
    """
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                AS BIGINT) AS n_urgent,
           CAST(count(*) FILTER (WHERE o_orderpriority IN
                ('1-URGENT', '2-HIGH')) AS BIGINT) AS n_high_or_urgent,
           floor(CAST(count(*) FILTER (WHERE o_orderpriority IN
                     ('1-URGENT', '2-HIGH')) AS DOUBLE)
                 / NULLIF(count(*), 0) * 1e6 + 0.5) / 1e6 AS urgent_share
    FROM orders
    GROUP BY EXTRACT(YEAR FROM o_orderdate)
    """,
)

_define(
    "sql_nation_region_rollup",
    ("supplier", "nation", "region"),
    "SQL surface: GROUP BY ROLLUP over a snowflake join — supplier "
    "census at (region, nation), (region), and grand-total grains "
    "(twin: rollup_lineitem). coalesce labels instead of grouping() so "
    "the text stays engine-portable.",
    """
    SELECT coalesce(r.r_name, 'ALL') AS region,
           coalesce(n.n_name, 'ALL') AS nation,
           CAST(count(s.s_suppkey) AS BIGINT) AS n_suppliers,
           floor(sum(s.s_acctbal + 1000) * 1e2 + 0.5) / 1e2
               AS acctbal_plus_1k
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)

_define(
    "sql_top3_parts_per_brand",
    ("part",),
    "SQL surface: ranking window with unique tie-break — three priciest "
    "parts per brand (twin: window_topk_orders_per_customer).",
    """
    WITH ranked AS (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             row_number() OVER (
               PARTITION BY p_brand
               ORDER BY p_retailprice DESC, p_partkey
             ) AS rk
      FROM part
    )
    SELECT p_brand, CAST(rk AS BIGINT) AS rk, p_partkey, p_name,
           p_retailprice
    FROM ranked WHERE rk <= 3
    """,
)

_define(
    "sql_exists_repeat_purchasers",
    ("events",),
    "SQL surface: correlated EXISTS — users who purchased AND returned "
    "to view afterwards (twin: semi_join family; decorrelates to a "
    "semi-join in both engines).",
    """
    SELECT CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_repeat_purchasers
    FROM events p
    WHERE p.event_type = 'purchase'
      AND EXISTS (
        SELECT 1 FROM events v
        WHERE v.user_id = p.user_id
          AND v.event_type = 'view'
          AND v.ts > p.ts
      )
    """,
)

_define(
    "sql_monthly_ship_flow",
    ("lineitem",),
    "SQL surface: date_trunc bucketing — monthly shipped quantity and "
    "gross revenue (twin: tumbling_window / resample family).",
    """
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) / 1e2 AS gross_revenue
    FROM lineitem
    GROUP BY date_trunc('month', l_shipdate)
    """,
)

_define(
    "sql_events_daily_activity",
    ("events",),
    "SQL surface: per-day distinct users + typed value stats over the "
    "event stream (twin: events_weekday_enrichment).",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           floor(sum(value) FILTER (WHERE event_type = 'purchase')
                 * 1e4 + 0.5) / 1e4 AS purchase_value
    FROM events
    GROUP BY date_trunc('day', ts)
    """,
)

_define(
    "sql_docs_lang_profile",
    ("documents",),
    "SQL surface: corpus census with a window-derived share — document "
    "count, mean length, and corpus share per language (twin: "
    "profile_documents).",
    """
    WITH per_lang AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY lang
    )
    SELECT lang, n_docs, total_chars,
           floor(CAST(total_chars AS DOUBLE) / NULLIF(n_docs, 0)
                 * 1e2 + 0.5) / 1e2 AS avg_chars,
           floor(CAST(n_docs AS DOUBLE)
                 / NULLIF(sum(n_docs) OVER (), 0) * 1e6 + 0.5) / 1e6
               AS corpus_share
    FROM per_lang
    """,
)

_define(
    "sql_returnflag_status_matrix",
    ("lineitem",),
    "SQL surface: manual CASE pivot — linestatus columns per returnflag "
    "(twin: pivot_lineitem_status, which uses the DataFrame pivot()).",
    """
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT)
               AS n_f,
           CAST(count(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT)
               AS n_o,
           CAST(count(*) FILTER (WHERE l_linestatus = 'P') AS BIGINT)
               AS n_p,
           CAST(sum(CASE WHEN l_linestatus = 'F'
                         THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) / 1e2 AS rev_f
    FROM lineitem
    GROUP BY l_returnflag
    """,
)

_define(
    "sql_order_value_deciles",
    ("orders",),
    "SQL surface: ntile decile banding with deterministic tie-break — "
    "order-value distribution summary. SCALE NOTE: an unpartitioned "
    "ntile is a single-reducer total order (Spark warns and funnels the "
    "table through one window partition) — it is registered because it "
    "is the construct SQL users actually write; the scale-safe form is "
    "the DataFrame twin user_ltv_deciles' broadcast-quantile banding "
    "(one aggregate buffer + broadcast thresholds, no global sort), "
    "which is the documented 100 TB swap.",
    """
    WITH banded AS (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    SELECT CAST(decile AS INTEGER) AS decile,
           CAST(count(*) AS BIGINT) AS n_orders,
           floor(min(o_totalprice) * 1e2 + 0.5) / 1e2 AS min_value,
           floor(max(o_totalprice) * 1e2 + 0.5) / 1e2 AS max_value,
           floor(avg(o_totalprice) * 1e4 + 0.5) / 1e4 AS avg_value
    FROM banded GROUP BY decile
    """,
)

_define(
    "sql_buyer_viewer_setops",
    ("events",),
    "SQL surface: INTERSECT / EXCEPT set algebra on user cohorts "
    "(twin: set_intersect_users / set_except_users).",
    """
    WITH buyers AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    viewers AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
    )
    SELECT 'both' AS cohort, CAST(count(*) AS BIGINT) AS n_users
    FROM (SELECT user_id FROM buyers INTERSECT
          SELECT user_id FROM viewers)
    UNION ALL
    SELECT 'buy_only' AS cohort, CAST(count(*) AS BIGINT) AS n_users
    FROM (SELECT user_id FROM buyers EXCEPT
          SELECT user_id FROM viewers)
    UNION ALL
    SELECT 'view_only' AS cohort, CAST(count(*) AS BIGINT) AS n_users
    FROM (SELECT user_id FROM viewers EXCEPT
          SELECT user_id FROM buyers)
    """,
)

_define(
    "sql_above_average_orders",
    ("orders",),
    "SQL surface: scalar subquery threshold + per-status census of "
    "above-average orders (twin: correlated_subquery_agg).",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_above_avg,
           floor(min(o_totalprice) * 1e2 + 0.5) / 1e2 AS min_above
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY o_orderstatus
    """,
)

_define(
    "sql_supplier_part_coverage",
    ("lineitem", "supplier", "part"),
    "SQL surface: two-join coverage census with HAVING — suppliers "
    "shipping at least five distinct part types, with brand breadth "
    "(twin: q16_supplier_part_variety shape).",
    """
    SELECT s.s_name,
           CAST(count(DISTINCT p.p_type) AS BIGINT) AS n_types,
           CAST(count(DISTINCT p.p_brand) AS BIGINT) AS n_brands,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY s.s_name
    HAVING count(DISTINCT p.p_type) >= 5
    """,
)

_define(
    "sql_grouping_flags",
    ("customer", "nation", "region"),
    "SQL surface: GROUPING() disambiguation over ROLLUP — the flag "
    "columns that tell a subtotal row from a data row whose key "
    "happens to be NULL (twin: rollup_lineitem / "
    "sql_nation_region_rollup, which lack the flags). Both engines "
    "return 0/1 from GROUPING(); cast pins the shared BIGINT type.",
    """
    SELECT coalesce(r.r_name, 'ALL') AS region_name,
           coalesce(n.n_name, 'ALL') AS nation_name,
           CAST(GROUPING(r.r_name) AS BIGINT) AS g_region,
           CAST(GROUPING(n.n_name) AS BIGINT) AS g_nation,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)

_define(
    "sql_except_all_order_bag",
    ("orders",),
    "SQL surface: EXCEPT ALL — BAG difference (each occurrence "
    "consumes one match), vs the set-semantics EXCEPT the setops "
    "family covers: a customer with 5 open orders and 2 urgent ones "
    "keeps multiplicity 3 here and would vanish under EXCEPT if the "
    "sets merely intersect.",
    """
    SELECT k, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
      EXCEPT ALL
      SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY k
    ORDER BY n DESC, k
    LIMIT 20
    """,
)

_define(
    "sql_group_by_all_status_priority",
    ("orders",),
    "SQL surface: GROUP BY ALL (round 12) — the modern analyst "
    "shorthand both Spark 4 and DuckDB resolve to every non-aggregate "
    "select item; proves the surface tracks current-dialect SQL, not "
    "just ANSI-92. Integer-cents money sum per the r10 policy.",
    """
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               / 1e2 AS total_value,
           CAST(min(o_orderkey) AS BIGINT) AS first_key
    FROM orders
    GROUP BY ALL
    ORDER BY status, priority
    """,
)
