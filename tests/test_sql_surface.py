"""SQL-surface family (X114): the structural guarantee is that the text
Spark executes IS the oracle string — these tests pin that identity and
the semantic invariants the aggregate hash can't localize."""

from flink_emqx_connector_spark.plans import QUERIES
from flink_emqx_connector_spark.plans.sql_surface import SQL_TEXTS


def test_oracle_is_the_executed_text():
    """Drift-impossibility: for every family member the registered oracle
    string is byte-identical to the text the Spark side runs."""
    assert len(SQL_TEXTS) == 16
    for name, (text, _tables) in SQL_TEXTS.items():
        assert QUERIES[name].oracle == text, name


def test_family_members_are_registered_with_sql_tags():
    for name in SQL_TEXTS:
        assert "sql-surface" in QUERIES[name].tags, name


def test_rollup_grand_total_is_sum_of_regions(spark, sf_dir):
    rows = QUERIES["sql_nation_region_rollup"].spark(spark, sf_dir).collect()
    total = [r for r in rows if r.region == "ALL" and r.nation == "ALL"]
    regions = [r for r in rows if r.region != "ALL" and r.nation == "ALL"]
    nations = [r for r in rows if r.nation != "ALL"]
    assert len(total) == 1
    assert total[0].n_suppliers == sum(r.n_suppliers for r in regions)
    assert total[0].n_suppliers == sum(r.n_suppliers for r in nations)


def test_setops_cohorts_partition_the_union(spark, sf_dir):
    """both + buy_only + view_only = |buyers ∪ viewers| — the three
    INTERSECT/EXCEPT legs are a partition, never overlapping."""
    from pyspark.sql import functions as F

    from flink_emqx_connector_spark.session import load_table

    got = {
        r.cohort: r.n_users
        for r in QUERIES["sql_buyer_viewer_setops"].spark(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    union = (
        ev.filter(F.col("event_type").isin("purchase", "view"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert got["both"] + got["buy_only"] + got["view_only"] == union


def test_deciles_are_balanced_and_ordered(spark, sf_dir):
    rows = sorted(
        QUERIES["sql_order_value_deciles"].spark(spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    # ntile balance: sizes differ by at most 1
    sizes = [r.n_orders for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # value bands are non-decreasing across deciles
    for lo, hi in zip(rows, rows[1:]):
        assert lo.max_value <= hi.min_value + 0.01


def test_exists_subset_of_purchasers(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_emqx_connector_spark.session import load_table

    [r] = QUERIES["sql_exists_repeat_purchasers"].spark(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    purchasers = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert 0 <= r.n_repeat_purchasers <= purchasers
