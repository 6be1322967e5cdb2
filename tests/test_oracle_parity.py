"""The t2 gate, locally: every registered query with an oracle must match
DuckDB exactly (row count, columns, order-insensitive values) at sf0.001."""

import pytest

from flink_emqx_connector_spark.plans import QUERIES
from flink_emqx_connector_spark.plans.check import compare_query


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    res = compare_query(spark, sf_dir, name)
    assert res.get("ok"), res


def test_driver_contract(spark):
    """__spark_entry__ exposes the registry and the flagship entry runs."""
    import __spark_entry__ as E

    rows = E.entry(spark).collect()
    assert len(rows) > 0
    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) == len(QUERIES)
