"""The DecimalType dtype guard in plans/check.py (r9 verdict item 1b).

The driver hashes TYPED values, so a Spark DecimalType column against a
DOUBLE oracle column hash-mismatches even when the values agree after
float coercion — exactly how `grouping_sets_orders` went driver-red in
round 9 while five local scale gates stayed green (`_norm` coerced
Decimal→float before comparing). These tests pin the guard both ways:
it fires on the bug class and stays silent when both sides are decimal
or both are double.
"""

from __future__ import annotations

import pytest

from flink_emqx_connector_spark.plans.check import compare_query
from flink_emqx_connector_spark.plans.registry import QUERIES, QueryDef


@pytest.fixture
def _temp_query():
    """Install a throwaway QueryDef and clean it up."""
    installed = []

    def install(name, spark_fn, oracle):
        QUERIES[name] = QueryDef(name=name, spark=spark_fn, oracle=oracle)
        installed.append(name)
        return name

    yield install
    for name in installed:
        QUERIES.pop(name, None)


def test_guard_fails_decimal_vs_double(spark, sf_dir, _temp_query):
    # The grouping_sets_orders bug class: `/ 100.0` in spark.sql() text
    # parses as DECIMAL(4,1) → the result column is DecimalType, while
    # the DuckDB oracle returns DOUBLE. Values agree; types don't.
    def q(spark, sf_dir):
        return spark.sql("SELECT CAST(123 AS BIGINT) / 100.0 AS v")

    name = _temp_query("_guard_dec_vs_dbl", q, "SELECT 123 / 100.0 AS v")
    res = compare_query(spark, sf_dir, name)
    assert res["ok"] is False
    assert "dtype" in res["why"]
    assert "v" in res["why"]


def test_guard_silent_when_both_double(spark, sf_dir, _temp_query):
    def q(spark, sf_dir):
        return spark.sql("SELECT CAST(123 AS BIGINT) / 100.0D AS v")

    name = _temp_query("_guard_dbl_vs_dbl", q, "SELECT 123 / 100.0 AS v")
    res = compare_query(spark, sf_dir, name)
    assert res["ok"] is True, res


def test_guard_silent_when_both_decimal(spark, sf_dir, _temp_query):
    # Decimal on BOTH sides is a legitimate typed match — the guard must
    # not reject it (the driver's hash would agree).
    def q(spark, sf_dir):
        return spark.sql("SELECT CAST(1.25 AS DECIMAL(10,2)) AS v")

    name = _temp_query(
        "_guard_dec_vs_dec", q, "SELECT CAST(1.25 AS DECIMAL(10,2)) AS v"
    )
    res = compare_query(spark, sf_dir, name)
    assert res["ok"] is True, res


def test_grouping_sets_orders_is_double_typed(spark, sf_dir):
    # Regression pin for the round-9 red row itself: the fixed SQL text
    # must come back DoubleType, not DecimalType.
    from pyspark.sql import types as T

    sdf = QUERIES["grouping_sets_orders"].spark(spark, sf_dir)
    (f,) = [f for f in sdf.schema.fields if f.name == "total_price"]
    assert isinstance(f.dataType, T.DoubleType), f.dataType


def test_registry_has_no_decimal_outputs(spark, sf_dir):
    # Sweep every oracle-backed registry entry's UNEXECUTED plan schema:
    # no DecimalType output anywhere (the repo's convention is DOUBLE for
    # all money/ratio columns; a decimal sneaking in means a bare decimal
    # literal infected a spark.sql text). Schema inspection is lazy — no
    # query executes — but entries that collect bounded build-sides at
    # plan-construction time do run those, so keep this at tiny sf.
    from pyspark.sql import types as T

    offenders = []
    for name, q in sorted(QUERIES.items()):
        if q.oracle is None:
            continue
        try:
            sdf = q.spark(spark, sf_dir)
        except Exception:
            continue  # construction failures are other tests' business
        for f in sdf.schema.fields:
            if isinstance(f.dataType, T.DecimalType):
                offenders.append((name, f.name))
    assert not offenders, offenders


def test_guard_fails_double_vs_decimal_oracle(spark, sf_dir, _temp_query):
    # The REVERSE direction: a DuckDB DECIMAL column against a Spark
    # DOUBLE also hash-mismatches at the driver (typed values). DuckDB's
    # `/` yields DOUBLE, so an explicit CAST forces the decimal side.
    def q(spark, sf_dir):
        return spark.sql("SELECT 1.23D AS v")

    name = _temp_query(
        "_guard_dbl_vs_dec", q, "SELECT CAST(1.23 AS DECIMAL(10,2)) AS v"
    )
    res = compare_query(spark, sf_dir, name)
    assert res["ok"] is False
    assert "dtype" in res["why"] and "v" in res["why"]
