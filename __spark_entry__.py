"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship WordCount-parity pipeline (the reference's
one example job, ``WordCount.java:28-32``) on sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 via the
registry in ``flink_emqx_connector_spark.plans``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def _configure(spark: SparkSession) -> SparkSession:
    """Apply engine session confs on a driver-provided session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from flink_emqx_connector_spark.plans import QUERIES

    _configure(spark)
    return QUERIES["wordcount"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    BASELINE.json LLM-pipeline extensions)."""
    from flink_emqx_connector_spark.plans import QUERIES

    def _wrap(q):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return q.spark(_configure(spark), sf_dir)

        return run

    return {name: _wrap(q) for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle for each SQL-expressible query; probabilistic
    operators (MinHash-LSH recall, LSH ANN, HLL sketches) are omitted
    → driver records the weaker rows-only check."""
    from flink_emqx_connector_spark.plans import all_oracle_sql

    return all_oracle_sql()
