"""Registry of named queries.

Each entry pairs a PySpark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent DuckDB-runnable SQL oracle (or ``None`` for genuinely
non-SQL-expressible operators — the driver then records a weaker rows-only
check). Column names/aliases MUST match between the two sides; the driver
sorts columns by name before value-hashing.

Determinism rules applied throughout the registry:

- every float output is ``round(x, k)`` on BOTH sides (summation order
  differs between engines; rounding absorbs the last-ulp drift);
- every top-k / limit has a total order (unique tie-break key);
- counts are BIGINT on both sides (DuckDB ``count`` already is; sums of
  integers are cast explicitly since DuckDB widens to HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over pre-registered table views, or None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    # For approximate operators (sketches) that can never hash-match an
    # exact oracle: a bounded-error contract the LOCAL gate enforces
    # (plans/check.py "bounded-oracle" mode). The driver still records its
    # weaker rows-only check — this field makes the error contract a gate,
    # not just a pytest property. Shape:
    #   {"sql": <DuckDB SQL producing the EXACT values, same key cols>,
    #    "key": [join cols],
    #    "bounds": {col: ("exact"|"rel", tol)}}
    bounded: dict | None = None


QUERIES: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bounded: dict | None = None,
):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QueryDef(
            name=name, spark=fn, oracle=oracle, doc=doc, tags=tags, bounded=bounded
        )
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in QUERIES.items()}


def all_oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
