"""Engine-stable rounding for float outputs that BOTH Spark and DuckDB
must produce bit-identically.

``round(x, k)`` differs between the engines at shortest-representation
boundaries: Spark rounds the shortest decimal repr of the double
(``BigDecimal.valueOf``) while DuckDB rounds the true binary value, so a
quotient like 312.30875 flips its last kept digit between them (found by
the sf0.1 oracle gate; NOTES.md "sf0.1 full-gate finding"). The
``floor(x*10^k + 0.5)/10^k`` form runs the SAME IEEE steps on both
engines — identical output by construction. Valid for non-negative
values (half-up == half-away there); for signed values round toward the
sign first or keep plain round() and accept the hazard.

Policy: new ratio/derived-float outputs use these helpers from the
start; existing round() sites are converted only when a gate trips
(converting a driver-recorded query forces a re-record).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(col: Column, k: int) -> Column:
    """floor(col * 10^k + 0.5) / 10^k as a Spark column (non-negative)."""
    scale = 10**k
    return F.floor(col * scale + 0.5) / scale


def stable_round_sql(expr: str, k: int) -> str:
    """The same rounding as DuckDB SQL text, for oracle strings."""
    scale = 10**k
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
