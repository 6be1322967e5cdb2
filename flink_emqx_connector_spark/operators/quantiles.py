"""Discrete (type-1) quantile boundaries — the ulp-safe bucketing form.

Why this exists (round-11 seed-7 sf10 finding, NOTES.md): bucketing
quantized values by an INTERPOLATED quantile (``percentile`` /
``quantile_cont``) is cross-engine fragile exactly where it matters —
the interpolation arithmetic ``a + (b-a)·f`` differs between engines by
one ulp, and quantized data (integer cents, token counts) sits exactly
ON those boundaries, so every tied row can flip buckets
(observed live: DuckDB 122.19999999999999 vs Spark 122.2 at 10M events).

The safe form is the type-1 discrete order statistic: the smallest value
whose cumulative count reaches ``ceil(q·n)``. Computed here with integer
prefix sums over the DISTINCT-value census, so:

- no doubles anywhere — cross-engine equality is by construction;
- the window runs over distinct values (domain-bounded: cent values,
  token lengths), never the row count — safe at any corpus size;
- boundaries come back as one broadcastable 1-row frame.

Used by ``user_ltv_deciles`` and ``doc_length_percentile_bands``; any
future quantile-BUCKETING plan must use this, not ``percentile``
(output-only quantile VALUES may stay interpolated — they round, they
don't classify).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def discrete_quantile_bounds(
    df: DataFrame, value_col: str, fractions: list
) -> DataFrame:
    """1-row frame of ``q1..qk``: type-1 order statistics of ``value_col``.

    ``fractions`` are exact rationals (``fractions.Fraction``,
    ``(num, den)`` tuples, ints, or floats whose binary value IS an
    exact small rational, e.g. 0.25/0.5 — a float like 0.1 whose exact
    binary value is not the intended rational raises, pass
    ``Fraction(1, 10)`` instead); the rank test ``cw·den ≥ num·n`` is
    pure integer.
    """

    def _to_fraction(f):
        if isinstance(f, Fraction):
            return f
        if isinstance(f, tuple):
            return Fraction(*f)
        if isinstance(f, int):
            return Fraction(f)
        fr = Fraction(f)  # exact binary value of the float
        if fr.limit_denominator(1000) != fr:
            # Conservative fail-loud guard: rejects floats whose binary
            # value differs from the intended decimal (0.1, 0.2, ...)
            # AND exact dyadic rationals with denominator > 1000 (e.g.
            # 1/1024) — for the latter the value is exact but we can't
            # distinguish it from an inexact decimal, so demand the
            # explicit form.
            raise ValueError(
                f"float {f!r}: denominator too large or value inexact "
                "in binary — pass a fractions.Fraction or (num, den) "
                "tuple to state the intended fraction exactly"
            )
        return fr

    fracs = [_to_fraction(f) for f in fractions]
    vc = df.groupBy(F.col(value_col).alias("v")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = vc.select(
        "v",
        F.sum("c").over(w_cum).cast("bigint").alias("cw"),
        F.sum("c").over(w_all).cast("bigint").alias("n"),
    )
    return cum.agg(
        *[
            F.min(
                F.when(
                    F.col("cw") * int(f.denominator)
                    >= int(f.numerator) * F.col("n"),
                    F.col("v"),
                )
            ).alias(f"q{i + 1}")
            for i, f in enumerate(fracs)
        ]
    )
