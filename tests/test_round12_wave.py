"""Round-12 semantic invariants.

Waterfill exactness (round-11 ADVICE): the old two-unrolled-rounds
allocator under-allocated whenever a cell exhausted DURING round 2
(leftover l2 > |open| → the ±1 rank round couldn't place l2 slots).
The rewritten closed form (sorted-prefix water level) must satisfy
sum(quota) == budget on EVERY cap distribution, including the
adversarial one that broke the old formula.

Quantile fraction guard (round-11 ADVICE): floats whose exact binary
value is not the intended rational must raise, not silently
approximate.
"""

from fractions import Fraction

import duckdb
import pytest

from flink_emqx_connector_spark.plans import QUERIES
from tests.conftest import SF_SMALL


def _run_waterfill_oracle(cells: list[tuple[str, str, int]]):
    """Run the registered oracle SQL over a synthetic documents table
    with the given (source, lang, n_docs) cells."""
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (source VARCHAR, lang VARCHAR)")
    for source, lang, n in cells:
        con.execute(
            "INSERT INTO documents "
            f"SELECT '{source}', '{lang}' FROM range({n})"
        )
    sql = QUERIES["mix_waterfill_allocation"].oracle
    return con.execute(sql).fetchall(), con


def _check_invariants(rows, cells):
    total = sum(n for _, _, n in cells)
    budget = total // 2
    cols = [
        "source", "lang", "n_docs", "water_level", "base_alloc",
        "quota", "cap_state",
    ]
    recs = [dict(zip(cols, r)) for r in rows]
    assert len(recs) == len(cells)
    # THE invariant the old formula violated: the budget is fully spent
    assert sum(r["quota"] for r in recs) == budget, (
        f"sum(quota)={sum(r['quota'] for r in recs)} != budget={budget}"
    )
    for r in recs:
        assert 0 <= r["quota"] <= r["n_docs"], r  # caps respected
        if r["cap_state"] == "open":
            # open cells sit at the water level (±1 from the rank round)
            assert r["base_alloc"] == r["water_level"], r
            assert r["quota"] - r["base_alloc"] in (0, 1), r
        else:
            assert r["base_alloc"] == r["n_docs"], r
    return recs


def test_waterfill_adversarial_round2_exhaustion():
    """20×5-doc cells + a 50-cap + a 1000-cap cell, budget 575: the old
    formula allocated 388 (the 50-cap cell exhausted in round 2, l2=188
    with one open cell → 187 slots silently dropped). The closed form
    must land exactly on 575 with water level 425."""
    cells = [("s", f"l{i:02d}", 5) for i in range(20)]
    cells += [("s", "mid", 50), ("s", "big", 1000)]
    rows, con = _run_waterfill_oracle(cells)
    recs = _check_invariants(rows, cells)
    by = {r["lang"]: r for r in recs}
    assert by["big"]["water_level"] == 425
    assert by["big"]["quota"] == 425
    assert by["mid"]["cap_state"] == "exhausted"
    assert by["mid"]["quota"] == 50
    con.close()


@pytest.mark.parametrize(
    "caps",
    [
        [1],  # single cell
        [1, 1],  # budget 1, leftover rank round
        [7, 7, 7],  # uniform, no exhaustion
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 10],  # staircase
        [1000, 1, 1, 1],  # one dominant cell
        [5] * 50,  # many equal cells, leftover spread
        [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37],  # primes
    ],
)
def test_waterfill_budget_exact_on_varied_caps(caps):
    cells = [("s", f"l{i:03d}", n) for i, n in enumerate(caps)]
    rows, con = _run_waterfill_oracle(cells)
    _check_invariants(rows, cells)
    con.close()


def test_waterfill_spark_budget_exact(spark):
    """Spark leg on the real sf0.001 corpus: quotas sum to exactly
    half the corpus (gate already proves Spark ≡ oracle; this pins the
    budget invariant independently of the oracle)."""
    rows = QUERIES["mix_waterfill_allocation"].spark(spark, SF_SMALL).collect()
    total = sum(r["n_docs"] for r in rows)
    assert sum(r["quota"] for r in rows) == total // 2
    for r in rows:
        assert 0 <= r["quota"] <= r["n_docs"]


def test_discrete_quantile_fraction_guard():
    """Exact small rationals pass (Fraction, tuple, int, dyadic float);
    a float like 0.1 whose binary value is NOT the intended rational
    raises instead of silently approximating."""
    from flink_emqx_connector_spark.operators.quantiles import (
        discrete_quantile_bounds,
    )

    # the conversion guard fires before any Spark work: a None df is
    # fine for the raising paths
    with pytest.raises(ValueError, match="not an exact small rational"):
        discrete_quantile_bounds(None, "v", [0.1])
    with pytest.raises(ValueError, match="not an exact small rational"):
        discrete_quantile_bounds(None, "v", [Fraction(1, 4), 0.3])


def test_discrete_quantile_accepts_exact_forms(spark):
    from flink_emqx_connector_spark.operators.quantiles import (
        discrete_quantile_bounds,
    )

    df = spark.range(1, 101).withColumnRenamed("id", "v")
    row = discrete_quantile_bounds(
        df, "v", [Fraction(1, 10), (1, 4), 0.5, 0.25]
    ).collect()[0]
    # type-1 order statistics over 1..100
    assert (row["q1"], row["q2"], row["q3"], row["q4"]) == (10, 25, 50, 25)
