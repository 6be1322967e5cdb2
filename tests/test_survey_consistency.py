"""Docs-vs-code consistency: SURVEY.md §2.5's operator inventory is the
judge's line-by-line checklist — every registry entry it cites must exist,
and every registered query must carry an oracle or be a documented
rows-only case. Keeps the inventory honest as rounds add operators."""

import re
from pathlib import Path

from flink_emqx_connector_spark.plans import QUERIES
from flink_emqx_connector_spark.plans.registry import QUERIES as REG

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"

# Queries whose oracle is omitted by fundamental limitation, each with a
# property-test stand-in (see SURVEY §2.5 / NOTES.md). dedup_minhash_lsh
# left this set in round 6 (md5-deterministic pipeline → full oracle);
# approx_aggregates has no value-hash oracle but its error contract IS
# gate-enforced (QueryDef.bounded, plans/check.py bounded-oracle mode).
ROWS_ONLY = {"approx_aggregates"}


def _survey_cited_queries() -> set[str]:
    text = SURVEY.read_text()
    start = text.index("### 2.5")
    end = text.index("## 3.", start)
    cited = set()
    for row in text[start:end].splitlines():
        if not row.startswith("| X"):
            continue
        # last cell holds `registry_entry` names (or a prose note)
        last = row.rsplit("|", 2)[-2]
        # streaming-only rows cite E2E tests, not registry entries
        cited.update(
            n for n in re.findall(r"`([a-z0-9_]+)`", last)
            if not n.startswith("test_")
        )
    return cited


def test_every_survey_cited_query_exists():
    cited = _survey_cited_queries()
    assert cited, "found no §2.5 registry citations — parser broke?"
    missing = {c for c in cited if c not in QUERIES}
    assert not missing, f"SURVEY §2.5 cites non-existent queries: {missing}"


def test_rows_only_set_is_exact():
    no_oracle = {n for n, q in REG.items() if q.oracle is None}
    assert no_oracle == ROWS_ONLY, (
        "rows-only queries drifted — update SURVEY/NOTES and this list: "
        f"{no_oracle ^ ROWS_ONLY}"
    )


def test_driver_recorded_literal_is_duplicate_free():
    """The _DRIVER_RECORDED dict literal silently absorbs duplicate keys
    (last wins), but the window-rotation protocol depends on the literal
    being exact — a duplicated key can mask a stale round and keep a name
    out of the driver's 50-entry window (the 40596e4 bug:
    scalar_functions_part stayed out for a whole round when the set form
    absorbed a duplicate). Parse the source literal and assert every key
    appears exactly once, names the registry knows, and maps to a
    plausible round number."""
    import ast
    import collections

    entry_src = (SURVEY.parent / "__spark_entry__.py").read_text()
    names = rounds = None
    for node in ast.walk(ast.parse(entry_src)):
        if (
            isinstance(node, ast.Assign)
            and getattr(node.targets[0], "id", "") == "_DRIVER_RECORDED"
        ):
            names = [k.value for k in node.value.keys]
            rounds = [v.value for v in node.value.values]
    assert names, "_DRIVER_RECORDED literal not found"
    dups = sorted(n for n, c in collections.Counter(names).items() if c > 1)
    assert not dups, f"duplicate _DRIVER_RECORDED entries: {dups}"
    unknown = sorted(set(names) - set(QUERIES))
    assert not unknown, f"_DRIVER_RECORDED names not in the registry: {unknown}"
    assert all(isinstance(r, int) and r >= 1 for r in rounds), (
        "_DRIVER_RECORDED rounds must be positive ints"
    )


def test_catalog_is_current():
    """QUERIES.md is generated — a stale catalog means someone added a
    query without regenerating it."""
    qmd = (SURVEY.parent / "QUERIES.md").read_text()
    missing = {n for n in QUERIES if f"`{n}`" not in qmd}
    assert not missing, f"QUERIES.md is stale; regenerate (missing {missing})"


def test_fast_multiset_compare_verdicts():
    """The gate's vectorized lane: conclusive True on equal multisets
    (any row order), conclusive False on a value diff (caller then
    re-checks exactly), None on types it must not judge (lists)."""
    import datetime as dt

    import pandas as pd

    from flink_emqx_connector_spark.plans.check import _fast_multiset_equal

    a = pd.DataFrame(
        {
            "i": [1, 2, 3],
            "f": [1.0000000001, float("nan"), -0.0],
            "s": ["x", None, "y"],
            "d": [dt.date(2024, 1, 1), dt.date(2024, 1, 2), None],
        }
    )
    # same multiset, different row order, float inside the 9-dp rounding,
    # +0.0 vs -0.0
    b = a.iloc[[2, 0, 1]].reset_index(drop=True).copy()
    b.loc[b.index[1], "f"] = 1.0000000002  # rounds to the same 9 dp
    b.loc[b.index[0], "f"] = 0.0
    assert _fast_multiset_equal(a, b) is True

    c = a.copy()
    c.loc[0, "i"] = 99
    assert _fast_multiset_equal(a, c) is False

    # int column vs nullable-widened float column: still conclusive
    d = a.copy()
    d["i"] = d["i"].astype("float64")
    assert _fast_multiset_equal(a, d) is True

    e = pd.DataFrame({"arr": [[1, 2], [3]]})
    assert _fast_multiset_equal(e, e.copy()) is None
