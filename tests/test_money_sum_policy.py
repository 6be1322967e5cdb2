"""Policy guard for the draw-dependent FP-summation class (round-10
continuation finding): ``round(sum(<2-decimal money column>), 2)`` over
groups that grow with the data can flip its last digit on any corpus
draw (summation-order error vs the half-cent boundary — caught live by
the 365-day-span gate). Unbounded-group money sums must therefore use
the exact fixed-point template. This test scans EVERY registered oracle
and fails on a raw money sum unless the entry is in the documented
exemption list — so the class cannot silently reopen."""

import re

from flink_emqx_connector_spark.plans import QUERIES

#: columns whose values are 2-decimal money/floats where float summation
#: order matters; integer-valued columns (l_quantity) are exact in
#: doubles and exempt by nature
_MONEY = (
    "l_extendedprice",
    "o_totalprice",
    "p_retailprice",
    "s_acctbal",
    "c_acctbal",
    "value",
    "amount",
    "volume",
)

#: entries allowed to keep a float money sum, each with the reason class
_EXEMPT = {
    # bounded groups: per-order / per-customer / per-user sums hold tens
    # of rows — summation error (~n*ulp) cannot reach the 0.005 boundary
    "q3_top_revenue_orders": "bounded-group (<= ~7 lineitems/order)",
    "q10_returned_revenue_topk": "bounded-group (per-customer)",
    "rolling_sum": "bounded-group (~67 events/user, constant in sf)",
    "salted_user_activity": "bounded-group (per-user)",
    "resample_gapfill_events": "bounded-group (per user x interval)",
    # user_ltv_deciles was exempted here as bounded-group until round 11:
    # the seed-7 sf10 gate caught its per-DECILE avg of the rounded
    # per-user doubles drifting in the 4th decimal at 10M events — the
    # bounded-group argument covers the per-user sum, NOT an average
    # over ~15k such values. Converted to exact integer cents/micro.
    # ordered windows: both engines sum in the SAME pinned order, so
    # there is no summation-ORDER divergence to hit
    "window_running_total": "ordered-window (pinned summation order)",
    "range_frame_trailing_sum": "ordered-window (pinned summation order)",
    # statistical scores over tiny addends: result grain (>=1e-4) sits
    # orders of magnitude above the float error of the sum
    "source_token_kl": "statistical score (1e-6 grain >> error)",
    "time_decay_user_scores": "bounded-group + statistical",
    "try_functions_safety": "statistical ratio sum",
    "gini_by_priority": "statistical score (1e-4 grain)",
}


def test_no_unexempted_float_money_sums_in_oracles():
    offenders = {}
    for name, q in QUERIES.items():
        if not q.oracle:
            continue
        for m in re.finditer(r"round\(sum\(([^)]*)\)", q.oracle):
            arg = m.group(1)
            if "CAST(round(" in arg:
                continue  # already the exact fixed-point form
            if any(c in arg for c in _MONEY):
                if name not in _EXEMPT:
                    offenders.setdefault(name, []).append(arg.strip()[:60])
    assert not offenders, (
        "raw float money sums outside the exemption list (use the exact "
        f"fixed-point template or document the exemption): {offenders}"
    )


def test_exemption_list_has_no_stale_entries():
    """Every exempted name must still exist and still contain a float
    money sum — otherwise the whitelist rots."""
    for name in _EXEMPT:
        assert name in QUERIES, name
        o = QUERIES[name].oracle or ""
        assert re.search(r"round\(sum\(", o) or "sum(" in o, name
