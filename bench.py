#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "headline_queries_total", "value": <sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": <sec>, ...}, "sf": <sf>}

Each query executes end-to-end into the `noop` sink (full plan execution,
no driver-side collect cost). HEADLINE lists the curated per-family set
first (stable ordering for cross-round comparison); every other registered
query is appended after it, so the bench covers the ENTIRE registry.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

HEADLINE = [
    "wordcount",
    "decode_json",
    "rolling_sum",
    "tumbling_window",
    "sessionization",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_local_supplier_volume",
    "q14_promo_share",
    "q18_large_orders",
    "grouping_sets_orders",
    "regression_per_segment",
    "zscore_per_priority",
    "sliding_window_events",
    "json_functions_events",
    "star_join_supplier_region",
    "window_topk_orders_per_customer",
    "asof_join_purchase_view",
    "set_intersect_users",
    "rollup_lineitem",
    "distinct_counts",
    "topk_global_lineitems",
    "text_quality_scores",
    "lang_id_confusion",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk_cosine",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "multimodal_features",
    "q6_forecast_revenue",
    "q8_market_share",
    "q13_customer_order_distribution",
    "q21_last_shipper_census",
    "line_dedup_docs",
    "cross_source_duplication",
]
N_CURATED = len(HEADLINE)  # stdout line reports this stable prefix only

# The first 33 names above are the round-1-3 curated set, frozen: their
# subtotal (`stable33_total`) is the apples-to-apples perf series across
# rounds — the full-registry `value` grows every time coverage widens.
N_STABLE = 33


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0

    from flink_emqx_connector_spark.plans import QUERIES
    from flink_emqx_connector_spark.session import get_spark

    # Tail ordering A/B (VERDICT r7 item 8): the driver's 100-entry
    # codegen cache evicts under 167 wide plans. "family" appends the
    # tail in REGISTRY order (module import order — operator families
    # adjacent, so shared subplan shapes hit the generated-class cache
    # while still resident) instead of alphabetical (families
    # interleaved). Measured A/B in NOTES.md round-8.
    order = os.environ.get("SPARK_GRAFT_BENCH_ORDER", "family")
    tail = QUERIES if order == "family" else sorted(QUERIES)
    HEADLINE.extend(name for name in tail if name not in HEADLINE)

    spark = get_spark("bench", cpus=cpus)

    # Warm the JVM and the Python-worker/Arrow pool once so per-query
    # numbers measure the plan, not process spin-up.
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(cpus).repartition(cpus).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).collect()

    # Each query runs twice: the first execution pays one-time whole-stage-
    # codegen compilation (1-3 s on the widest plans — a fixed cost that
    # amortizes to zero at real data scale), the second is the measured
    # steady-state run. Both timers cover plan CONSTRUCTION as well as
    # execution: for iterative queries (connected components) the driver
    # loop inside q.spark() IS the computation, so timing only the final
    # .write would understate them ~450x.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        q = QUERIES[name]
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)

    # stable33 is THE cross-round comparator, but a single pass carries
    # ±15-30% host noise (BASELINE.md rounds 4-6). Run the stable prefix
    # THREE times back-to-back after the registry completes and take the
    # median — all three passes now share one cache/codegen regime
    # (ADVICE r7: the old form mixed the interleaved in-registry pass,
    # measured under codegen-cache pressure, with two post-registry
    # passes — the median usually picked a clean pass, making the series
    # incomparable across rounds). The interleaved total is still
    # reported separately as stable33_interleaved for continuity.
    stable = HEADLINE[:N_STABLE]
    stable_interleaved = round(sum(timings[k] for k in stable), 3)
    stable_passes = []
    for _ in range(3):
        t_pass = 0.0
        for name in stable:
            t0 = time.perf_counter()
            QUERIES[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            t_pass += time.perf_counter() - t0
        stable_passes.append(round(t_pass, 3))
    stable_median = sorted(stable_passes)[1]
    # Full per-query detail goes to a side file; the stdout line must stay
    # short (the driver captures only a bounded tail of stdout — an
    # oversized line gets decapitated and parses as nothing).
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cold_total": round(sum(cold.values()), 3),
        "cold_queries": cold,
        "stable33_runs": stable_passes,
        "stable33_interleaved": stable_interleaved,
        "sf": sf,
        "cpus": cpus,
    }
    with open(os.path.join(REPO, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    curated = HEADLINE[:N_CURATED]
    summary = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "stable33_total": stable_median,  # median of 3 same-regime passes
        "stable33_runs": stable_passes,
        "stable33_interleaved": stable_interleaved,
        "queries": {k: timings[k] for k in curated if k in timings},
        "n_queries": len(timings),
        "sf": sf,
        "cpus": cpus,
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(summary, separators=(",", ":"))
    while len(line) > 1800 and summary["queries"]:
        summary["queries"].popitem()
        line = json.dumps(summary, separators=(",", ":"))
    print(line, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
