"""Skew-mitigation correctness (salted results ≡ plain results) and
approximate-aggregate accuracy bounds."""

from pyspark.sql import functions as F

from flink_emqx_connector_spark.operators.skew import salted_agg, salted_broadcast_join


def _events(spark, sf_dir):
    from flink_emqx_connector_spark.session import load_table

    return load_table(spark, sf_dir, "events")


def test_salted_agg_equals_plain(spark, sf_dir):
    ev = _events(spark, sf_dir)
    plain = {
        (r.event_type,): (r.n, round(r.total, 2), r.lo, r.hi)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    salted = {
        (r.event_type,): (r.n, round(r.total, 2), r.lo, r.hi)
        for r in salted_agg(
            ev,
            ["event_type"],
            {"n": "count:*", "total": "sum:value", "lo": "min:value", "hi": "max:value"},
            buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_broadcast_join_equals_plain(spark, sf_dir):
    from flink_emqx_connector_spark.session import load_table

    ev = _events(spark, sf_dir)
    # tiny dim: event_type → weight
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("purchase", 3), ("signup", 4), ("error", 5)],
        ["event_type", "weight"],
    )
    plain = (
        ev.join(F.broadcast(dim), "event_type")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("weight").alias("w"))
    )
    salted = (
        salted_broadcast_join(ev, dim, "event_type", buckets=4)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("weight").alias("w"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_approx_distinct_within_rated_error(spark, sf_dir):
    from flink_emqx_connector_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.countDistinct("l_partkey").alias("d")).head()["d"]
    approx = li.select(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("d")
    ).head()["d"]
    assert abs(approx - exact) <= max(3, 0.06 * exact), (approx, exact)


def test_approx_percentile_within_bound(spark, sf_dir):
    from flink_emqx_connector_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").alias("p")
    ).head()["p"]
    approx = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p")
    ).head()["p"]
    assert abs(approx - exact) / exact < 0.01, (approx, exact)


def test_bounded_oracle_gate_passes_and_detects_drift(spark, sf_dir):
    """The plans.check bounded-oracle mode: approx_aggregates passes its
    rated-error contract, and the SAME machinery fails when a bound is
    tightened past what the sketch can deliver (the gate discriminates,
    it doesn't rubber-stamp)."""
    import dataclasses

    from flink_emqx_connector_spark.plans.check import compare_query
    from flink_emqx_connector_spark.plans.registry import QUERIES

    res = compare_query(spark, sf_dir, "approx_aggregates")
    assert res["mode"] == "bounded-oracle" and res["ok"], res

    q = QUERIES["approx_aggregates"]
    impossible = dict(q.bounded)
    impossible["bounds"] = {
        # exact-match demand on a sketch output: must trip unless the HLL
        # happens to be exact on every group — pair with a zero-tolerance
        # percentile bound so at least one violation is guaranteed
        "approx_parts": ("exact", 0),
        "p50_approx": ("rel", 0.0),
        "p95_approx": ("rel", 0.0),
    }
    strict = dataclasses.replace(q, bounded=impossible)
    QUERIES["approx_aggregates"] = strict
    try:
        res2 = compare_query(spark, sf_dir, "approx_aggregates")
    finally:
        QUERIES["approx_aggregates"] = q
    assert res2["ok"] is False and res2["why"] == "error contract violated", res2
