"""Fixture-level properties of the round-8 warehouse wave (X92-X95) —
semantic behaviors the oracle gate's aggregate hash can't localize."""

import datetime

from pyspark.sql import functions as F

from flink_emqx_connector_spark.plans.registry import QUERIES


def _run(name, spark, sf_dir):
    return QUERIES[name].spark(spark, sf_dir)


def test_scd2_intervals_tile_each_user(spark, sf_dir):
    """SCD2 contract: per user, intervals are contiguous half-open tiles —
    each valid_to equals the next state's valid_from, exactly one
    is_current row per user, state_no dense from 1, and the n_events sum
    reproduces the user's raw event count."""
    out = _run("scd2_user_state_history", spark, sf_dir)
    rows = out.collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    from flink_emqx_connector_spark.session import load_table

    raw = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for uid, states in by_user.items():
        states.sort(key=lambda r: r.state_no)
        assert [s.state_no for s in states] == list(range(1, len(states) + 1))
        assert sum(s.is_current for s in states) == 1
        assert states[-1].is_current == 1 and states[-1].valid_to is None
        for prev, nxt in zip(states, states[1:]):
            assert prev.valid_to == nxt.valid_from  # contiguous tiling
            assert prev.event_type != nxt.event_type  # real change points
        assert sum(s.n_events for s in states) == raw[uid]


def test_scd2_change_point_semantics(spark):
    """A hand-built stream: A A B A collapses to 3 intervals with the
    tie-on-ts order broken by event_id (ingest order)."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "A", 0.0, None),
        (2, t0 + datetime.timedelta(seconds=10), 7, "A", 0.0, None),
        (3, t0 + datetime.timedelta(seconds=20), 7, "B", 0.0, None),
        (4, t0 + datetime.timedelta(seconds=30), 7, "A", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    import flink_emqx_connector_spark.plans.warehouse_extra as WX

    orig = WX._events
    WX._events = lambda s, d: df
    try:
        out = sorted(
            _run("scd2_user_state_history", spark, "unused").collect(),
            key=lambda r: r.state_no,
        )
    finally:
        WX._events = orig
    assert [(r.event_type, r.n_events, r.is_current) for r in out] == [
        ("A", 2, 0), ("B", 1, 0), ("A", 1, 1)
    ]
    assert out[0].valid_to == out[1].valid_from == rows[2][1]


def test_common_substring_finds_planted_overlap(spark):
    """Two docs sharing one 16-token span (different elsewhere) pair up;
    a span replicated into >_SPAN_DF_CAP docs is boilerplate and must
    NOT generate pairs; docs shorter than 16 tokens are silently safe."""
    import flink_emqx_connector_spark.plans.warehouse_extra as WX

    span = " ".join(f"s{i}" for i in range(16))
    boiler = " ".join(f"b{i}" for i in range(16))
    rows = [(0, "pre0 " + span + " tail0"), (1, "pre1x " + span + " taily1")]
    rows += [(2, "short doc")]
    rows += [
        (10 + i, f"u{i} " + boiler + f" v{i}")
        for i in range(WX._SPAN_DF_CAP + 1)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig = WX._docs
    WX._docs = lambda s, d: df
    try:
        pairs = _run("dedup_common_substring", spark, "unused").collect()
    finally:
        WX._docs = orig
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(0, 1)}
    # the planted overlap is exactly one 16-token window
    assert pairs[0].n_shared_spans == 1


def test_rollup_reaggregate_matches_direct_aggregation(spark, sf_dir):
    """The compose proof, locally: re-aggregating the hourly rollup to
    day grain equals aggregating raw events straight to day grain."""
    from flink_emqx_connector_spark.session import load_table

    out = {
        (r.event_type, r.day): r
        for r in _run("events_rollup_reaggregate", spark, sf_dir).collect()
    }
    milli = F.floor(F.col("value") * 1000 + 0.5).cast("bigint")
    direct = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(milli).alias("m"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    )
    assert len(direct) == len(out)
    for r in direct:
        o = out[(r.event_type, r.day)]
        assert o.n_events == r.n
        assert abs(o.sum_value - r.m / 1000.0) < 1e-9
        assert o.min_value == r.lo and o.max_value == r.hi


def test_boilerplate_bigrams_rank_and_ratio(spark, sf_dir):
    """Top-5 per source, rank dense from 1, df monotone within source,
    ratio == df/n_docs, and every reported bigram's df is source-maximal
    (no bigram outside the top-5 beats the rank-5 df)."""
    out = _run("boilerplate_bigrams_by_source", spark, sf_dir).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        assert all(a.df >= b.df for a, b in zip(rs, rs[1:]))
        for r in rs:
            assert abs(r.ratio - round(r.df / r.n_docs, 4)) < 1e-9
