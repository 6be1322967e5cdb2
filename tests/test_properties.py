"""Property-based tests (hypothesis): custom operator kernels vs
independent reference implementations on randomized inputs — the corpus
tests can't cover the weird shapes (empty strings, repeated tokens,
unsorted timestamps, ties)."""

import string

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from flink_emqx_connector_spark.operators import dedup as D
from flink_emqx_connector_spark.operators.asof import asof_join

_WORD = st.text(alphabet=string.ascii_lowercase, min_size=0, max_size=4)
_TEXT = st.lists(_WORD, min_size=0, max_size=12).map(lambda ws: " ".join(ws))


def _ref_ngrams(text: str, n: int) -> list[str]:
    """Independent python reference for word_ngrams: distinct n-grams in
    first-appearance order."""
    w = text.split(" ")
    grams = [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
    seen, out = set(), []
    for g in grams:
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(texts=st.lists(_TEXT, min_size=1, max_size=30), n=st.integers(1, 3))
def test_word_ngrams_matches_reference(spark, texts, n):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r.doc_id: list(r.sh)
        for r in df.select("doc_id", D.word_ngrams(F.col("text"), n).alias("sh")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _ref_ngrams(t, n), (t, n, got[i])


def _mqtt_ref_match(filt: str, topic: str) -> bool:
    """Independent MQTT 3.1.1/5 matching reference: level-by-level walk
    (no regex), '+' one level, '#' final-only suffix incl. parent,
    leading-wildcard filters never match '$'-topics."""
    f, t = filt.split("/"), topic.split("/")
    if f[0] in ("+", "#") and t[0].startswith("$"):
        return False
    for i in range(len(f)):
        if f[i] == "#":
            return True
        if i >= len(t):
            return False
        if f[i] == "+":
            continue
        if f[i] != t[i]:
            return False
    return len(t) == len(f)


_LEVEL = st.sampled_from(["a", "b", "ab", "", "$sys", "x1"])
_TOPIC = st.lists(_LEVEL, min_size=1, max_size=4).map("/".join)
_FLEVEL = st.sampled_from(["a", "b", "ab", "", "+", "x1"])


@st.composite
def _filter(draw):
    parts = draw(st.lists(_FLEVEL, min_size=1, max_size=4))
    if draw(st.booleans()):
        parts.append("#")
    return "/".join(parts)


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    cases=st.lists(st.tuples(_filter(), _TOPIC), min_size=1, max_size=25)
)
def test_topic_matching_vs_independent_reference(spark, cases):
    """Both the python matcher and the compiled rlike Column must agree
    with a regex-free level-walk reference on randomized filters/topics."""
    from flink_emqx_connector_spark.functions.topics import (
        topic_matches_col,
        topic_matches_py,
    )

    rows = [(i, f, t) for i, (f, t) in enumerate(cases)]
    df = spark.createDataFrame(rows, ["i", "filt", "topic"])
    for filt in {f for f, _ in cases}:
        spark_hits = {
            r.i
            for r in df.filter(F.col("filt") == filt)
            .filter(topic_matches_col(F.col("topic"), filt))
            .collect()
        }
        for i, (f, t) in enumerate(cases):
            if f != filt:
                continue
            want = _mqtt_ref_match(f, t)
            assert topic_matches_py(f, t) == want, (f, t)
            assert (i in spark_hits) == want, (f, t)


@settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-50, 50)),
        min_size=1,
        max_size=40,
    )
)
def test_salted_agg_matches_plain(spark, rows):
    """Two-phase salted aggregation is result-identical to the plain
    groupBy for algebraic aggregates, on arbitrary (skewed or not) data."""
    from flink_emqx_connector_spark.operators.skew import salted_agg

    df = spark.createDataFrame(rows, ["k", "v"])
    salted = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in salted_agg(
            df,
            key_cols=["k"],
            aggs={"n": "count:*", "s": "sum:v", "mn": "min:v", "mx": "max:v"},
            buckets=4,
        ).collect()
    }
    want = {}
    for k, v in rows:
        n, s, mn, mx = want.get(k, (0, 0, None, None))
        want[k] = (
            n + 1,
            s + v,
            v if mn is None else min(mn, v),
            v if mx is None else max(mx, v),
        )
    assert salted == want


@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),
        min_size=1,
        max_size=25,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(0, 999)),
        min_size=1,
        max_size=25,
    ),
)
def test_asof_join_matches_pandas(spark, left, right):
    """asof_join (join + window dedup) vs pandas merge_asof per key.
    Right-side time ties are broken by the tie_break column, mirrored in
    the reference by sorting and keeping the last."""
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], ["lid", "key", "lt"]
    )
    rdf = spark.createDataFrame(
        [(k, t, v) for k, t, v in right], ["rkey", "rt", "val"]
    )
    got = {
        r.lid: (r.rt, r.val)
        for r in asof_join(
            ldf, rdf, "key", "rkey", "lt", "rt", left_key="lid", tie_break="val"
        ).collect()
    }
    # reference: per left row, latest right (rt <= lt) on the same key;
    # ties on rt broken by the largest val (matching tie_break desc)
    for i, (k, lt) in enumerate(left):
        cands = [(rt, v) for (rk, rt, v) in right if rk == k and rt <= lt]
        want = max(cands, key=lambda x: (x[0], x[1])) if cands else None
        assert got.get(i) == want, (i, k, lt, got.get(i), want)


def test_avro_codec_roundtrip_properties():
    """Pure-Python Avro binary codec: roundtrip fidelity over edge values
    (negative/large longs exercise zigzag, empty strings, None unions),
    and malformed buffers decode to None, never raise."""
    from hypothesis import given, settings, strategies as st

    from flink_emqx_connector_spark.functions.avro_codec import (
        decode_record,
        encode_record,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
            {"name": "c", "type": ["null", "double"]},
            {"name": "d", "type": "boolean"},
            {"name": "e", "type": ["null", "bytes"]},
        ],
    }

    @settings(max_examples=200, deadline=None)
    @given(
        a=st.integers(min_value=-(2**63), max_value=2**63 - 1),
        b=st.one_of(st.none(), st.text(max_size=50)),
        c=st.one_of(
            st.none(), st.floats(allow_nan=False, allow_infinity=False)
        ),
        d=st.booleans(),
        e=st.one_of(st.none(), st.binary(max_size=50)),
        junk=st.binary(max_size=30),
    )
    def check(a, b, c, d, e, junk):
        rec = {"a": a, "b": b, "c": c, "d": d, "e": e}
        buf = encode_record(schema, rec)
        assert decode_record(schema, buf) == rec
        # appended garbage → malformed → None (not an exception)
        assert decode_record(schema, buf + b"\x01garbage") is None
        assert decode_record(schema, junk) in (None, {})  # never raises
        # truncation → None
        if len(buf) > 1:
            assert decode_record(schema, buf[:-1]) is None

    check()


@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=40,
    )
)
def test_pareto_frontier_matches_bruteforce(spark, pts):
    """The cumulative-max window algebra IS the dominance relation:
    random integer point sets, ties and duplicates included."""
    from flink_emqx_connector_spark.plans.ml_linalg import pareto_frontier

    distinct = sorted(set(pts))
    df = spark.createDataFrame(distinct, ["price", "size"])
    got = {(r.price, r.size) for r in pareto_frontier(df).collect()}

    def dominated(a):
        return any(
            b[0] <= a[0] and b[1] >= a[1] and b != a for b in distinct
        )

    brute = {p for p in distinct if not dominated(p)}
    assert got == brute, (distinct, got, brute)
