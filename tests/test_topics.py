"""MQTT topic-filter matching semantics (reference relies on the broker for
this — EMQXSourceReader.java:103-112; we must match its behavior client-side)."""

import pytest

from flink_emqx_connector_spark.functions.topics import (
    filter_to_regex,
    strip_share,
    topic_matches_py,
)


@pytest.mark.parametrize(
    "flt,topic,expected",
    [
        ("t/#", "t/1", True),
        ("t/#", "t", True),  # '#' matches the parent level itself
        ("t/#", "t/1/2/3", True),
        ("t/#", "x/1", False),
        ("t/+", "t/1", True),
        ("t/+", "t/1/2", False),  # '+' is exactly one level
        ("t/+/3", "t/a/3", True),
        ("t/+/3", "t/a/b/3", False),
        ("+/+", "a/b", True),
        ("+", "a", True),
        ("+", "a/b", False),
        ("#", "a/b/c", True),
        ("#", "$SYS/broker", False),  # '#' must not match $-topics
        ("+/monitor", "$SYS/monitor", False),
        ("$SYS/#", "$SYS/broker", True),  # explicit $ prefix matches
        ("sport/tennis/player1/#", "sport/tennis/player1", True),
        ("sport/tennis/player1/#", "sport/tennis/player1/ranking", True),
        ("t/1", "t/1", True),
        ("t/1", "t/10", False),
    ],
)
def test_topic_matches(flt, topic, expected):
    assert topic_matches_py(flt, topic) is expected


def test_hash_must_be_final_level():
    with pytest.raises(ValueError):
        filter_to_regex("t/#/x")


def test_strip_share():
    assert strip_share("$share/g1/t/#") == ("g1", "t/#")
    assert strip_share("t/#") == (None, "t/#")


def test_rlike_column_matches_python(spark):
    """JVM-side rlike predicate agrees with the Python matcher."""
    topics = ["t/1", "t/1/2", "x/9", "t/a/3", "$SYS/x", "t"]
    df = spark.createDataFrame([(t,) for t in topics], ["topic"])
    for flt in ["t/#", "t/+", "#", "t/+/3"]:
        from flink_emqx_connector_spark.functions.topics import topic_matches_col

        got = {
            r.topic
            for r in df.filter(topic_matches_col("topic", flt)).collect()
        }
        want = {t for t in topics if topic_matches_py(flt, t)}
        assert got == want, (flt, got, want)
