"""Reference-parity queries over the ``events`` batch stand-in
(FIXTURES.md §3): the decode layer + the WordCount pipeline, expressed the
way they'd run over the live MQTT envelope stream.

Reference anchors: WordCount pipeline ``WordCount.java:28-32``; decode layer
``EMQXSourceReader.java:71-82``; topic filtering is broker-side in the
reference (``EMQXSourceReader.java:103-112``) and a pushed-down predicate
here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.topics import filter_to_regex
from ..operators.wordcount import word_count
from ..schema import events_as_envelope
from .registry import register


def _events(spark, sf_dir):
    from ..session import load_table

    return load_table(spark, sf_dir, "events")


@register(
    "wordcount",
    oracle="""
    SELECT event_type AS word, count(*) AS cnt
    FROM events
    GROUP BY event_type
    """,
    doc="T1-T3 parity: flatMap→keyBy→sum over decoded payloads "
    "(WordCount.java:28-32). Map-side partial agg + single shuffle on the key.",
    tags=("parity", "streaming-equivalent"),
)
def q_wordcount(spark, sf_dir):
    env = events_as_envelope(_events(spark, sf_dir))
    return word_count(env)


@register(
    "decode_json",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS bucket,
           count(*) AS cnt,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY 1
    """,
    doc="S8/S9 decode layer: byte payload → JSON struct via from_json; "
    "malformed → NULL (kept, not dropped — improves on "
    "EMQXSourceReader.java:80-82).",
    tags=("parity", "decode"),
)
def q_decode_json(spark, sf_dir):
    env = events_as_envelope(_events(spark, sf_dir))
    k = F.get_json_object(F.col("properties")["props"], "$.k").cast("bigint")
    return (
        env.select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("bucket"))
        .agg(F.count("*").alias("cnt"), F.sum("k").alias("sum_k"))
    )


_TOPIC_FILTER = "t/+/3"
_TOPIC_REGEX = filter_to_regex(_TOPIC_FILTER)  # ^t/[^/]*/3$


@register(
    "topic_filter",
    oracle=f"""
    SELECT event_type, count(*) AS cnt
    FROM (
      SELECT event_type,
             't/' || event_type || '/' || CAST(user_id % 5 AS VARCHAR) AS topic
      FROM events
    )
    WHERE regexp_matches(topic, '{_TOPIC_REGEX}')
    GROUP BY event_type
    """,
    doc="MQTT topic-filter semantics ('+'/'#') as a JVM-side rlike predicate; "
    "broker-side in the reference (EMQXSourceReader.java:103-112).",
    tags=("parity", "topics"),
)
def q_topic_filter(spark, sf_dir):
    ev = _events(spark, sf_dir)
    topic = F.concat(
        F.lit("t/"), F.col("event_type"), F.lit("/"), (F.col("user_id") % 5).cast("string")
    )
    return (
        ev.withColumn("topic", topic)
        .filter(F.col("topic").rlike(_TOPIC_REGEX))
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "rolling_sum",
    oracle="""
    SELECT user_id,
           round(sum(value), 2) AS total_value,
           count(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
    doc="T3 generalized: keyBy(user)→sum(value). Flink emits per-record "
    "running updates; the materialized per-key state is identical "
    "(SURVEY.md §2.2 T3).",
    tags=("parity", "agg"),
)
def q_rolling_sum(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.round(F.sum("value"), 2).alias("total_value"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour,
           event_type,
           count(*) AS cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 1e2 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling event-time window (absent from the reference — "
    "SURVEY.md §2.4); streaming form is groupBy(window(ts,'1 hour')) with "
    "a watermark.",
    tags=("window", "streaming-equivalent"),
)
def q_tumbling_window(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("cnt"),
            # exact cents: (hour, type) groups grow with event density —
            # the unbounded-group money-sum class (q1 conversion rationale)
            (
                F.expr("CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)")
                / 1e2
            ).alias("total_value"),
        )
    )


@register(
    "sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM flagged
    GROUP BY user_id
    """,
    doc="Sessionization (gap > 30 min) via lag + cumulative flag — the batch "
    "analogue of streaming session_window(ts, gap).",
    tags=("window", "sessionization"),
)
def q_sessionization(spark, sf_dir):
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ev = _events(spark, sf_dir)
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > 1800),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("bigint").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )
