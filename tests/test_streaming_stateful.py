"""Stateful streaming: explicit keyed state (applyInPandasWithState) and
event-time windows with watermarks, driven end-to-end over the spool
source."""

import time
import uuid

from pyspark.sql import functions as F

from flink_emqx_connector_spark.sources import register_emqx_source
from flink_emqx_connector_spark.sources.transport import SpoolPublisher


def _wait(predicate, timeout=30.0, step=0.2):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(step)
    return False


def _source(spark, spool, partitions=2):
    register_emqx_source(spark)
    return (
        spark.readStream.format("emqx")
        .option("transport", "spool")
        .option("spool_dir", spool)
        .option("partitions", str(partitions))
        .load()
    )


def test_rolling_sum_with_state(spark, tmp_path):
    """Keyed-state rolling sum accumulates across micro-batches (Flink
    keyBy().sum() parity at the state level, WordCount.java:32)."""
    from flink_emqx_connector_spark.streaming.stateful import rolling_sum_with_state

    spool = str(tmp_path / "spool")
    pub = SpoolPublisher(spool)
    for p in [b"a", b"b", b"a"]:
        pub.publish("t/1", p)

    msgs = _source(spark, spool)
    keyed = msgs.select(
        F.decode("payload", "UTF-8").alias("word"), F.lit(1).alias("n")
    )
    counts = rolling_sum_with_state(keyed)
    name = f"st_{uuid.uuid4().hex[:8]}"
    q = (
        counts.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        # batch 1: a→2, b→1
        assert _wait(
            lambda: {
                (r.word, r.total)
                for r in spark.sql(f"SELECT * FROM {name}").collect()
            }
            >= {("a", 2), ("b", 1)}
        ), spark.sql(f"SELECT * FROM {name}").collect()
        # publish more 'a' → state carries: a→4 appears in a later batch
        pub.publish("t/1", b"a")
        pub.publish("t/1", b"a")
        assert _wait(
            lambda: ("a", 4)
            in {
                (r.word, r.total)
                for r in spark.sql(f"SELECT * FROM {name}").collect()
            }
        ), spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()


def test_event_time_window_with_watermark(spark, tmp_path):
    """Event-time tumbling window + watermark over the envelope timestamp
    (the streaming form of the tumbling_window batch query)."""
    spool = str(tmp_path / "spool")
    pub = SpoolPublisher(spool)
    for p in [b"x", b"y", b"x"]:
        pub.publish("t/1", p)

    msgs = _source(spark, spool)
    agg = (
        msgs.withWatermark("timestamp", "10 seconds")
        .groupBy(
            F.window("timestamp", "5 seconds").alias("win"),
            F.decode("payload", "UTF-8").alias("word"),
        )
        .agg(F.count("*").alias("cnt"))
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        assert _wait(
            lambda: spark.sql(f"SELECT sum(cnt) s FROM {name}").head()["s"] == 3
        ), spark.sql(f"SELECT * FROM {name}").collect()
        rows = spark.sql(f"SELECT word, sum(cnt) c FROM {name} GROUP BY word").collect()
        assert {(r.word, r.c) for r in rows} == {("x", 2), ("y", 1)}
    finally:
        q.stop()
