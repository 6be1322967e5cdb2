"""Round trip: batch publish via the MQTT sink → consume via the EMQX
source — the loop the reference never closed (it has no production sink,
SURVEY.md §2.1 S10-S11)."""

import uuid

from pyspark.sql import functions as F

from flink_emqx_connector_spark.sinks import publish_dataframe
from flink_emqx_connector_spark.sources import register_emqx_source


def test_streaming_pipe_through_mqtt_sink(spark, tmp_path):
    """Full streaming pipe: consume spool A → transform → foreachBatch
    publish to spool B → consume spool B. The streaming write path the
    reference never had."""
    import time

    from flink_emqx_connector_spark.sinks import foreach_batch_publisher
    from flink_emqx_connector_spark.sources.transport import SpoolPublisher

    spool_a = str(tmp_path / "a")
    spool_b = str(tmp_path / "b")
    pub = SpoolPublisher(spool_a)
    for i in range(6):
        pub.publish("in/t", str(i).encode(), qos=1)

    register_emqx_source(spark)
    upstream = (
        spark.readStream.format("emqx")
        .option("transport", "spool")
        .option("spool_dir", spool_a)
        .option("partitions", "2")
        .load()
        .select(
            F.concat(F.lit("doubled/"), F.col("payload").cast("string")).alias("topic"),
            F.encode(
                (F.col("payload").cast("string").cast("int") * 2).cast("string"),
                "UTF-8",
            ).alias("payload"),
        )
    )
    q = (
        upstream.writeStream.foreachBatch(
            foreach_batch_publisher(transport="spool", spool_dir=spool_b, qos=1)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_pipe"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)

    name = f"pipe_{uuid.uuid4().hex[:8]}"
    q2 = (
        spark.readStream.format("emqx")
        .option("transport", "spool")
        .option("spool_dir", spool_b)
        .option("partitions", "2")
        .load()
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(60)
    rows = spark.sql(f"SELECT topic, payload FROM {name}").collect()
    assert sorted((r.topic, bytes(r.payload)) for r in rows) == [
        (f"doubled/{i}", str(i * 2).encode()) for i in range(6)
    ]


def test_publish_then_consume(spark, tmp_path):
    spool = str(tmp_path / "spool")
    out = spark.range(5).select(
        F.concat(F.lit("out/"), F.col("id").cast("string")).alias("topic"),
        F.encode(F.col("id").cast("string"), "UTF-8").alias("payload"),
    )
    publish_dataframe(out, transport="spool", spool_dir=spool, qos=1)

    register_emqx_source(spark)
    name = f"rt_{uuid.uuid4().hex[:8]}"
    df = (
        spark.readStream.format("emqx")
        .option("transport", "spool")
        .option("spool_dir", spool)
        .option("partitions", "2")
        .load()
    )
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql(f"SELECT topic, payload FROM {name}").collect()
    assert sorted((r.topic, bytes(r.payload)) for r in rows) == [
        (f"out/{i}", str(i).encode()) for i in range(5)
    ]
