"""Round trip: batch publish via the MQTT sink → consume via the EMQX
source — the loop the reference never closed (it has no production sink,
SURVEY.md §2.1 S10-S11)."""

import uuid

from pyspark.sql import functions as F

from flink_emqx_connector_spark.sinks import publish_dataframe
from flink_emqx_connector_spark.sources import register_emqx_source


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
