"""Streaming WordCount over the EMQX source — the reference's example job
(``WordCount.java:16-34``) end-to-end on Structured Streaming.

Pipeline parity (SURVEY.md §3.1):
``fromSource(emqx)`` → ``readStream.format("emqx")``;
``flatMap(Keyer).keyBy(f0).sum(1)`` → decode → explode/split → groupBy →
count in ``update`` output mode (per-micro-batch updated rows — the Spark
analogue of Flink's per-record rolling emission, equivalence argued in
FIXTURES.md §2); ``print()`` → console/memory sink.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.wordcount import word_count
from ..sources import register_emqx_source


def start_wordcount_stream(
    spark: SparkSession,
    source_options: dict[str, str],
    query_name: str = "wordcount",
    checkpoint_dir: str | None = None,
    sink_format: str = "memory",
    trigger_ms: int = 500,  # reference checkpoints every 500 ms
):
    """Start the streaming query; returns the StreamingQuery handle."""
    register_emqx_source(spark)
    reader = spark.readStream.format("emqx")
    for k, v in source_options.items():
        reader = reader.option(k, v)
    messages = reader.load()
    counts = word_count(messages)
    writer = (
        counts.writeStream.outputMode("update" if sink_format != "memory" else "complete")
        .format(sink_format)
        .queryName(query_name)
        .trigger(processingTime=f"{trigger_ms} milliseconds")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
