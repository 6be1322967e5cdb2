"""Streaming ingest dedup: collapse at-least-once redeliveries to
effectively-once within a bounded event-time window.

The MQTT path (QoS 1, and the reference's contract — SURVEY.md §2.3 ST9)
is at-least-once: a reconnect before PUBACK redelivers the message, so a
downstream training-data pipeline sees duplicate envelopes. This operator
closes that gap with Spark's watermarked stream dedup
(``dropDuplicatesWithinWatermark``): the first copy of an identity key is
emitted immediately (append mode — no latency penalty), later copies
arriving within the watermark delay are dropped, and the dedup state for a
key is reclaimed once the watermark passes it — bounded memory at any
scale, unlike an unbounded ``dropDuplicates`` whose state grows forever.

Identity default is ``(topic, payload_digest)``: MQTT has no message id in
the envelope, and hashing the payload keeps the state store entry at 16
bytes regardless of payload size (the state store holds the key columns —
deduping on raw ``payload`` would persist every message body).

At 100 TB-scale ingest the state is partitioned by the identity hash across
executors by the engine; the watermark delay is the knob trading dedup
coverage (how late a redelivery can arrive and still be caught) against
state size (keys retained per delay window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_within_watermark(
    messages: DataFrame,
    delay: str = "10 minutes",
    id_cols: tuple[str, ...] = ("topic", "payload_digest"),
) -> DataFrame:
    """Watermarked effectively-once filter over the envelope stream.

    ``messages`` is the EMQX source output (``EMQX_MESSAGE_SCHEMA``).
    Returns the same envelope plus ``payload_digest``; duplicate
    ``id_cols`` tuples within ``delay`` of each other collapse to the
    first arrival.
    """
    with_digest = messages.withColumn("payload_digest", F.md5(F.col("payload")))
    return with_digest.withWatermark("timestamp", delay).dropDuplicatesWithinWatermark(
        list(id_cols)
    )
