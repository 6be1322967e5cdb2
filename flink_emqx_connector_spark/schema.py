"""Canonical data model: the EMQX message envelope.

Mirrors the reference's ``EMQXMessage`` POJO (reference
``flink-emqx-connector-core/src/main/java/com/emqx/flink/connector/EMQXMessage.java:5-18``):
``topic``, ``qos``, ``retained``, MQTT 5 user ``properties``, generic
``payload`` — plus an engine-added arrival ``timestamp`` for event-time ops.

The reference is row-oriented (one POJO per MQTT PUBLISH); on Spark the same
stream is a DataFrame with this fixed StructType, which Tungsten stores
columnar — a free upgrade at scale.

MQTT 5 user properties allow duplicate keys; ``MAP<STRING,STRING>`` drops
duplicates (last-wins). The source option ``properties_mode=list`` selects
the ordered fidelity variant end-to-end: the envelope then carries
``properties_list ARRAY<STRUCT<key,value>>`` with duplicates preserved in
wire order (``EMQXMessage.java:3,9`` ``Mqtt5UserProperties`` parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Envelope produced by the EMQX source — the engine's canonical stream schema.
EMQX_MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("qos", T.IntegerType(), False),
        T.StructField("retained", T.BooleanType(), False),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("timestamp", T.TimestampType(), False),
    ]
)

#: Fidelity variant: MQTT5 user properties as an ordered list of (key, value)
#: pairs — duplicate keys preserved (see module docstring).
EMQX_MESSAGE_SCHEMA_ORDERED_PROPS = T.StructType(
    [
        f
        if f.name != "properties"
        else T.StructField(
            "properties_list",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType(), False),
                        T.StructField("value", T.StringType(), False),
                    ]
                )
            ),
            True,
        )
        for f in EMQX_MESSAGE_SCHEMA.fields
    ]
)

#: DDL form, for ``spark.readStream.schema(...)`` call sites.
EMQX_MESSAGE_DDL = (
    "topic STRING, qos INT, retained BOOLEAN, "
    "properties MAP<STRING,STRING>, payload BINARY, timestamp TIMESTAMP"
)


def events_as_envelope(events: DataFrame) -> DataFrame:
    """Map the driver's ``events`` parquet table onto the envelope schema.

    This is the batch stand-in used by correctness gates that must run
    without a live broker (FIXTURES.md §3): ``event_type`` plays the topic
    suffix, ``value``/``props`` ride in the payload, ``ts`` is arrival time.
    Pure column expressions — stays entirely in whole-stage codegen.
    """
    return events.select(
        F.concat(F.lit("t/"), F.col("event_type")).alias("topic"),
        F.lit(1).alias("qos"),
        F.lit(False).alias("retained"),
        F.create_map(F.lit("props"), F.col("props")).alias("properties"),
        F.encode(F.col("event_type"), "UTF-8").alias("payload"),
        F.col("ts").alias("timestamp"),
    )
