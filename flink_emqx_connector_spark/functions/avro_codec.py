"""Avro binary codec — pure Python, written from the public Avro 1.11
binary-encoding specification (zigzag-varint longs, length-prefixed utf8 /
bytes, IEEE754-LE floats, union branch indexes).

Completes the decode layer's codec list (SURVEY.md §1.4: ``cast`` /
``from_json`` / ``from_csv`` / Avro): the reference's pluggable
``DeserializationSchema`` (``EMQXSource.java:43``) maps to column-level
decoders, and Avro is the one that needs code here because the pip pyspark
distribution does not bundle the spark-avro JVM package — so the codec
runs as Arrow-batched pandas UDFs instead of ``from_avro``. Supported
schema subset: a record of primitive fields (boolean/int/long/float/
double/string/bytes) and nullable unions ``["null", <prim>]`` — the shape
MQTT telemetry payloads take. Malformed payloads decode to NULL (dead-
letterable), never a task failure — the decode layer's contract (S9).
"""

from __future__ import annotations

import struct

import pandas as pd

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

_SPARK_TYPES = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def _field_types(schema: dict) -> list[tuple[str, str, bool]]:
    """(name, primitive, nullable) per field of a record schema dict."""
    if schema.get("type") != "record":
        raise ValueError("only record schemas are supported")
    out = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            if len(t) != 2 or t[0] != "null":
                raise ValueError(f"unsupported union {t!r} (only ['null', T])")
            out.append((f["name"], t[1], True))
        else:
            out.append((f["name"], t, False))
    for _n, t, _x in out:
        if t not in _SPARK_TYPES:
            raise ValueError(f"unsupported avro type {t!r}")
    return out


def spark_schema_for(schema: dict) -> T.StructType:
    return T.StructType(
        [
            T.StructField(name, _SPARK_TYPES[t], nullable=True)
            for name, t, _nullable in _field_types(schema)
        ]
    )


# -- binary primitives (Avro spec: zigzag varint, LE floats, len-prefix) ----


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, i: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[i]
        i += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return (acc >> 1) ^ -(acc & 1), i
        shift += 7


def _encode_value(t: str, v) -> bytes:
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t in ("int", "long"):
        return _zigzag_encode(int(v))
    if t == "float":
        return struct.pack("<f", float(v))
    if t == "double":
        return struct.pack("<d", float(v))
    if t == "string":
        b = str(v).encode("utf-8")
        return _zigzag_encode(len(b)) + b
    if t == "bytes":
        b = bytes(v)
        return _zigzag_encode(len(b)) + b
    raise ValueError(t)


def _decode_value(t: str, buf: bytes, i: int):
    if t == "boolean":
        return buf[i] == 1, i + 1
    if t in ("int", "long"):
        return _zigzag_decode(buf, i)
    if t == "float":
        return struct.unpack_from("<f", buf, i)[0], i + 4
    if t == "double":
        return struct.unpack_from("<d", buf, i)[0], i + 8
    if t == "string":
        n, i = _zigzag_decode(buf, i)
        return buf[i : i + n].decode("utf-8"), i + n
    if t == "bytes":
        n, i = _zigzag_decode(buf, i)
        return bytes(buf[i : i + n]), i + n
    raise ValueError(t)


def encode_record(schema: dict, rec: dict) -> bytes:
    out = bytearray()
    for name, t, nullable in _field_types(schema):
        v = rec.get(name)
        if nullable:
            if v is None:
                out += _zigzag_encode(0)  # branch 0 = null
                continue
            out += _zigzag_encode(1)
        elif v is None:
            raise ValueError(f"field {name} is not nullable")
        out += _encode_value(t, v)
    return bytes(out)


def decode_record(schema: dict, buf: bytes) -> dict | None:
    """One record, or None when the payload is malformed (S9 contract)."""
    try:
        i = 0
        rec = {}
        for name, t, nullable in _field_types(schema):
            if nullable:
                branch, i = _zigzag_decode(buf, i)
                if branch == 0:
                    rec[name] = None
                    continue
            rec[name], i = _decode_value(t, buf, i)
        if i != len(buf):
            return None  # trailing garbage
        return rec
    except (IndexError, struct.error, UnicodeDecodeError, ValueError):
        return None


# -- Spark surface ----------------------------------------------------------


def to_avro(struct_col: Column | str, schema: dict) -> Column:
    """struct → Avro binary, Arrow-batched."""
    fields = _field_types(schema)

    @F.pandas_udf(T.BinaryType())
    def enc(s: pd.DataFrame) -> pd.Series:
        # a struct column arrives as a DataFrame (one column per field);
        # NaN → None so nullable unions encode the null branch
        clean = s.astype(object).where(pd.notnull(s), None)
        return pd.Series(
            [encode_record(schema, rec) for rec in clean.to_dict("records")],
            dtype=object,
        )

    col = F.col(struct_col) if isinstance(struct_col, str) else struct_col
    return enc(col)


def from_avro(payload: Column | str, schema: dict) -> Column:
    """Avro binary → struct; malformed payloads → NULL struct."""
    out_type = spark_schema_for(schema)

    @F.pandas_udf(out_type)
    def dec(s: pd.Series) -> pd.DataFrame:
        rows = [
            decode_record(schema, bytes(b)) if b is not None else None for b in s
        ]
        cols = {}
        for name, _t, _n in _field_types(schema):
            cols[name] = [None if r is None else r[name] for r in rows]
        return pd.DataFrame(cols)

    col = F.col(payload) if isinstance(payload, str) else payload
    return dec(col)
