"""Multimodal-column queries (operators/multimodal.py): binary payload
plumbing with a deterministic fake featurizer, oracle-checked end-to-end."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..operators import multimodal as M
from .registry import register


def _docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text)                                  AS fp,
           CAST(ascii(substr(text, 1, 1)) AS BIGINT)  AS first_byte
    FROM documents
    """,
    doc="Binary media plumbing: text → BINARY payload + metadata struct → "
    "Arrow-batched mapInPandas feature kernel (deterministic fake standing "
    "in for a GPU featurizer). operators/multimodal.py:extract_features.",
    tags=("multimodal", "udf"),
)
def multimodal_features(spark, sf_dir):
    media = M.attach_media_columns(_docs(spark, sf_dir))
    return M.extract_features(media)


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(n_chars % 30 + 1 AS BIGINT) AS n_frames,
           CAST(len(range(0, CAST(n_chars % 30 + 1 AS BIGINT), 5)) AS BIGINT) AS n_sampled
    FROM documents
    """,
    doc="Video frame-sampling plumbing: every-5th-frame index generation via "
    "built-in sequence (no Python). n_frames is synthesized from n_chars "
    "since the container has no real video decode. "
    "operators/multimodal.py:sample_frames.",
    tags=("multimodal",),
)
def multimodal_frame_sample(spark, sf_dir):
    d = _docs(spark, sf_dir).withColumn("n_frames", (F.col("n_chars") % 30 + 1).cast("int"))
    return M.sample_frames(d, "n_frames", every_k=5).select(
        "doc_id", "n_frames", "n_sampled"
    )
