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


@register(
    "multimodal_resize_plan",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             320 + n_chars % 1024 AS in_w,
             240 + n_chars % 768  AS in_h
      FROM documents
    )
    SELECT doc_id,
           CAST(in_w AS BIGINT) AS in_w,
           CAST(in_h AS BIGINT) AS in_h,
           CAST(CASE WHEN greatest(in_w, in_h) > 224
                     THEN (in_w * 224) // greatest(in_w, in_h) ELSE in_w END
                AS BIGINT) AS out_w,
           CAST(CASE WHEN greatest(in_w, in_h) > 224
                     THEN (in_h * 224) // greatest(in_w, in_h) ELSE in_h END
                AS BIGINT) AS out_h,
           CAST((CASE WHEN greatest(in_w, in_h) > 224
                      THEN (in_w * 224) // greatest(in_w, in_h) ELSE in_w END)
              * (CASE WHEN greatest(in_w, in_h) > 224
                      THEN (in_h * 224) // greatest(in_w, in_h) ELSE in_h END)
              * 3 AS BIGINT) AS resized_bytes
    FROM dims
    """,
    doc="Image-resize plumbing: fit-within-224 geometry (aspect preserved, "
    "integer-exact) + resized buffer size, as an Arrow-batched kernel; "
    "in-dims synthesized from n_chars since the container has no image "
    "decode. operators/multimodal.py:resize_plan.",
    tags=("multimodal", "udf"),
)
def multimodal_resize_plan(spark, sf_dir):
    d = _docs(spark, sf_dir).select(
        "doc_id",
        (320 + F.col("n_chars") % 1024).alias("in_w"),
        (240 + F.col("n_chars") % 768).alias("in_h"),
    )
    return M.resize_plan(d, "in_w", "in_h", target=224)


@register(
    "multimodal_audio_windows",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             8000 + (n_chars % 3) * 4000          AS sample_rate,
             (8000 + (n_chars % 3) * 4000)
               * (1 + n_chars % 29)               AS n_samples
      FROM documents
    )
    SELECT doc_id,
           CAST(sample_rate AS BIGINT) AS sample_rate,
           CAST(n_samples AS BIGINT) AS n_samples,
           CAST(n_samples * 1000 // sample_rate AS BIGINT) AS duration_ms,
           CAST(n_samples * 2 AS BIGINT) AS pcm_bytes,
           CAST((n_samples - sample_rate // 2) // (sample_rate // 4) + 1
                AS BIGINT) AS n_windows,
           CAST(((n_samples - sample_rate // 2) // (sample_rate // 4))
                * (sample_rate // 4) AS BIGINT) AS last_window_start
    FROM meta
    """,
    doc="Audio windowing plumbing (the audio leg of the multimodal triad): "
    "0.5 s windows / 0.25 s hop over 16-bit mono PCM metadata — window "
    "count, exact duration, last-window start — as one vectorized numpy "
    "pass per Arrow batch, never touching payload bytes. sample_rate "
    "(8/12/16 kHz) and 1-29 s clip lengths synthesized from n_chars since "
    "the container has no audio decode; clips are always >= one window so "
    "the pad branch is exercised by unit test, not the oracle. "
    "operators/multimodal.py:audio_windows.",
    tags=("multimodal", "udf", "audio"),
)
def multimodal_audio_windows(spark, sf_dir):
    d = _docs(spark, sf_dir).select(
        "doc_id",
        (8000 + (F.col("n_chars") % 3) * 4000).cast("long").alias("sample_rate"),
        (
            (8000 + (F.col("n_chars") % 3) * 4000)
            * (1 + F.col("n_chars") % 29)
        ).cast("long").alias("n_samples"),
    )
    return M.audio_windows(d, win_s=0.5, hop_s=0.25)


@register(
    "multimodal_shot_boundaries",
    oracle="""
    WITH frames AS (
      SELECT doc_id,
             CAST(n_chars % 30 + 1 AS BIGINT) AS n_frames,
             unnest(range(0, CAST(n_chars % 30 + 1 AS BIGINT))) AS f
      FROM documents
    ),
    luma AS (
      SELECT doc_id, n_frames, f,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                                      CAST(f AS VARCHAR)), 1, 2))::UBIGINT
                  AS BIGINT) AS y
      FROM frames
    ),
    deltas AS (
      SELECT doc_id, n_frames,
             abs(y - lag(y) OVER (PARTITION BY doc_id ORDER BY f)) AS d
      FROM luma
    )
    SELECT doc_id,
           any_value(n_frames) AS n_frames,
           CAST(1 + count(*) FILTER (WHERE d > 96) AS BIGINT) AS n_shots,
           CAST(COALESCE(max(d), 0) AS BIGINT) AS max_delta
    FROM deltas GROUP BY doc_id
    """,
    doc="Shot-boundary detection (the video-analysis leg of the "
    "multimodal family): per-frame mean-luminance series, a boundary "
    "wherever the frame-to-frame delta exceeds the cut threshold (96 of "
    "255) — the standard hard-cut detector a video-curation pipeline "
    "runs before frame dedup and caption alignment. Luminance is "
    "synthesized per (doc, frame) from md5 (no video decode in this "
    "container); with real media the SAME plan shape consumes the "
    "decode_images kernel's milli-mean luminance instead (operators/"
    "multimodal.py:decode_images). Plan: one scan -> bounded explode "
    "(<=30 frames/clip) -> per-doc lag window -> per-doc aggregate "
    "REUSING the window's doc_id exchange (one shuffle total); at scale "
    "the frame series partitions by clip, so no window partition "
    "outgrows one clip's frame count.",
    tags=("multimodal", "video", "window"),
)
def multimodal_shot_boundaries(spark, sf_dir):
    from pyspark.sql import Window as W

    frames = _docs(spark, sf_dir).select(
        "doc_id",
        (F.col("n_chars") % 30 + 1).cast("bigint").alias("n_frames"),
        F.explode(
            F.sequence(F.lit(0).cast("bigint"),
                       (F.col("n_chars") % 30).cast("bigint"))
        ).alias("f"),
    )
    # F.conv returns STRING (round-8 sketch-wave gotcha) — cast before use
    luma = frames.select(
        "doc_id",
        "n_frames",
        "f",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id"), F.col("f"))), 1, 2
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("y"),
    )
    d = F.abs(
        F.col("y") - F.lag("y").over(W.partitionBy("doc_id").orderBy("f"))
    )
    return (
        luma.select("doc_id", "n_frames", d.alias("d"))
        .groupBy("doc_id")
        .agg(
            F.first("n_frames").alias("n_frames"),
            (1 + F.sum(F.when(F.col("d") > 96, 1).otherwise(0)))
            .cast("bigint")
            .alias("n_shots"),
            F.coalesce(F.max("d"), F.lit(0)).cast("bigint").alias("max_delta"),
        )
    )
