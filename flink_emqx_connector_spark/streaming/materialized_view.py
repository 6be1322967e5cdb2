"""Materialized latest-state view: a continuously-maintained
latest-value-per-key table fed by the envelope stream.

The pattern a device-state / feature-store consumer actually wants from an
MQTT feed is not the raw message log but "the newest value per key,
queryable at any time". This sink maintains exactly that as a parquet
table updated per micro-batch:

- per batch: ``new_state = argmax_ts(old_state ∪ batch)`` per key —
  computed as one ``max_by(struct, ts)`` aggregation, so out-of-order
  and intra-batch duplicates resolve to the newest event-time value;
- atomicity: each batch writes a NEW versioned directory
  (``state_v{batch_id}``) and then flips a pointer file via atomic
  rename — readers never observe a half-written state, and a crash
  between write and flip leaves the previous version intact;
- replay safety: the pointer IS the commit marker. A replayed batch
  (same batch_id after recovery) is detected because the pointer
  already names ``state_v{batch_id}`` — the flip is the last step, so
  pointer==version proves the merge+write fully completed and the
  replay early-returns. Without this, the replay would read the
  current version dir and ``overwrite`` the same path (Spark rejects
  overwrite-while-reading, and the pre-merge version was already
  GC'd). A crash BEFORE the flip leaves the pointer on the old
  version, whose dir is only GC'd after the flip — the replay then
  recomputes from intact inputs and overwrites a half-written,
  unreferenced dir;
- state size is bounded by key cardinality, not stream length. At
  cluster scale the state write partitions by a key hash so readers
  prune, and old versions are GC'd after a retention window (here:
  previous version removed once the pointer flips).

``read_state(spark, state_dir)`` returns the current view.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINTER = "CURRENT"


def _current_version(state_dir: str) -> str | None:
    try:
        with open(os.path.join(state_dir, _POINTER)) as f:
            return f.read().strip() or None
    except FileNotFoundError:
        return None


def read_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Current materialized view, or None before the first batch."""
    v = _current_version(state_dir)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(state_dir, v))


def latest_state_sink(
    state_dir: str,
    key_cols: tuple[str, ...] = ("topic",),
    ts_col: str = "timestamp",
):
    """``writeStream.foreachBatch(latest_state_sink(...))`` callback."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(state_dir, exist_ok=True)
        prev = _current_version(state_dir)
        version = f"state_v{batch_id}"
        if prev == version:
            # Pointer already names this batch's version: the previous
            # attempt committed (flip is the final step), this is a
            # post-recovery replay — applying it again would read and
            # overwrite the same live dir.
            return
        merged = batch_df
        if prev is not None:
            old = spark.read.parquet(os.path.join(state_dir, prev))
            merged = old.unionByName(batch_df)
        value_cols = [c for c in merged.columns if c not in key_cols]
        newest = merged.groupBy(*key_cols).agg(
            F.max_by(F.struct(*value_cols), F.col(ts_col)).alias("_v")
        )
        state = newest.select(*key_cols, *[f"_v.{c}" for c in value_cols])
        out = os.path.join(state_dir, version)
        state.write.mode("overwrite").parquet(out)
        tmp = os.path.join(state_dir, f".{_POINTER}.tmp")
        with open(tmp, "w") as f:
            f.write(version)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(state_dir, _POINTER))
        if prev is not None and prev != version:
            shutil.rmtree(os.path.join(state_dir, prev), ignore_errors=True)

    return sink
