"""Sequence packing: group documents into fixed token-budget packs.

Training-data pipelines pack variable-length documents into fixed-size
token buffers (e.g. 512/2048/8192-token training sequences) so the
accelerator batch has no padding waste. The reference connector has no
analogue (it is ingestion-only); this is part of the §2.5 pipeline surface.

Two strategies, both deterministic and reproducible across runs/engines:

- ``pack_sequences_greedy``: the real packer. Documents are hash-sharded,
  ordered by id within shard, and packed by a running accumulator that
  starts a new pack whenever adding the next document would exceed the
  budget (a document larger than the budget gets its own pack). The
  per-shard loop is sequential by nature — packing is a left-fold — so the
  unit of parallelism is the shard: at 100 TB you size ``shards`` to the
  cluster (thousands), each shard's loop is O(docs/shard) inside one
  ``applyInPandas`` task, and no shard ever sees the whole corpus.
- ``pack_sequences_contiguous`` (in ``plans/training_extra.py``): the
  pure-shuffle approximation — pack id = floor(exclusive-cumsum / budget)
  over the same order. Packs can overshoot by at most one document; in
  exchange the whole thing is a window function (no Python at all), which
  is the cheaper plan when mild overshoot is acceptable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PACK_SCHEMA = (
    "shard bigint, pack bigint, n_docs bigint, pack_tokens bigint, "
    "min_doc bigint, max_doc bigint"
)


def shard_of(col, shards: int):
    """Deterministic md5-bucket shard id (same form as shard_assignment)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
        % shards
    )


def greedy_fold(tokens: list[int], budget: int) -> list[int]:
    """Pack id per item: new pack when adding the next item would exceed
    the budget; an item larger than the budget still gets its own pack."""
    acc = 0
    pack = 0
    out = []
    for t in tokens:
        if acc > 0 and acc + t > budget:
            pack += 1
            acc = t
        else:
            acc += t
        out.append(pack)
    return out


def pack_sequences_greedy(
    docs: DataFrame,
    budget: int = 512,
    shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy sequential packer; one output row per (shard, pack).

    Invariants (property-tested in ``tests/test_packing.py``):
    every doc is assigned to exactly one pack; ``pack_tokens <= budget``
    unless the pack is a single oversized doc; packs within a shard cover
    contiguous ranges of the shard's doc order.
    """
    base = docs.select(
        F.col(id_col).cast("bigint").alias("doc"),
        F.coalesce(F.size(F.split(F.col(text_col), " ")), F.lit(0)).alias("t"),
        shard_of(F.col(id_col), shards).alias("shard"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc").reset_index(drop=True)
        pdf["pack"] = greedy_fold(list(pdf["t"]), budget)
        out = (
            pdf.groupby("pack", as_index=False)
            .agg(
                shard=("shard", "first"),
                n_docs=("doc", "size"),
                pack_tokens=("t", "sum"),
                min_doc=("doc", "min"),
                max_doc=("doc", "max"),
            )
        )
        return out[["shard", "pack", "n_docs", "pack_tokens", "min_doc", "max_doc"]]

    return base.groupBy("shard").applyInPandas(_pack, _PACK_SCHEMA)
