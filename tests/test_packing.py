"""Sequence-packing invariants: hypothesis over the fold kernel, plus a
Spark E2E check including the oversized-document edge case."""

from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_emqx_connector_spark.operators.packing import (
    greedy_fold,
    pack_sequences_greedy,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2000), max_size=200),
    st.integers(min_value=1, max_value=1024),
)
def test_greedy_fold_invariants(tokens, budget):
    packs = greedy_fold(tokens, budget)
    assert len(packs) == len(tokens)
    if not tokens:
        return
    # pack ids are 0..max contiguous and non-decreasing (a left fold)
    assert packs[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(packs, packs[1:]))
    # budget respected unless the pack is one oversized item (zero-token
    # items are free riders — they never trigger a split)
    sums: dict[int, int] = {}
    nonzero: dict[int, int] = {}
    for p, t in zip(packs, tokens):
        sums[p] = sums.get(p, 0) + t
        nonzero[p] = nonzero.get(p, 0) + (1 if t > 0 else 0)
    for p, s in sums.items():
        assert s <= budget or nonzero[p] == 1
    # greedy is maximal: consecutive packs cannot be merged
    for p in range(max(packs)):
        assert sums[p] + _first_item(packs, tokens, p + 1) > budget


def _first_item(packs, tokens, pack):
    for p, t in zip(packs, tokens):
        if p == pack:
            return t
    raise AssertionError(f"no items in pack {pack}")


def test_pack_sequences_spark_e2e(spark):
    # 30 short docs + one oversized (budget 64; doc 17 has 100 words)
    rows = [
        (i, " ".join(["w"] * (100 if i == 17 else 5 + i % 7)))
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences_greedy(docs, budget=64, shards=4).collect()
    assert sum(r["n_docs"] for r in out) == 30
    for r in out:
        assert r["pack_tokens"] <= 64 or r["n_docs"] == 1
        assert r["min_doc"] <= r["max_doc"]
    # within a shard: pack ids contiguous from 0, doc ranges non-overlapping
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["pack"])
        assert [r["pack"] for r in shard_rows] == list(range(len(shard_rows)))
        for a, b in zip(shard_rows, shard_rows[1:]):
            assert a["max_doc"] < b["min_doc"]
    # the oversized doc (100 tokens > budget 64) is alone in its pack
    over = [r for r in out if r["pack_tokens"] == 100]
    assert len(over) == 1 and over[0]["n_docs"] == 1


def test_pack_all_docs_assigned_once(spark, sf_dir):
    from flink_emqx_connector_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()
    out = pack_sequences_greedy(docs, budget=512, shards=8)
    agg = out.agg(
        F.sum("n_docs").alias("n"), F.count("*").alias("packs")
    ).collect()[0]
    assert agg["n"] == total
    assert agg["packs"] >= total * 50 // 512  # sane pack count (avg ~54 tok)
