"""Leakage invariant of the cluster-keyed split: no near-dup pair may
straddle train/val/test, and the incremental-dedup keep decision must
agree with what full-corpus exact dedup says about the new batch."""

from pyspark.sql import functions as F

import flink_emqx_connector_spark.operators.dedup as D
from flink_emqx_connector_spark.session import load_table


def _split_per_doc(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs_auto(docs, threshold=0.5, n=2)
    comps = D.connected_components(pairs)
    grp = F.coalesce("comp", F.col("doc_id")).cast("bigint")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("grp").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 10
    )
    return (
        docs.select("doc_id")
        .join(comps, docs.doc_id == comps.doc, "left")
        .select("doc_id", grp.alias("grp"))
        .withColumn(
            "split",
            F.when(bucket == 8, "val").when(bucket == 9, "test").otherwise("train"),
        )
    ), pairs


def test_no_near_dup_pair_straddles_splits(spark, sf_dir):
    assign, pairs = _split_per_doc(spark, sf_dir)
    a = assign.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    b = assign.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    straddlers = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert straddlers == 0
    # and the split actually uses >1 bucket on this corpus
    assert assign.select("split").distinct().count() >= 2


def test_incremental_exact_flags_match_full_dedup(spark, sf_dir):
    from flink_emqx_connector_spark.plans import QUERIES

    docs = load_table(spark, sf_dir, "documents")
    inc = QUERIES["dedup_incremental"].spark(spark, sf_dir)
    # every new doc flagged dup_exact must share its md5 with an old doc
    flagged = {r["doc_id"] for r in inc.filter("dup_exact").collect()}
    dig = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.md5(F.encode("text", "UTF-8")).alias("dig")
    )
    old_digs = {
        r["dig"] for r in dig.filter((F.col("doc_id") % 10) < 8).collect()
    }
    new_dig = {
        r["doc_id"]: r["dig"]
        for r in dig.filter((F.col("doc_id") % 10) >= 8).collect()
    }
    expect = {d for d, g in new_dig.items() if g in old_digs}
    assert flagged == expect


def test_line_dedup_accounting(spark, sf_dir):
    """Per-doc invariants: n_boiler <= n_segments; kept_words <= doc word
    count; a doc with zero boilerplate keeps every word."""
    from flink_emqx_connector_spark.plans import QUERIES
    from pyspark.sql import functions as F

    out = {
        r.doc_id: r
        for r in QUERIES["line_dedup_docs"].spark(spark, sf_dir).collect()
    }
    docs = (
        QUERIES["profile_documents"]
        .spark(spark, sf_dir)
        .sparkSession.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.size(F.split("text", " ")).alias("nw"))
        .collect()
    )
    nw = {r.doc_id: r.nw for r in docs}
    assert set(out) == set(nw)
    for doc_id, r in out.items():
        assert 0 <= r.n_boiler <= r.n_segments
        assert 0 <= r.kept_words <= nw[doc_id]
        if r.n_boiler == 0:
            assert r.kept_words == nw[doc_id], (doc_id, r)


def test_temperature_resample_flattens_distribution(spark, sf_dir):
    """Quotas never exceed source size; every source keeps >= 1 doc; and
    the kept-share of the largest source does not increase relative to
    the smallest (flattening direction of the p^alpha law)."""
    from flink_emqx_connector_spark.plans import QUERIES

    rows = (
        QUERIES["temperature_resample_sources"].spark(spark, sf_dir).collect()
    )
    assert rows
    for r in rows:
        assert 0 < r.quota <= r.n_docs
        assert r.n_kept == min(r.quota, r.n_docs)
        assert 0.0 < r.keep_rate <= 1.0
    big = max(rows, key=lambda r: r.n_docs)
    small = min(rows, key=lambda r: r.n_docs)
    assert big.keep_rate <= small.keep_rate


def test_gini_bounds(spark):
    """Gini lies in [0, 1) for every priority class on real data."""
    from flink_emqx_connector_spark.plans import QUERIES

    rows = QUERIES["gini_by_priority"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.gini < 1.0, r
