"""Semantic invariants for the corpus-statistics wave (X52-X60) — checks
the DuckDB parity gate can't express: information-theoretic bounds,
known-value fixtures, and cross-query consistency."""

import math

import pandas as pd
import pytest

from pyspark.sql import functions as F

from flink_emqx_connector_spark.plans import QUERIES


@pytest.fixture(scope="module")
def results(spark, sf_dir):
    cache = {}

    def get(name) -> pd.DataFrame:
        if name not in cache:
            cache[name] = QUERIES[name].spark(spark, sf_dir).toPandas()
        return cache[name]

    return get


def test_entropy_within_information_bounds(results):
    """0 <= H <= ln(n_tokens) for every document (equality: all-same /
    all-distinct tokens), up to the output rounding."""
    df = results("token_entropy_docs")
    assert len(df) > 0
    assert (df.entropy >= -1e-4).all()
    assert (df.entropy <= df.n_tokens.map(math.log) + 1e-4).all()


def test_entropy_known_value(spark):
    """Hand-computed fixture: 'a a b' → H = ln3 - (2 ln2)/3."""
    d = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tc = toks.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    n = F.sum("c")
    ent = F.log(n.cast("double")) - F.sum(
        F.col("c") * F.log(F.col("c").cast("double"))
    ) / n
    [(h,)] = tc.groupBy("doc_id").agg(ent.alias("h")).select("h").collect()
    assert h == pytest.approx(math.log(3) - 2 * math.log(2) / 3, abs=1e-12)


def test_kl_nonnegative_gibbs(spark, sf_dir, results):
    """KL(source || corpus) >= 0 (Gibbs' inequality) for every source,
    and per-source token masses must sum to the corpus total."""
    from flink_emqx_connector_spark.session import load_table

    df = results("source_token_kl")
    assert len(df) > 0
    assert (df.kl_nats >= -1e-6).all()
    [(corpus_tokens,)] = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .agg(F.sum(F.size(F.split("text", " "))))
        .collect()
    )
    assert int(df.n_tokens.sum()) == corpus_tokens


def test_novelty_fraction_bounds_and_first_doc(results):
    """novel_frac ∈ [0,1]; the lowest doc_id with bigrams introduces all
    of its own bigrams (nothing precedes it)."""
    df = results("ngram_novelty_docs")
    assert ((df.novel_frac >= 0) & (df.novel_frac <= 1)).all()
    first = df.loc[df.doc_id.idxmin()]
    assert first.novel_frac == pytest.approx(1.0)


def test_time_decay_bounded_by_plain_sum(spark, sf_dir, results):
    """exp(-Δt/τ) ∈ (0,1] ⇒ decay_score ≤ Σvalue per user (with equality
    only if every event sits at the anchor)."""
    from flink_emqx_connector_spark.session import load_table

    df = results("time_decay_user_scores")
    sums = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum("value").alias("s"))
        .toPandas()
    )
    m = df.merge(sums, on="user_id")
    assert len(m) == len(df)
    assert (m.decay_score <= m.s + 1e-6).all()
    # scores are rounded to 4 dp: a user hours from the anchor (τ = 1 h)
    # legitimately rounds to 0.0000, so only negativity is a bug
    assert (m.decay_score >= 0).all()


def test_prefix_pairs_verified_against_raw_text(spark, sf_dir, results):
    """Every reported pair must satisfy the definition on the raw table:
    strict prefix, strictly shorter, both >= blocking width."""
    from flink_emqx_connector_spark.session import load_table

    pairs = results("prefix_truncation_dupes")
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    assert len(pairs) > 0, "fixture should contain truncation dupes"
    for row in pairs.itertuples():
        a, b = docs[row.doc_short], docs[row.doc_long]
        assert len(a) >= 24 and len(a) < len(b)
        assert b.startswith(a)


def test_mad_matches_pandas_reference(spark, sf_dir, results):
    """Median/MAD/outlier census re-derived in pandas for one event type."""
    from flink_emqx_connector_spark.session import load_table

    got = results("mad_outlier_events").set_index("event_type")
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .toPandas()
    )
    t = ev.event_type.iloc[0]
    v = ev[ev.event_type == t].value
    med = v.median()
    mad = (v - med).abs().median()
    row = got.loc[t]
    assert row.med == pytest.approx(med, abs=1e-4)
    assert row["mad"] == pytest.approx(mad, abs=1e-4)
    assert row.n_outliers == int(((v - med).abs() > 3 * 1.4826 * mad).sum())


def test_centroid_consistency_with_cohesion(results):
    """label_centroids and intra_label_cosine must agree on the vector
    census, and cosine stats must lie in [-1, 1] with mean >= min."""
    cent = results("label_centroids")
    coh = results("intra_label_cosine")
    # every dimension of a label must report the same vector count (the
    # corpus has uniform dims) — min==max guards against order-dependent
    # row picking AND ragged counts
    per_label = cent.groupby("label").n_vecs.agg(["min", "max"]).sort_index()
    census = coh.set_index("label").n_vecs.sort_index()
    assert (per_label["min"] == per_label["max"]).all()
    assert (per_label["min"] == census).all()
    assert ((coh.mean_cos <= 1 + 1e-9) & (coh.mean_cos >= -1 - 1e-9)).all()
    assert (coh.min_cos <= coh.mean_cos + 1e-9).all()


def test_histogram_partitions_every_event(spark, sf_dir, results):
    """Bin counts must total the table row count, bins stay in [0, 19],
    and bin_lo is monotone within each type."""
    from flink_emqx_connector_spark.session import load_table

    df = results("histogram_events")
    total = load_table(spark, sf_dir, "events").count()
    assert int(df.n_events.sum()) == total
    assert df.bin.between(0, 19).all()
    for _, g in df.groupby("event_type"):
        lo = g.sort_values("bin").bin_lo.to_numpy()
        assert (lo[1:] > lo[:-1]).all()


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(path / "events.parquet"))


def _duck_events(path):
    import duckdb

    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the part-file glob
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{path}/events.parquet/*.parquet'"
    )
    return con


def test_histogram_constant_type_lands_in_last_bin(spark, tmp_path):
    """Degenerate width-0 type (all values equal): no ANSI divide-by-zero
    abort; every row lands in bin 19 on BOTH engines."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, 1, "flat", 5.0, "{}") for i in range(4)] + [
        (9 + i, t0, 1, "spread", float(i), "{}") for i in range(4)
    ]
    _write_events(spark, tmp_path, rows)
    got = (
        QUERIES["histogram_events"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .sort_values(["event_type", "bin"])
    )
    flat = got[got.event_type == "flat"]
    assert list(flat.bin) == [19] and int(flat.n_events.iloc[0]) == 4
    duck = (
        _duck_events(tmp_path)
        .execute(QUERIES["histogram_events"].oracle)
        .fetch_df()
        .sort_values(["event_type", "bin"])
    )
    assert list(duck[duck.event_type == "flat"].bin) == [19]
    assert len(duck) == len(got)


def test_funnel_empty_stage_yields_null_rates(spark, tmp_path):
    """No view events at all: stage counts are 0 and the conversion rates
    are NULL (not an ANSI divide-by-zero abort) on BOTH engines."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, i, "click", 1.0, "{}") for i in range(3)]
    _write_events(spark, tmp_path, rows)
    [g] = QUERIES["funnel_stage_conversion"].spark(spark, str(tmp_path)).collect()
    assert (g.n_view, g.n_click, g.n_purchase) == (0, 0, 0)
    assert g.view_to_click is None and g.click_to_purchase is None
    [d] = (
        _duck_events(tmp_path)
        .execute(QUERIES["funnel_stage_conversion"].oracle)
        .fetchall()
    )
    assert tuple(d[:3]) == (0, 0, 0) and d[3] is None and d[4] is None
