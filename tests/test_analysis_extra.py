"""Semantic invariants for the X67-X76 wave (plans/analysis_extra.py) —
the properties oracle parity can't express (bounds, monotonicity,
cross-operator consistency)."""

import math

from pyspark.sql import functions as F

from flink_emqx_connector_spark.plans import QUERIES


def _run(name, spark, sf_dir):
    return QUERIES[name].spark(spark, sf_dir).collect()


def test_quantization_error_bounded_by_half_step(spark, sf_dir):
    """int8 symmetric quantization: per-element error ≤ scale/2, so
    max_abs_err ≤ max|x|/254 per label; mse ≤ (scale/2)²."""
    from flink_emqx_connector_spark.session import load_table

    rows = _run("embedding_quantization_stats", spark, sf_dir)
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select(
            "label",
            F.array_max(
                F.transform(
                    F.col("embedding").cast("array<double>"), lambda x: F.abs(x)
                )
            ).alias("mx"),
        )
        .groupBy("label")
        .agg(F.max("mx").alias("mx"))
    )
    mx = {r["label"]: r["mx"] for r in emb.collect()}
    for r in rows:
        half_step = mx[r["label"]] / 254  # (max|x|/127)/2 over the label
        assert r["max_abs_err"] <= half_step + 1e-9, r
        assert r["avg_mse"] <= half_step**2 + 1e-12, r
        assert r["n_vecs"] > 0


def test_centroid_distances_shape_and_range(spark, sf_dir):
    rows = _run("pairwise_centroid_distances", spark, sf_dir)
    labels = {r["label_a"] for r in rows} | {r["label_b"] for r in rows}
    n = len(labels)
    assert len(rows) == n * (n - 1) // 2  # full upper triangle
    assert all(-1.0 - 1e-9 <= r["cos_sim"] <= 1.0 + 1e-9 for r in rows)
    assert all(r["label_a"] < r["label_b"] for r in rows)


def test_zipf_fit_is_negative_and_sane(spark, sf_dir):
    (row,) = _run("zipf_fit_docs", spark, sf_dir)
    assert row["n_terms"] > 10
    assert -5 < row["zipf_slope"] < 0  # frequency decays with rank
    # the fitted line at rank 1 (lr=0) is the intercept: ln(max freq)-ish
    assert row["zipf_intercept"] > 0


def test_length_bands_partition_the_corpus(spark, sf_dir):
    from flink_emqx_connector_spark.session import load_table

    rows = {r["band"]: r for r in _run("doc_length_percentile_bands", spark, sf_dir)}
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows.values()) == total
    order = ["p00-p25", "p25-p50", "p50-p75", "p75-p100"]
    present = [b for b in order if b in rows]
    for lo, hi in zip(present, present[1:]):
        assert rows[lo]["max_words"] <= rows[hi]["min_words"] + 0  # bands ordered


def test_coverage_curve_monotone(spark, sf_dir):
    rows = sorted(_run("ngram_coverage_curve", spark, sf_dir), key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    fracs = [r["cum_frac"] for r in rows]
    assert all(b >= a for a, b in zip(fracs, fracs[1:]))
    assert 0 < fracs[0] and fracs[-1] <= 1.0


def test_session_gaps_nonnegative(spark, sf_dir):
    rows = _run("session_gap_stats", spark, sf_dir)
    for r in rows:
        assert r["avg_gap_s"] >= 0 and r["max_gap_s"] >= r["avg_gap_s"]


def test_latest_state_matches_groupby(spark, sf_dir):
    """One row per user; last_ts is that user's max ts; n_events matches
    a plain count — the SCD-1 snapshot agrees with first principles."""
    from flink_emqx_connector_spark.session import load_table

    rows = {r["user_id"]: r for r in _run("latest_state_per_user", spark, sf_dir)}
    ev = load_table(spark, sf_dir, "events")
    check = {
        r["user_id"]: (r["mx"], r["n"])
        for r in ev.groupBy("user_id")
        .agg(F.max("ts").alias("mx"), F.count("*").alias("n"))
        .collect()
    }
    assert set(rows) == set(check)
    for uid, r in rows.items():
        mx, n = check[uid]
        assert r["last_ts"] == mx and r["n_events"] == n


def test_late_arrivals_consistent(spark, sf_dir):
    rows = _run("late_arrival_accounting", spark, sf_dir)
    for r in rows:
        assert 0 <= r["n_late"] < r["n_events"]
        if r["n_late"] == 0:
            assert r["max_late_s"] == 0.0
        else:
            assert r["max_late_s"] > 0


def test_top_token_coverage_fractions(spark, sf_dir):
    rows = _run("top_token_coverage_by_lang", spark, sf_dir)
    assert rows and all(0.0 <= r["top10_frac"] <= 1.0 for r in rows)


def test_pmi_ordering_and_threshold(spark, sf_dir):
    rows = _run("token_cooccurrence_pmi", spark, sf_dir)
    assert all(r["n_cooc"] >= 5 for r in rows)
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True) or all(
        a >= b - 1e-9 for a, b in zip(pmis, pmis[1:])
    )
    # PMI of independent tokens ~0; the TOP collocations must be positive
    assert pmis[0] > 0


def test_pmi_closed_form_fixture(spark, tmp_path):
    """Two-doc fixture with a guaranteed collocation: 'new york' appears
    5 times, tokens 'new'/'york' appear only together → PMI = ln(nb) -
    ln(c12) + ... verified against hand math."""
    import os

    docs = spark.createDataFrame(
        [(0, "new york " * 5 + "a b c d"), (1, "a c b d a b")],
        ["doc_id", "text"],
    )
    docs = docs.select(
        "doc_id", F.trim("text").alias("text"),
        F.lit("en").alias("lang"), F.lit("src0").alias("source"),
        F.length("text").alias("n_chars"),
    )
    tmp = str(tmp_path)
    docs.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    rows = {r["bigram"]: r for r in _run("token_cooccurrence_pmi", spark, tmp)}
    r = rows["new york"]
    # corpus: doc0 tokens = 10+4, doc1 = 6 → nu = 20; bigrams nb = 13+5=18
    # c12('new york')=5, c('new')=5, c('york')=5
    expect = math.log((5 / 18) / ((5 / 20) * (5 / 20)))
    assert abs(r["pmi"] - round(expect, 4)) < 1e-9, (r["pmi"], expect)
    assert r["n_cooc"] == 5


# ---- X77-X82 wave (plans/sampling_quality.py) ------------------------------


def test_reservoir_sample_fixed_size_and_stable(spark, sf_dir):
    """k rows per source, and the SAME k rows on a re-run (the panel is
    deterministic, not a random sample)."""
    a = _run("reservoir_sample_per_source", spark, sf_dir)
    b = _run("reservoir_sample_per_source", spark, sf_dir)
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    from collections import Counter

    per_src = Counter(r["source"] for r in a)
    assert all(v <= 20 for v in per_src.values())


def test_fertility_census_sane(spark, sf_dir):
    rows = _run("tokenizer_fertility_by_lang", spark, sf_dir)
    for r in rows:
        assert r["chars_per_token"] > 1  # tokens are words + spaces
        assert r["p50_tokens"] <= r["p95_tokens"]


def test_norm_outliers_bounded(spark, sf_dir):
    rows = _run("vector_norm_outliers", spark, sf_dir)
    for r in rows:
        # Chebyshev: at most 1/9 of any distribution is beyond 3 sigma
        assert r["n_outliers"] <= r["n_vecs"] / 9 + 1, r
        assert r["std_norm"] >= 0 and r["mean_norm"] > 0


def test_dup_inflation_consistent_with_exact_dedup(spark, sf_dir):
    from flink_emqx_connector_spark.session import load_table

    rows = _run("dup_inflation_by_source", spark, sf_dir)
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total
    for r in rows:
        assert r["n_distinct"] <= r["n_docs"]
        assert r["max_copies"] >= 1 and r["inflation"] >= 1.0


def test_cooccurrence_lift_symmetric_bounds(spark, sf_dir):
    rows = _run("event_type_cooccurrence", spark, sf_dir)
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert r["n_both"] >= 1 and r["lift"] > 0


def test_weekday_enrichment_partitions_events(spark, sf_dir):
    from flink_emqx_connector_spark.session import load_table

    rows = _run("events_weekday_enrichment", spark, sf_dir)
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows) == total  # dim covers every day
    weekend = {r["day_name"] for r in rows if r["is_weekend"]}
    assert weekend <= {"Sat", "Sun"}
