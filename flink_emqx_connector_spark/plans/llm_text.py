"""Text-analysis queries over ``documents`` — the LLM-training-pipeline
surface (BASELINE.json north star; not present in the reference, which has
no scalar function library at all — SURVEY.md §2.4).

All hot-path logic is built-in array/string functions (split, transform,
filter, array_distinct) — JVM-side, codegen'd, zero Python. That's the
property that matters at 100 TB: a quality-score pass over a corpus is a
single scan with no shuffle at all.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .registry import register


def _docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


_EN_STOP = ("the", "of", "and", "to", "in", "is", "a")
_ES_STOP = ("el", "la", "de", "que", "y", "los")


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


@register(
    "text_token_stats",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           round(avg(len(string_split(text, ' '))), 4)        AS avg_tokens,
           CAST(min(n_chars) AS BIGINT)                       AS min_chars,
           CAST(max(n_chars) AS BIGINT)                       AS max_chars
    FROM documents
    GROUP BY lang
    """,
    doc="Whitespace token counting + corpus stats per language. Single scan, "
    "one tiny shuffle on lang.",
    tags=("text",),
)
def text_token_stats(spark, sf_dir):
    d = _docs(spark, sf_dir)
    ntok = F.size(F.split(F.col("text"), " "))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(ntok).cast("bigint").alias("total_tokens"),
        F.round(F.avg(ntok), 4).alias("avg_tokens"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


@register(
    "text_quality_scores",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             string_split(text, ' ') AS w,
             length(text)            AS n_char
      FROM documents
    )
    SELECT doc_id,
           CAST(len(w) AS BIGINT)                 AS n_tokens,
           CAST(len(list_distinct(w)) AS BIGINT)  AS n_distinct,
           round(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 4) AS ttr,
           round(CAST(len(list_filter(w, x -> x IN ({_sql_list(_EN_STOP)}))) AS DOUBLE)
                 / len(w), 4)                     AS stopword_ratio,
           round(CAST(n_char - (len(w) - 1) AS DOUBLE) / len(w), 4) AS avg_token_len
    FROM t
    """,
    doc="Per-document quality signals: type-token ratio, stopword ratio, "
    "mean token length — pure array expressions, no UDF, no shuffle.",
    tags=("text", "quality"),
)
def text_quality_scores(spark, sf_dir):
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.split(F.col("text"), " ").alias("w"),
        F.length("text").alias("n_char"),
    )
    n = F.size("w").cast("double")
    stop_arr = F.array(*[F.lit(s) for s in _EN_STOP])
    return d.select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("w")).cast("bigint").alias("n_distinct"),
        F.round(F.size(F.array_distinct("w")) / n, 4).alias("ttr"),
        F.round(
            F.size(F.filter("w", lambda x: F.array_contains(stop_arr, x))) / n, 4
        ).alias("stopword_ratio"),
        F.round((F.col("n_char") - (F.size("w") - 1)).cast("double") / n, 4).alias(
            "avg_token_len"
        ),
    )


@register(
    "lang_id_confusion",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             len(list_filter(string_split(text, ' '),
                             x -> x IN ({_sql_list(_EN_STOP)}))) AS en_votes,
             len(list_filter(string_split(text, ' '),
                             x -> x IN ({_sql_list(_ES_STOP)}))) AS es_votes
      FROM documents
    )
    SELECT lang,
           CASE WHEN en_votes > es_votes THEN 'en'
                WHEN es_votes > en_votes THEN 'es'
                ELSE 'und' END AS pred_lang,
           count(*) AS n
    FROM t
    GROUP BY 1, 2
    """,
    doc="Heuristic language ID (stopword voting) + confusion matrix against "
    "the labeled lang column. The production variant swaps the vote lists "
    "for per-language character n-gram profiles — same plan shape.",
    tags=("text", "langid"),
)
def lang_id_confusion(spark, sf_dir):
    d = _docs(spark, sf_dir)
    w = F.split(F.col("text"), " ")
    en_arr = F.array(*[F.lit(s) for s in _EN_STOP])
    es_arr = F.array(*[F.lit(s) for s in _ES_STOP])
    en_votes = F.size(F.filter(w, lambda x: F.array_contains(en_arr, x)))
    es_votes = F.size(F.filter(w, lambda x: F.array_contains(es_arr, x)))
    pred = (
        F.when(en_votes > es_votes, F.lit("en"))
        .when(es_votes > en_votes, F.lit("es"))
        .otherwise(F.lit("und"))
    )
    return d.select("lang", pred.alias("pred_lang")).groupBy("lang", "pred_lang").agg(
        F.count("*").alias("n")
    )


@register(
    "doc_fingerprint_dupes",
    oracle="""
    SELECT md5(text) AS fp,
           count(*) AS n_copies,
           CAST(min(doc_id) AS BIGINT) AS keeper
    FROM documents
    GROUP BY md5(text)
    HAVING count(*) > 1
    """,
    doc="Content fingerprinting (md5 over the full text) → duplicate "
    "clusters. The shuffle key is the 16-byte digest, not the document — "
    "at 100 TB that's the difference between shuffling hashes and "
    "shuffling the corpus.",
    tags=("text", "dedup"),
)
def doc_fingerprint_dupes(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.select("doc_id", F.md5(F.encode("text", "UTF-8")).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").cast("bigint").alias("keeper"),
        )
        .filter(F.col("n_copies") > 1)
    )


@register(
    "code_switch_docs",
    # Within-document language consistency: stopword-vote each HALF of
    # the token sequence separately and census the (first-half,
    # second-half) prediction pairs — a 'cross' row is a document that
    # switches language midstream (concatenation artifacts, scraped
    # multilingual pages), which one whole-doc language label hides.
    oracle=f"""
    WITH t AS (
      SELECT string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS n
      FROM documents WHERE text IS NOT NULL
    ), halves AS (
      SELECT w[1 : n // 2] AS w1, w[n // 2 + 1 : n] AS w2 FROM t
    ), votes AS (
      SELECT len(list_filter(w1, x -> x IN ({_sql_list(_EN_STOP)}))) AS en1,
             len(list_filter(w1, x -> x IN ({_sql_list(_ES_STOP)}))) AS es1,
             len(list_filter(w2, x -> x IN ({_sql_list(_EN_STOP)}))) AS en2,
             len(list_filter(w2, x -> x IN ({_sql_list(_ES_STOP)}))) AS es2
      FROM halves
    )
    SELECT CASE WHEN en1 > es1 THEN 'en' WHEN es1 > en1 THEN 'es'
                ELSE 'und' END AS pred_first,
           CASE WHEN en2 > es2 THEN 'en' WHEN es2 > en2 THEN 'es'
                ELSE 'und' END AS pred_second,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM votes GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="X138: code-switch detection — language-ID each half of every "
    "document independently (same stopword-vote heuristic as "
    "lang_id_confusion; the production variant swaps in char-n-gram "
    "profiles, same plan shape) and census the prediction pairs. "
    "Off-diagonal mass = documents that switch language midstream: "
    "concatenation artifacts and multilingual scrapes that a whole-doc "
    "label hides and that poison monolingual training mixes. Scale "
    "shape: pure row-local array expressions (split, slice, "
    "list_filter votes) — no UDF, no per-doc shuffle; the only shuffle "
    "is the ≤9-group census with map-side combine.",
    tags=("text", "langid", "quality", "pipeline"),
)
def code_switch_docs(spark, sf_dir):
    d = (
        _docs(spark, sf_dir)
        .filter(F.col("text").isNotNull())
        .select(F.split(F.col("text"), " ").alias("w"))
        .withColumn("n", F.size("w"))
        .selectExpr("slice(w, 1, n div 2) AS w1",
                    "slice(w, n div 2 + 1, n - n div 2) AS w2")
    )
    en_arr = F.array(*[F.lit(s) for s in _EN_STOP])
    es_arr = F.array(*[F.lit(s) for s in _ES_STOP])

    def pred(col):
        en = F.size(F.filter(col, lambda x: F.array_contains(en_arr, x)))
        es = F.size(F.filter(col, lambda x: F.array_contains(es_arr, x)))
        return (
            F.when(en > es, F.lit("en"))
            .when(es > en, F.lit("es"))
            .otherwise(F.lit("und"))
        )

    return (
        d.select(
            pred(F.col("w1")).alias("pred_first"),
            pred(F.col("w2")).alias("pred_second"),
        )
        .groupBy("pred_first", "pred_second")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy("pred_first", "pred_second")
    )
