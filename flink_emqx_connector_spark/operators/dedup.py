"""Deduplication operators for LLM training-data pipelines.

Not in the reference (it has no relational surface at all — SURVEY.md §2.4);
these are first-class extensions mandated by BASELINE.json, designed
shuffle-first for 100 TB:

- exact dedup: shuffle 16-byte digests, never the corpus;
- MinHash + LSH: candidate generation by band-bucket join (shuffle is
  |docs|·bands tiny rows), exact-Jaccard verification only on candidates;
- SimHash: 64-bit fingerprint per doc via one Arrow-vectorized pass;
- n-gram Jaccard: exact all-pairs via shingle inverted index (the oracle /
  small-scale path that LSH approximates);
- embedding near-dup: cosine over a blocking key to avoid the quadratic
  cross join.

Determinism: every hash is seed-fixed (murmur3 via ``F.hash`` / md5), so
results are reproducible run-to-run and cluster-to-cluster.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^61-1: modulus for the universal-hash permutations.
_MERSENNE = (1 << 61) - 1


def word_ngrams(col, n: int = 2):
    """Distinct word n-gram shingles of a text column, as an array column.

    Built-ins only: split → sequence → transform — codegen'd end-to-end.
    Guarded for texts shorter than n words (Spark's sequence(1,0) would
    count *down*; we return an empty array instead).
    """
    w = F.split(col, " ")
    if n == 1:
        return F.array_distinct(w)
    joined = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(n)]),
    )
    return F.when(F.size(w) >= n, F.array_distinct(joined)).otherwise(
        F.array().cast("array<string>")
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup keep-list: min id per distinct content digest."""
    return (
        docs.select(F.col(id_col), F.md5(F.encode(text_col, "UTF-8")).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).cast("bigint").alias("keep_id"), F.count("*").alias("n_copies"))
    )


def _shingle_table(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    # Repartition first: the docs table is often a single parquet file →
    # one input partition → everything downstream (explode, join, agg)
    # would run on one task. Spread by id before the expensive expression.
    par = docs.sparkSession.sparkContext.defaultParallelism
    sh = docs.repartition(par, F.col(id_col)).select(
        F.col(id_col).alias("doc"), word_ngrams(F.col(text_col), n).alias("sh")
    )
    return sh


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ threshold via shingle inverted index.

    Plan: explode distinct shingles → self-equi-join on the shingle (this is
    the inverted index; no quadratic cross join) → per-pair intersection
    count → join per-doc sizes → Jaccard filter. At 100 TB the same plan
    works once hot shingles are dropped (document-frequency cap) — LSH
    (``minhash_lsh_pairs``) replaces it when even that is too dense.

    Returns ``doc_a, doc_b, jaccard`` (doc_a < doc_b, jaccard rounded 4).
    """
    sh = _shingle_table(docs, text_col, id_col, n)
    # Carry the set size through the explode so no size-lookup join is
    # needed later, and join on xxhash64 of the shingle, not the string:
    # the self-join moves (8B key, 8B doc, 4B n) rows instead of text
    # (collision odds over a shingle vocabulary are ~|V|²/2⁶⁴ — vanishing).
    ex = sh.select(
        "doc", F.size("sh").alias("n"), F.explode("sh").alias("s")
    ).select("doc", "n", F.xxhash64("s").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return inter.filter(jac >= threshold).select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    )


def _minhash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficients for h_j(x) = (a*x + b) mod p.

    a < 2^29 and x < 2^33 keep a*x + b < 2^63 — no int64 overflow under
    ANSI arithmetic (Spark 4 default).
    """
    out = []
    for j in range(num_hashes):
        d = hashlib.sha256(f"minhash-{seed}-{j}".encode()).digest()
        a = (int.from_bytes(d[:8], "big") % ((1 << 29) - 1)) + 1
        b = int.from_bytes(d[8:16], "big") % (1 << 61)
        out.append((a, b))
    return out


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 32,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc MinHash signature: ``doc, mh0..mh{k-1}``.

    Shingles are hashed JVM-side with murmur3 (``F.hash``, fixed seed), then
    k universal-hash permutations are folded with ``array_min`` — one scan,
    no shuffle until the caller aggregates.
    """
    params = _minhash_params(num_hashes)
    sh = _shingle_table(docs, text_col, id_col, n)
    # murmur3 of each shingle, lifted to non-negative 64-bit
    hashed = sh.select(
        "doc",
        F.transform("sh", lambda s: (F.hash(s).cast("bigint") + F.lit(1 << 32))).alias("hs"),
    )
    cols = [
        F.array_min(
            F.transform("hs", lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE))
        ).alias(f"mh{j}")
        for j, (a, b) in enumerate(params)
    ]
    return hashed.select("doc", *cols)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 16,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs via MinHash banding + exact-Jaccard verification.

    rows-per-band r = num_hashes/bands; a pair with Jaccard s collides in
    ≥1 band with prob 1-(1-s^r)^bands (r=2, b=16 → 0.99 at s=0.5). The
    band join shuffles |docs|·bands short rows — this is the 100 TB path
    where the exact inverted index (``ngram_jaccard_pairs``) gets too
    dense. Candidates are then verified with exact Jaccard, so precision
    is 1.0 and only recall is probabilistic.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, n, text_col, id_col)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.hash(*[F.col(f"mh{bi * r + j}") for j in range(r)]).alias("bh"),
            )
            for bi in range(bands)
        ]
    )
    buckets = sigs.select("doc", F.explode(band_structs).alias("b")).select(
        "doc", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    # Verify candidates only: join each side's shingle set and compute exact
    # Jaccard with array_intersect — O(candidates), not O(pairs).
    sh = _shingle_table(docs, text_col, id_col, n)
    sa = sh.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


_SIMHASH_BITS = 64


_TOKEN_HASH_CACHE: dict[str, int] = {}


def _simhash_one(text: str) -> int:
    """64-bit SimHash over whitespace tokens, md5-based (seed-free,
    deterministic everywhere). Bit voting is numpy-vectorized; per-token
    md5s are memoized (corpora share vocabularies heavily)."""
    import numpy as np

    hs = []
    for tok in text.split(" "):
        h = _TOKEN_HASH_CACHE.get(tok)
        if h is None:
            (h,) = struct.unpack(">Q", hashlib.md5(tok.encode()).digest()[:8])
            _TOKEN_HASH_CACHE[tok] = h
        hs.append(h)
    arr = np.array(hs, dtype=np.uint64)
    # bit i set in fp iff more tokens have bit i set than unset (tie → 0),
    # identical to the per-bit ±1 accumulator formulation
    bits = ((arr[:, None] >> np.arange(64, dtype=np.uint64)) & 1).sum(axis=0)
    fp = 0
    for i in np.nonzero(2 * bits > len(hs))[0]:
        fp |= 1 << int(i)
    # wrap to signed 64-bit for Spark LongType
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def _simhash_batch(texts: pd.Series) -> pd.Series:
    return texts.map(_simhash_one)


def simhash_udf():
    """Arrow-vectorized SimHash UDF (built lazily — pandas_udf needs an
    active SparkSession to parse the return type)."""
    from pyspark.sql import types as T

    return F.pandas_udf(_simhash_batch, T.LongType())


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``doc_id, simhash`` — Arrow-vectorized pandas UDF (the one genuinely
    non-SQL piece: per-token bit voting)."""
    return docs.select(F.col(id_col), simhash_udf()(F.col(text_col)).alias("simhash"))


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key.

    The blocking key (cluster id / LSH bucket) turns the quadratic cross
    join into per-block joins — the only scalable shape. Cosine is computed
    with built-in higher-order functions (zip_with/aggregate), JVM-side.
    """
    v = F.col(f"a.{vec_col}").cast("array<double>")
    w = F.col(f"b.{vec_col}").cast("array<double>")
    dot = F.aggregate(F.zip_with(v, w, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    norm = lambda u: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(u, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    cos = dot / (norm(v) * norm(w))
    a, b = emb.alias("a"), emb.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", F.round("cos_sim", 4).alias("cos_sim"))
    )
