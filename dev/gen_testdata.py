"""Deterministic synthetic-table generator for CI and local dev.

Reproduces the SHAPE and the load-bearing invariants of the
driver-generated tables (TESTDATA.md) so the full oracle gate
(plans/check.py) passes on self-generated data:

- ``events.props`` is ``{"k": <int>}`` (the decode family discriminates on
  the ``k`` key), ``value`` has 2 decimals (double→VARCHAR reprs agree
  across engines), ``ts`` is TIMESTAMP(NANOS) but micro-aligned
  (exercises the nanosAsLong read path without ns-truncation edges);
- ids (``doc_id``, ``vec_id``) start at 0 — several queries use id 0 as a
  probe row;
- ``embeddings.embedding`` is FLOAT[64], labels 0-9;
- ``p_name`` is exactly two words;
- timestamps: orders/lineitem are midnight-aligned 1995-2001, events span
  ~1 month of 2024.

Values are NOT the driver's values — the oracle gate compares Spark vs
DuckDB on the same files, so any deterministic dataset with these
invariants works.

Usage: python dev/gen_testdata.py <out_dir> <sf> [table,table,...]

The optional third argument restricts generation to a comma-separated
subset of tables (e.g. ``documents,embeddings`` for a dedup-family scale
probe at a large sf without paying for a 60M-row lineitem).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
FLAGS = ["A", "N", "R"]
BRANDS = [f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)]
TYPES = [
    f"{a} {b} {c}"
    for a in ("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
    for b in ("ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED")
    for c in ("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")
]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "de", "fr", "es", "zh", "pt", "it", "nl"]
ADJS = ["cold", "small", "large", "hot", "dark", "light", "quick", "slow"]
NOUNS = ["widget", "bolt", "gear", "panel", "valve", "frame", "wheel", "pipe"]
WORDS = [
    "data", "spark", "stream", "query", "join", "window", "shuffle",
    "broker", "topic", "message", "engine", "batch", "state", "vector",
    "token", "model", "train", "corpus", "filter", "scale", "plan",
    "index", "hash", "band", "bucket", "merge", "sort", "scan", "agg",
    "emit", "ack", "offset", "spool", "bridge", "codec", "schema",
]


def _midnight_ts(rng: np.random.Generator, n: int, start: str, days: int) -> pa.Array:
    base = np.datetime64(start, "D").astype("int64")
    d = (base + rng.integers(0, days, n)).astype("datetime64[D]")
    return pa.array(d.astype("datetime64[us]"), type=pa.timestamp("us"))


def _event_ts_ns(
    rng: np.random.Generator, n: int, span_days: int = 30
) -> pa.Array:
    # nanosecond physical type, micro-aligned values: the nanosAsLong read
    # path is exercised, truncation edge cases are not data-dependent.
    # span_days defaults to the original 30 (all recorded gates/oracles);
    # a larger span answers the "density vs history" question — the
    # events-family robustness gate runs the SAME oracles on a 365-day
    # corpus (the windows see 12x more distinct days, gapfill a sparser
    # grid, retention cohorts a longer horizon).
    base = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    span_us = span_days * 24 * 3600 * 10**6
    us = base + rng.integers(0, span_us, n)
    return pa.array((us * 1000).astype("datetime64[ns]"), type=pa.timestamp("ns"))


def _doc_vocab(n_doc: int) -> np.ndarray:
    """Heaps-law-ish vocabulary growth: |V| ~ corpus_size^0.55.

    A fixed small vocabulary makes every doc pair share bigrams, which
    turns the exact-Jaccard pair generation (and its DuckDB oracle) into
    all-pairs work at sf >= 1 — unrealistic for real corpora and
    quadratic for the scale gate. With vocabulary growth, per-bigram
    document frequency stays bounded as the corpus scales, matching the
    sparsity the inverted-index/LSH plans are designed around.
    """
    v = max(2000, int(8 * n_doc**0.55))
    return np.array(WORDS + [f"w{i:05d}" for i in range(v)])


def _doc_text(rng: np.random.Generator, vocab: np.ndarray) -> str:
    n = int(rng.integers(10, 100))
    return " ".join(rng.choice(vocab, n))


def generate(
    out_dir: str,
    sf: float,
    seed: int = 42,
    tables: set[str] | None = None,
    event_span_days: int = 30,
) -> None:
    # Guard against CLI flags parsed as an output dir (a '--help' corpus
    # was once committed this way, round-12 commit 357bf7c).
    if os.path.basename(os.path.normpath(out_dir)).startswith("-"):
        raise ValueError(
            f"refusing flag-like out_dir {out_dir!r}; pass a real directory"
        )
    os.makedirs(out_dir, exist_ok=True)

    n_li = max(int(6_000_000 * sf), 600)
    n_ord = n_li // 4
    n_cust = max(n_ord // 10, 30)
    n_supp = max(int(10_000 * sf), 5)
    n_part = max(int(200_000 * sf), 40)
    n_ev = max(int(1_000_000 * sf), 200)
    n_doc = max(int(50_000 * sf), 500)
    n_vec = max(int(20_000 * sf), 500)

    # Per-table seeded generators: a filtered subset run produces tables
    # byte-identical to a full run (no shared RNG stream to perturb).
    _TABLE_ORDER = [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]

    def _rng_for(name: str) -> np.random.Generator:
        return np.random.default_rng(seed * 1000 + _TABLE_ORDER.index(name))

    def _region() -> pa.Table:
        return pa.table({
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": REGIONS,
        })

    def _nation() -> pa.Table:
        return pa.table({
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": [f"NATION_{i:02d}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        })

    def _customer() -> pa.Table:
        rng = _rng_for("customer")
        return pa.table({
            "c_custkey": pa.array(range(1, n_cust + 1), pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(1, n_cust + 1)],
            "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
            "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
            "c_mktsegment": list(rng.choice(SEGMENTS, n_cust)),
        })

    def _supplier() -> pa.Table:
        rng = _rng_for("supplier")
        return pa.table({
            "s_suppkey": pa.array(range(1, n_supp + 1), pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(1, n_supp + 1)],
            "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
            "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
        })

    def _part() -> pa.Table:
        rng = _rng_for("part")
        return pa.table({
            "p_partkey": pa.array(range(1, n_part + 1), pa.int64()),
            "p_name": [
                f"{a} {b}" for a, b in zip(
                    rng.choice(ADJS, n_part), rng.choice(NOUNS, n_part)
                )
            ],
            "p_brand": list(rng.choice(BRANDS, n_part)),
            "p_type": list(rng.choice(TYPES, n_part)),
            "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
            "p_retailprice": np.round(rng.uniform(900, 2100, n_part), 2),
        })

    def _orders() -> pa.Table:
        rng = _rng_for("orders")
        return pa.table({
            "o_orderkey": pa.array(range(1, n_ord + 1), pa.int64()),
            "o_custkey": pa.array(rng.integers(1, n_cust + 1, n_ord), pa.int64()),
            "o_orderstatus": list(rng.choice(STATUSES, n_ord)),
            "o_totalprice": np.round(rng.uniform(800, 500_000, n_ord), 2),
            "o_orderdate": _midnight_ts(rng, n_ord, "1995-01-01", 2400),
            "o_orderpriority": list(rng.choice(PRIORITIES, n_ord)),
        })

    def _lineitem() -> pa.Table:
        rng = _rng_for("lineitem")
        return pa.table({
            "l_orderkey": pa.array(rng.integers(1, n_ord + 1, n_li), pa.int64()),
            "l_partkey": pa.array(rng.integers(1, n_part + 1, n_li), pa.int64()),
            "l_suppkey": pa.array(rng.integers(1, n_supp + 1, n_li), pa.int64()),
            "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
            "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
            "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
            "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
            "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
            "l_returnflag": list(rng.choice(FLAGS, n_li)),
            "l_linestatus": list(rng.choice(["F", "O"], n_li)),
            "l_shipdate": _midnight_ts(rng, n_li, "1995-01-02", 2500),
        })

    def _events() -> pa.Table:
        rng = _rng_for("events")
        ks = rng.integers(0, 100, n_ev)
        return pa.table({
            "event_id": pa.array(range(1, n_ev + 1), pa.int64()),
            "ts": _event_ts_ns(rng, n_ev, event_span_days),
            "user_id": pa.array(rng.integers(0, max(n_ev // 67, 10), n_ev), pa.int64()),
            "event_type": list(rng.choice(EVENT_TYPES, n_ev, p=[0.5, 0.3, 0.1, 0.05, 0.05])),
            "value": np.round(rng.exponential(50, n_ev) + 0.03, 2),
            "props": ['{"k": %d}' % k for k in ks],
        })

    def _documents() -> pa.Table:
        # mostly-distinct corpus with a small exact-dup + near-dup tail (the
        # dedup family must find a nonzero but bounded answer)
        rng = _rng_for("documents")
        vocab = _doc_vocab(n_doc)
        texts = [_doc_text(rng, vocab) for _ in range(n_doc)]
        for i in range(0, n_doc, 200):
            if i + 1 < n_doc:
                texts[i + 1] = texts[i]  # exact dup
        for i in range(100, n_doc, 400):
            if i + 1 < n_doc:
                texts[i + 1] = texts[i] + " extra"  # near dup
        return pa.table({
            "doc_id": pa.array(range(n_doc), pa.int64()),
            "text": texts,
            "lang": list(rng.choice(LANGS, n_doc, p=[0.4, 0.15, 0.12, 0.1, 0.08, 0.06, 0.05, 0.04])),
            "source": list(rng.choice([f"src{i}" for i in range(20)], n_doc)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        })

    def _embeddings() -> pa.Table:
        rng = _rng_for("embeddings")
        dim = 64
        vecs = rng.normal(0, 1, (n_vec, dim)).astype("float32")
        # Label cardinality scales with the table (bounded ~100-vector
        # cells), mirroring how a real embedding store is blocked — by an
        # IVF cell / cluster id whose COUNT grows with the data, never a
        # fixed 10-value key. A fixed cardinality makes every label-
        # blocked pair plan (and its oracle) quadratic at sf >= 1.
        n_label = max(10, n_vec // 100)
        return pa.table({
            "vec_id": pa.array(range(n_vec), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, n_label, n_vec), pa.int32()),
        })

    builders = {
        "region": _region, "nation": _nation, "customer": _customer,
        "supplier": _supplier, "part": _part, "orders": _orders,
        "lineitem": _lineitem, "events": _events, "documents": _documents,
        "embeddings": _embeddings,
    }
    wanted = [
        t for t in _TABLE_ORDER if tables is None or t in tables
    ]
    unknown = (tables or set()) - set(_TABLE_ORDER)
    if unknown:
        raise SystemExit(f"unknown tables: {sorted(unknown)}")
    for name in wanted:
        # Explicit row groups: pyarrow's default (~1M rows) writes small-
        # but-not-tiny tables as ONE row group, and Spark can only split
        # a parquet scan at row-group boundaries — a 500k-row documents
        # table then scans in a single task regardless of cluster size
        # (measured: the sf10 SimHash scan ran 1-of-30 tasks, 110 s wall
        # at single-thread speed). 64k-row groups restore scan
        # parallelism at every sf this generator produces.
        pq.write_table(
            builders[name](),
            os.path.join(out_dir, f"{name}.parquet"),
            row_group_size=65536,
        )
    print(f"wrote {len(wanted)} tables to {out_dir} (sf={sf}, lineitem={n_li})")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata/sf0.001"
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 0.001
    subset = (
        set(sys.argv[3].split(","))
        if len(sys.argv) > 3 and sys.argv[3]
        else None
    )
    span = int(sys.argv[4]) if len(sys.argv) > 4 else 30
    generate(out, sf, tables=subset, event_span_days=span)
