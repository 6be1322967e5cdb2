"""Semantic invariants for the round-8 wave (X87-X89) beyond the oracle
gate: hand-computable fixtures for walk centrality and BM25, a planted
label-noise fixture for 1-NN agreement, and the plan-shape pin for the
probe reservoir."""

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from flink_emqx_connector_spark.plans import QUERIES


def _write_docs(tmp_path, rows):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": ["s"] * len(rows),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    return str(tmp_path)


def test_walk_centrality_k3_clique(spark, tmp_path):
    """Three identical docs form a K3 near-dup clique: degree 2 each;
    h1 = 2, h2 = 4, h3 = 8 for every node (adjacency-cube row sums of
    K3). Isolated docs must not appear."""
    text = " ".join(f"w{i}" for i in range(12))
    rows = [(0, text), (1, text), (2, text),
            (9, " ".join(f"z{i}" for i in range(12)))]
    sf = _write_docs(tmp_path, rows)
    got = {
        r.doc: (r.walks3, r.degree)
        for r in QUERIES["dedup_graph_walk_centrality"].spark(spark, sf).collect()
    }
    assert got == {0: (8, 2), 1: (8, 2), 2: (8, 2)}, got


def _bm25_reference(docs, k1=1.2, b=0.75, n_qterms=3):
    """Independent Python BM25 (micro-unit form) for fixture docs."""
    toks = {d: t.split(" ") for d, t in docs}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    counts: dict = {}
    for t in toks.values():
        for w in t:
            if len(w) >= 3:
                counts[w] = counts.get(w, 0) + 1
    q = [w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))][
        :n_qterms
    ]
    out = {}
    for d, t in toks.items():
        micro = 0
        matched = 0
        for w in q:
            tf = t.count(w)
            if not tf:
                continue
            matched += 1
            df = sum(1 for tt in toks.values() if w in tt)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            c = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * len(t) / avgdl))
            micro += math.floor(c * 1e6 + 0.5)
        if matched:
            out[d] = (micro, matched)
    return out


def test_bm25_matches_independent_reference(spark, tmp_path):
    """BM25 scores agree with an independently-written reference
    implementation on a fixture with repeated terms, partial matches,
    and varying document lengths."""
    rows = [
        (0, "apple apple banana cherry dd ee"),
        (1, "apple banana banana banana dd"),
        (2, "cherry cherry cherry apple apple apple apple"),
        (3, "dd ee ff gg hh ii jj kk ll mm nn oo pp"),
        (4, "apple"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = {
        r.doc_id: (r.score_micro, r.n_terms)
        for r in QUERIES["bm25_search_topk"].spark(spark, sf).collect()
    }
    assert got == _bm25_reference(rows), got


def test_knn_label_agreement_detects_planted_noise(spark, tmp_path):
    """Two well-separated clusters → agreement 1.0 per label; one
    deliberately mislabeled vector drags its (false) label's agreement
    down and is itself a disagreeing probe."""
    import numpy as np

    rng_vecs = []
    labels = []
    ids = []
    for i in range(10):  # cluster at e0 → label 0
        v = [0.0] * 8
        v[0] = 1.0
        v[1] = 0.01 * i
        rng_vecs.append(v)
        labels.append(0)
        ids.append(i)
    for i in range(10):  # cluster at e4 → label 1
        v = [0.0] * 8
        v[4] = 1.0
        v[5] = 0.01 * i
        rng_vecs.append(v)
        labels.append(1)
        ids.append(10 + i)
    # planted noise: geometrically in cluster 0, labeled 1
    v = [0.0] * 8
    v[0] = 1.0
    v[1] = 0.05
    rng_vecs.append(v)
    labels.append(1)
    ids.append(99)
    norm = [list(np.array(v) / np.linalg.norm(v)) for v in rng_vecs]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "label": pa.array(labels, pa.int32()),
                "embedding": pa.array(norm, pa.list_(pa.float32())),
            }
        ),
        os.path.join(str(tmp_path), "embeddings.parquet"),
    )
    got = {
        r.label: (r.n_probes, r.n_agree)
        for r in QUERIES["knn_label_agreement"].spark(spark, str(tmp_path)).collect()
    }
    # all 21 vectors are probes (panel cap 64). Label 0: every probe's
    # nearest neighbor is in-cluster and labeled 0 → full agreement.
    assert got[0] == (10, 10), got
    # label 1: the planted probe's NN is in cluster 0 (label 0) →
    # exactly one disagreement among its 11 probes.
    assert got[1] == (11, 10), got


def test_knn_probe_reservoir_is_take_ordered(spark, sf_dir):
    """The md5-rank probe draw must compile to TakeOrderedAndProject —
    a global row_number window would funnel the corpus through one task."""
    plan = (
        QUERIES["knn_label_agreement"]
        .spark(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan[:2000]
