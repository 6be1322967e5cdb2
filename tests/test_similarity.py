"""Similarity-search operator properties: LSH recall vs brute force, and
the multimodal stubs."""

import pytest

from flink_emqx_connector_spark.operators import similarity as S


def _emb(spark, sf_dir):
    from flink_emqx_connector_spark.session import load_table

    return load_table(spark, sf_dir, "embeddings")


def _query(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    from pyspark.sql import functions as F

    row = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    return [float(x) for x in row[0]]


def test_bruteforce_topk_deterministic(spark, sf_dir):
    q = _query(spark, sf_dir)
    a = S.cosine_topk(_emb(spark, sf_dir), q, k=5, exclude_id=0).collect()
    b = S.cosine_topk(_emb(spark, sf_dir), q, k=5, exclude_id=0).collect()
    assert [(r.vec_id, r.cos_sim) for r in a] == [(r.vec_id, r.cos_sim) for r in b]
    # self-similarity excluded; scores sorted descending
    sims = [r.cos_sim for r in a]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in sims)


def test_lsh_topk_results_in_bruteforce_ranking(spark, sf_dir):
    """Every LSH hit must carry the same score the exact scorer assigns
    (LSH only restricts candidates; it never changes scores)."""
    q = _query(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    brute = {r.vec_id: r.cos_sim for r in S.cosine_topk(emb, q, k=500, exclude_id=0).collect()}
    lsh = S.rp_lsh_topk(emb, q, k=10, exclude_id=0).collect()
    assert len(lsh) > 0
    for r in lsh:
        assert r.vec_id in brute
        assert brute[r.vec_id] == pytest.approx(r.cos_sim, abs=1e-9)


def test_bucket_determinism(spark, sf_dir):
    b1 = {r.vec_id: r.bucket for r in S.rp_lsh_buckets(_emb(spark, sf_dir)).collect()}
    b2 = {r.vec_id: r.bucket for r in S.rp_lsh_buckets(_emb(spark, sf_dir)).collect()}
    assert b1 == b2
    assert all(len(v) == 8 and set(v) <= {"0", "1"} for v in b1.values())


def test_null_embeddings_excluded_not_fatal(spark):
    """NULL embedding rows (failed featurization upstream) are excluded
    from scoring/bucketing rather than crashing the kernels."""
    from pyspark.sql import types as T

    from flink_emqx_connector_spark.operators import similarity as S

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(
        [(1, None), (2, [1.0, 0.0]), (3, [0.9, 0.1])], schema
    )
    got = [r.vec_id for r in S.cosine_topk(df, [1.0, 0.0], k=3).collect()]
    assert got == [2, 3]
    buckets = S.rp_lsh_buckets(df, n_planes=4, dim=2).collect()
    assert {r.vec_id for r in buckets} == {2, 3}


def test_multimodal_decode_stub_raises():
    from flink_emqx_connector_spark.operators.multimodal import decode_image_stub

    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG")


def test_auto_n_planes_bounds_bucket_occupancy():
    """Occupancy-targeted plane count keeps expected in-bucket pair work
    linear: n/2^planes stays <= target at every probed corpus size, and
    the count GROWS as data grows (a fixed plane count would not)."""
    from flink_emqx_connector_spark.operators.similarity import auto_n_planes

    prev = 0
    for n in (1_000, 20_000, 200_000, 2_000_000, 200_000_000):
        p = auto_n_planes(n, target_occupancy=64)
        assert n / (2**p) <= 64, (n, p)
        assert p >= prev  # monotone in corpus size
        prev = p
    assert auto_n_planes(100) == 8  # floor: never fewer than the demo's 8


def test_decode_images_fallback_is_deterministic(spark, sf_dir):
    """Without PIL the optional-import decode must run the SAME operator
    (schema, batching) with real_decode=False and stable byte-derived
    values — the codec-less-environment contract (VERDICT r8 item 7)."""
    from flink_emqx_connector_spark.operators import multimodal as M
    from flink_emqx_connector_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = M.attach_media_columns(docs)
    out1 = {r.doc_id: r for r in M.decode_images(media).collect()}
    out2 = {r.doc_id: r for r in M.decode_images(media).collect()}
    assert len(out1) == 20
    for did, r in out1.items():
        assert r.real_decode == M.media_decode_available()
        r2 = out2[did]
        assert (r.width, r.height, r.mode, r.mean_lum_milli) == (
            r2.width, r2.height, r2.mode, r2.mean_lum_milli
        )
        if not r.real_decode:
            assert (r.width, r.height, r.mode) == (-1, -1, "stub")
            assert 0 <= r.mean_lum_milli < 256_000


@pytest.mark.skipif(
    __import__("importlib.util", fromlist=["util"]).find_spec("PIL") is None,
    reason="PIL not installed — fallback test covers this environment",
)
def test_decode_images_real_path_decodes_pixels(spark):
    """With PIL present the same operator must REALLY decode: a
    synthesized 2x2 PNG has known dimensions and exact mean luminance."""
    import io

    import numpy as np
    from PIL import Image

    from flink_emqx_connector_spark.operators import multimodal as M

    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    arr[0, 0] = 255  # one white pixel of twelve channel-values
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    png = buf.getvalue()

    df = spark.createDataFrame([(1, bytearray(png))], "doc_id bigint, payload binary")
    [r] = M.decode_images(df).collect()
    assert r.real_decode is True
    assert (r.width, r.height, r.mode) == (2, 2, "RGB")
    assert r.mean_lum_milli == (255 * 3) * 1000 // 12


def test_knn_prefix_len_matches_auto_n_planes_policy():
    """The registry's integer indicator-sum prefix length (r10) must be
    exactly clamp(auto_n_planes(n, 64), 8, 16) — the same occupancy
    policy, just in a form both engines compute with pure integer
    arithmetic. Pin across the whole regime incl. exact powers of two
    (where float log2 is the edge the indicator form exists to avoid)."""
    import math

    from flink_emqx_connector_spark.operators.similarity import auto_n_planes
    from flink_emqx_connector_spark.plans.similarity import (
        _KNN_MAX_PLANES,
        _KNN_MIN_PLANES,
        _knn_prefix_len,
    )

    for n in [1, 100, 500, 2000, 16384, 16385, 20000, 32768, 32769,
              200000, 2**20, 2**20 + 1, 64 * 2**16, 10**8]:
        expect = min(
            max(auto_n_planes(n, target_occupancy=64), _KNN_MIN_PLANES),
            _KNN_MAX_PLANES,
        )
        assert _knn_prefix_len(n) == expect, (n, _knn_prefix_len(n), expect)
        assert _KNN_MIN_PLANES <= _knn_prefix_len(n) <= _KNN_MAX_PLANES


def test_audio_windows_pad_branch_and_exact_math(spark):
    """audio_windows: a clip shorter than one window yields exactly one
    (padded) window starting at 0; a clip of exactly one window yields
    one; longer clips follow (n - win)//hop + 1 with integer-exact
    duration. The registry query never exercises the pad branch (clips
    are >= 1 s by construction) — this test does."""
    from flink_emqx_connector_spark.operators.multimodal import audio_windows

    rows = [
        (1, 16000, 4000),    # 0.25 s < 0.5 s window → 1 padded window
        (2, 16000, 8000),    # exactly one window
        (3, 16000, 16000),   # 1 s → (16000-8000)//4000+1 = 3
        (4, 8000, 8000 * 7 + 123),  # non-aligned tail
    ]
    df = spark.createDataFrame(rows, "doc_id long, sample_rate long, n_samples long")
    out = {r["doc_id"]: r.asDict() for r in audio_windows(df).collect()}
    assert out[1]["n_windows"] == 1 and out[1]["last_window_start"] == 0
    assert out[2]["n_windows"] == 1 and out[2]["last_window_start"] == 0
    assert out[3]["n_windows"] == 3 and out[3]["last_window_start"] == 8000
    n, win, hop = 8000 * 7 + 123, 4000, 2000
    assert out[4]["n_windows"] == (n - win) // hop + 1
    assert out[4]["duration_ms"] == n * 1000 // 8000
    assert out[4]["pcm_bytes"] == n * 2
