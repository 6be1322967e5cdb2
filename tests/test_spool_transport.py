"""Unit tests for the segment-log spool transport (no Spark needed).

Regression coverage for the publisher/frontier interaction: the FRONTIER
file is the only durable record of position once ack GC has collected the
segments it subsumes, so publisher seq recovery must honor it.
"""

import os
import time

from flink_emqx_connector_spark.sources.transport import (
    SpoolPublisher,
    SpoolTransport,
)


def test_publisher_seq_resumes_from_frontier_after_gc(tmp_path):
    """A fresh publisher after full ack+GC must NOT restart below the
    frontier — read_range clamps lo to the frontier, so seqs below it
    would be permanently masked (silent message loss)."""
    spool = str(tmp_path / "spool")
    pub = SpoolPublisher(spool, segment_size=2)
    for i in range(6):
        pub.publish("t/1", str(i).encode())
    pub.close()

    t = SpoolTransport(spool)
    msgs = t.read_range(0, t.latest_seq(), 0, 1)
    assert [m.payload for m in msgs] == [str(i).encode() for i in range(6)]
    t.ack_upto(6)
    # every closed segment is below the frontier → all GC'd
    assert not [f for f in os.listdir(spool) if f.endswith(".seg")]

    pub2 = SpoolPublisher(spool)
    seq = pub2.publish("t/1", b"after-gc")
    pub2.close()
    assert seq == 6  # not 0
    msgs = t.read_range(0, t.latest_seq(), 0, 1)
    assert [m.payload for m in msgs] == [b"after-gc"]


def test_consume_republish_reconsume_pipeline(tmp_path):
    """The long-running consume→ack→publish→consume loop never loses a
    message across publisher incarnations (the sink creates one publisher
    per partition per micro-batch)."""
    spool = str(tmp_path / "spool")
    t = SpoolTransport(spool)
    seen = []
    for round_ in range(5):
        pub = SpoolPublisher(spool, segment_size=2)
        for i in range(3):
            pub.publish("t/1", f"{round_}-{i}".encode())
        pub.close()
        end = t.latest_seq()
        seen.extend(m.payload.decode() for m in t.read_range(0, end, 0, 1))
        t.ack_upto(end)
    assert seen == [f"{r}-{i}" for r in range(5) for i in range(3)]


def test_ack_gc_collects_stale_open_segment(tmp_path):
    """A crashed publisher's .openseg (never rolled) is collected once all
    its seqs are below the frontier AND it has been quiet long enough;
    a recently-written one is left alone (a live publisher may append)."""
    spool = str(tmp_path / "spool")
    pub = SpoolPublisher(spool)
    pub.publish("t/1", b"a")
    pub.publish("t/1", b"b")
    # no close(): simulates a crash leaving an .openseg behind
    open_segs = [f for f in os.listdir(spool) if f.endswith(".openseg")]
    assert len(open_segs) == 1

    t = SpoolTransport(spool)
    t.ack_upto(2)
    # fresh file: NOT collected (quiet-period guard)
    assert [f for f in os.listdir(spool) if f.endswith(".openseg")] == open_segs

    stale = os.path.join(spool, open_segs[0])
    old = time.time() - 3600
    os.utime(stale, (old, old))
    t.ack_upto(2)
    assert not [f for f in os.listdir(spool) if f.endswith(".openseg")]


def test_sink_partition_seals_segments(tmp_path):
    """The sink's per-partition publisher closes (rolls) its segment so
    ack GC can collect it."""
    from flink_emqx_connector_spark.sinks.emqx import _publish_partition

    spool = str(tmp_path / "spool")
    rows = [{"topic": "t/1", "payload": f"m{i}".encode()} for i in range(3)]
    _publish_partition(iter(rows), "spool", spool, "", 0, qos=1)
    files = os.listdir(spool)
    assert not [f for f in files if f.endswith(".openseg")]
    assert [f for f in files if f.endswith(".seg")]
    t = SpoolTransport(spool)
    got = t.read_range(0, t.latest_seq(), 0, 1)
    assert [m.payload for m in got] == [b"m0", b"m1", b"m2"]
    assert t.ack_upto(t.latest_seq()) >= 1
    assert not [f for f in os.listdir(spool) if f.endswith(".seg")]


def test_partition_claims_disjoint_and_complete(tmp_path):
    """Every message in a window is delivered by exactly one of N
    partitions, and each segment file is scanned by exactly one partition
    (read amplification ~1x the log, not Nx)."""
    from unittest import mock

    import flink_emqx_connector_spark.sources.transport as tr

    spool = str(tmp_path / "spool")
    pub = SpoolPublisher(spool, segment_size=16)
    for i in range(200):
        pub.publish("t/1", str(i).encode())
    # leave the last segment open: claims must cover the tail too
    t = SpoolTransport(spool)
    end = t.latest_seq()
    n_parts = 8

    scans = []
    real = tr._scan_segment_seqs

    def counting(path):
        scans.append(path)
        return real(path)

    got = []
    with mock.patch.object(tr, "_scan_segment_seqs", counting):
        for p in range(n_parts):
            got += [m.payload for m in t.read_range(0, end, p, n_parts)]
    assert sorted(got) == sorted(str(i).encode() for i in range(200))
    n_files = len([f for f in os.listdir(spool) if f.endswith((".seg", ".openseg"))])
    # whole-file claims: each file scanned once across ALL partitions
    assert len(scans) == n_files, (len(scans), n_files)


def test_partition_claim_stable_across_roll(tmp_path):
    """Claim ownership must not change when a segment rolls from open to
    closed between two partitions' reads of the same batch window."""
    import flink_emqx_connector_spark.sources.transport as tr

    spool = str(tmp_path / "spool")
    pub = SpoolPublisher(spool, segment_size=1000)  # stays open
    for i in range(20):
        pub.publish("t/1", str(i).encode())
    t = SpoolTransport(spool)
    end = t.latest_seq()
    n_parts = 4
    before = {
        p: [m.seq for m in t.read_range(0, end, p, n_parts)] for p in range(n_parts)
    }
    pub.close()  # roll: .openseg -> .seg
    after = {
        p: [m.seq for m in t.read_range(0, end, p, n_parts)] for p in range(n_parts)
    }
    assert before == after


def test_claims_property_random_schedules():
    """Property: for ANY publisher schedule (message count, segment size,
    roll points, multiple publishers) and ANY partition count, the
    partition claims are a disjoint complete cover of every batch window."""
    import tempfile

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        seg_size=st.integers(min_value=1, max_value=7),
        counts=st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=4),
        n_parts=st.integers(min_value=1, max_value=9),
        close_last=st.booleans(),
        window=st.tuples(
            st.integers(min_value=0, max_value=10),
            st.integers(min_value=0, max_value=60),
        ),
    )
    def check(seg_size, counts, n_parts, close_last, window):
        with tempfile.TemporaryDirectory() as d:
            spool = str(d) + "/s"
            total = 0
            for pi, cnt in enumerate(counts):
                pub = SpoolPublisher(spool, segment_size=seg_size)
                for _ in range(cnt):
                    pub.publish("t/1", str(total).encode())
                    total += 1
                if close_last or pi < len(counts) - 1:
                    pub.close()
            t = SpoolTransport(spool)
            lo, span = window
            hi = min(lo + span, t.latest_seq())
            seen = []
            for p in range(n_parts):
                seen += [m.seq for m in t.read_range(lo, hi, p, n_parts)]
            assert sorted(seen) == list(range(min(lo, hi), hi))

    check()
