"""Multi-bridge scale-out (sources/bridge.py scale posture, executed):
two ``MqttSpoolBridge`` instances in SEPARATE OS processes
(dev/run_bridge.py), disjoint topic filters, separate spool dirs, one
Spark streaming query over the union — exactly-once counts end-to-end.

This converts the bridge docstring's "one bridge per topic-filter on any
stable host; the spool directory is the handoff point" from a claim into
a proven property: the ingest ceiling of a single bridge process scales
out by adding processes, with no coordination beyond the spool dirs.
"""

import os
import subprocess
import sys
import time
import uuid

import pytest

from flink_emqx_connector_spark.sources.mqtt_wire import (
    CallbackAPIVersion,
    Client,
    EmbeddedBroker,
    MQTTv5,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _wait(predicate, timeout=30.0, step=0.2):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(step)
    return False


@pytest.fixture()
def broker():
    b = EmbeddedBroker().start()
    yield b
    b.stop()


def _spawn_bridge(port, topic, group, cid, spool):
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "dev", "run_bridge.py"),
         "127.0.0.1", str(port), topic, group, cid, spool],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=REPO, text=True,
    )
    return proc


def test_two_bridge_processes_one_query(spark, broker, tmp_path):
    """Disjoint topic filters t/a/# and t/b/#, one bridge process each,
    one streaming query over the UNION of the two spools: every message
    from both filters arrives exactly once (distinct == published; the
    graceful path has no redelivery, so raw == distinct too)."""
    from flink_emqx_connector_spark.sources import register_emqx_source

    spool_a = str(tmp_path / "spool-a")
    spool_b = str(tmp_path / "spool-b")
    pa_ = _spawn_bridge(broker.port, "t/a/#", "ga", "bra", spool_a)
    pb_ = _spawn_bridge(broker.port, "t/b/#", "gb", "brb", spool_b)
    name = f"mb_{uuid.uuid4().hex[:8]}"
    try:
        assert _wait(
            lambda: any(
                cid.startswith("bra-bridge") and s.subs
                for cid, s in broker.sessions.items()
            )
            and any(
                cid.startswith("brb-bridge") and s.subs
                for cid, s in broker.sessions.items()
            ),
            timeout=30,
        ), list(broker.sessions)

        pub = Client(CallbackAPIVersion.VERSION2, protocol=MQTTv5)
        pub.connect("127.0.0.1", broker.port)
        pub.loop_start()
        n = 500
        last = None
        for i in range(n):
            last = pub.publish("t/a/1", b"a%04d" % i, qos=1)
            last = pub.publish("t/b/1", b"b%04d" % i, qos=1)
        last.wait_for_publish()

        register_emqx_source(spark)

        def _read(spool):
            return (
                spark.readStream.format("emqx")
                .option("transport", "spool")
                .option("spool_dir", spool)
                .option("partitions", "2")
                .load()
            )

        union = _read(spool_a).union(_read(spool_b))
        q = (
            union.selectExpr("CAST(payload AS STRING) AS w")
            .groupBy("w")
            .count()
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            def distinct():
                r = spark.sql(f"SELECT count(*) c FROM {name}").head()
                return r["c"] if r else 0

            assert _wait(lambda: distinct() == 2 * n, timeout=60), distinct()
            time.sleep(1.0)
            total = spark.sql(f"SELECT sum(count) s FROM {name}").head()["s"]
            assert total == 2 * n, total  # graceful path: no duplicates at all
            # provenance: both filters contributed fully
            a_cnt = spark.sql(
                f"SELECT count(*) c FROM {name} WHERE w LIKE 'a%'"
            ).head()["c"]
            assert a_cnt == n, a_cnt
        finally:
            q.stop()
        pub.disconnect()
    finally:
        for p in (pa_, pb_):
            p.terminate()
        for p in (pa_, pb_):
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
