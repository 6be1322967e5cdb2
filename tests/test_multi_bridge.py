"""Multi-bridge scale-out (sources/bridge.py scale posture, executed):
two ``MqttSpoolBridge`` instances in SEPARATE OS processes
(dev/run_bridge.py), disjoint topic filters, separate spool dirs, one
Spark streaming query over the union — exactly-once counts end-to-end.

This converts the bridge docstring's "one bridge per topic-filter on any
stable host; the spool directory is the handoff point" from a claim into
a proven property: the ingest ceiling of a single bridge process scales
out by adding processes, with no coordination beyond the spool dirs.
"""

import json
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


def _run_union_query_over_cells(spark, broker, tmp_path, letters):
    """N bridge processes with disjoint filters t/<letter>/#, one Spark
    query over the union of their spools; assert exactly-once counts and
    full per-filter provenance. Shared engine for the 2- and 4-cell
    tests."""
    from flink_emqx_connector_spark.sources import register_emqx_source

    spools = {c: str(tmp_path / f"spool-{c}") for c in letters}
    procs = [
        _spawn_bridge(broker.port, f"t/{c}/#", f"g{c}", f"br{c}", spools[c])
        for c in letters
    ]
    name = f"mb_{uuid.uuid4().hex[:8]}"
    try:
        def _all_subscribed():
            return all(
                any(
                    cid.startswith(f"br{c}-bridge") and s.subs
                    for cid, s in broker.sessions.items()
                )
                for c in letters
            )

        assert _wait(_all_subscribed, timeout=30), list(broker.sessions)

        pub = Client(CallbackAPIVersion.VERSION2, protocol=MQTTv5)
        pub.connect("127.0.0.1", broker.port)
        pub.loop_start()
        n = 500
        last = None
        for i in range(n):
            for c in letters:
                last = pub.publish(f"t/{c}/1", b"%s%04d" % (c.encode(), i), qos=1)
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

        union = _read(spools[letters[0]])
        for c in letters[1:]:
            union = union.union(_read(spools[c]))
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

            k = len(letters)
            assert _wait(lambda: distinct() == k * n, timeout=90), distinct()
            time.sleep(1.0)
            total = spark.sql(f"SELECT sum(count) s FROM {name}").head()["s"]
            assert total == k * n, total  # graceful path: no duplicates at all
            # provenance: every filter contributed fully
            for c in letters:
                c_cnt = spark.sql(
                    f"SELECT count(*) c FROM {name} WHERE w LIKE '{c}%'"
                ).head()["c"]
                assert c_cnt == n, (c, c_cnt)
        finally:
            q.stop()
        pub.disconnect()
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()


_KILLED_READER_SCRIPT = """
import json, sys, time
REPO = sys.argv[4]
sys.path.insert(0, REPO)
from pyspark.sql import SparkSession
from flink_emqx_connector_spark.sources import register_emqx_source

spools, n, out_path = sys.argv[1].split(","), int(sys.argv[2]), sys.argv[3]
# local[4,4]: FOUR task attempts — the whole point is surviving a
# SIGKILLed Python worker via task retry + deterministic spool replay
spark = (
    SparkSession.builder.master("local[4,4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("killed-reader")
    .getOrCreate()
)
register_emqx_source(spark)

def _read(spool):
    return (
        spark.readStream.format("emqx")
        .option("transport", "spool")
        .option("spool_dir", spool)
        .option("partitions", "2")
        .option("max_records_per_batch", "200")
        .load()
    )

union = _read(spools[0])
for s in spools[1:]:
    union = union.union(_read(s))
q = (
    union.selectExpr("CAST(payload AS STRING) AS w")
    .groupBy("w")
    .count()
    .writeStream.format("memory")
    .queryName("k")
    .outputMode("complete")
    .start()
)
deadline = time.time() + 150
while time.time() < deadline:
    r = spark.sql("SELECT count(*) c FROM k").head()
    print(json.dumps({"progress": int(r["c"])}), flush=True)
    if r["c"] == n:
        break
    time.sleep(0.5)
time.sleep(1.0)
r = spark.sql("SELECT count(*) c, coalesce(sum(count), 0) s FROM k").head()
with open(out_path, "w") as f:
    json.dump({"distinct": int(r["c"]), "total": int(r["s"])}, f)
q.stop()
spark.stop()
"""


def _proc_table():
    """{pid: (ppid, cmdline)} snapshot from /proc."""
    table = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                ppid = int(f.read().split(")")[-1].split()[1])
            with open(f"/proc/{d}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
        except OSError:
            continue
        table[int(d)] = (ppid, cmd)
    return table


def _worker_pids(root_pid):
    """Executor-side TASK-worker forks that are descendants of root_pid.

    The process taxonomy under a local-mode PySpark driver (observed on
    Spark 4): executor TASK workers — for this query, the spool-partition
    ``read()`` — are forks of ``python -m pyspark.daemon pyspark.worker``,
    while driver-side machinery runs under distinct cmdlines
    (``pyspark.daemon pyspark.sql.worker.create_data_source`` /
    ``plan_data_source_read`` for planning,
    ``pyspark.sql.streaming.python_streaming_source_runner`` for
    latestOffset/commit). Killing the latter is a DRIVER fault —
    a different failure domain than the partition reader this test
    injects — so only forks of the task-worker daemon are returned."""
    table = _proc_table()

    def is_descendant(pid):
        seen = set()
        while pid not in seen and pid in table and pid > 1:
            if pid == root_pid:
                return True
            seen.add(pid)
            pid = table[pid][0]
        return False

    daemons = {
        pid for pid, (_, cmd) in table.items()
        if cmd.rstrip().endswith("pyspark.daemon pyspark.worker")
        and is_descendant(pid)
    }
    return [
        pid for pid, (ppid, _cmd) in table.items() if ppid in daemons
    ]


def test_reader_sigkill_mid_stream_exact_counts(broker, tmp_path):
    """Per-partition recovery probe (VERDICT r7 item 7): SIGKILL the
    Python workers executing the spool readers MID-BATCH and assert the
    final counts are exact — the fault mode the E2E matrix never injected
    (a dead partition reader, not a dead broker connection).

    Why this must hold by design: the spool is a seekable log and a
    micro-batch's offset range is pinned in the WAL before execution, so
    a killed task's retry re-reads the SAME range — the recomputed rows
    are identical and the aggregation state commits once per batch.
    The reader runs in a child process with master=local[4,4] (task
    retries); this test kills its daemon-forked workers while the backlog
    drains and asserts distinct == published AND total == published
    (any duplicate or loss would show in one of the two)."""
    import signal

    letters = ["a", "b"]
    n_per = 1500
    spools = {c: str(tmp_path / f"spool-{c}") for c in letters}
    procs = [
        _spawn_bridge(broker.port, f"t/{c}/#", f"g{c}", f"br{c}", spools[c])
        for c in letters
    ]
    reader = None
    try:
        def _all_subscribed():
            return all(
                any(
                    cid.startswith(f"br{c}-bridge") and s.subs
                    for cid, s in broker.sessions.items()
                )
                for c in letters
            )

        assert _wait(_all_subscribed, timeout=30), list(broker.sessions)

        pub = Client(CallbackAPIVersion.VERSION2, protocol=MQTTv5)
        pub.connect("127.0.0.1", broker.port)
        pub.loop_start()
        last = None
        for i in range(n_per):
            for c in letters:
                last = pub.publish(f"t/{c}/1", b"%s%05d" % (c.encode(), i), qos=1)
        last.wait_for_publish()
        pub.disconnect()

        script = tmp_path / "killed_reader.py"
        script.write_text(_KILLED_READER_SCRIPT)
        out_path = tmp_path / "result.json"
        n_total = len(letters) * n_per
        reader = subprocess.Popen(
            [sys.executable, str(script),
             ",".join(spools[c] for c in letters),
             str(n_total), str(out_path), REPO],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=REPO, text=True,
        )

        # Kill task workers in SPACED BURSTS while the backlog drains:
        # task-worker forks only exist while a batch executes, so waiting
        # for one IS the mid-batch signal. Each burst kills at most one
        # attempt of each in-flight task; the 2 s gap lets the retry
        # (master=local[4,4]) complete before the next burst — a
        # continuous kill loop would murder all four attempts and fail
        # the query, which is the executor-loss-storm failure domain,
        # not the single-reader-death one this test pins.
        killed = 0
        for _burst in range(3):
            appeared = _wait(
                lambda: bool(_worker_pids(reader.pid)), timeout=60, step=0.05
            )
            assert appeared, "no task workers appeared under the reader"
            for pid in _worker_pids(reader.pid):
                try:
                    os.kill(pid, signal.SIGKILL)
                    killed += 1
                except OSError:
                    pass
            time.sleep(2.0)
        assert killed > 0, "fault injection never fired"

        out, _ = reader.communicate(timeout=180)
        assert out_path.exists(), f"reader died without result: {out[-2000:]}"
        result = json.loads(out_path.read_text())
        # exactly-once through the kill storm: nothing lost, nothing doubled
        assert result == {"distinct": n_total, "total": n_total}, result
    finally:
        if reader is not None and reader.poll() is None:
            reader.kill()
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()


def test_two_bridge_processes_one_query(spark, broker, tmp_path):
    """Disjoint topic filters t/a/# and t/b/#, one bridge process each,
    one streaming query over the UNION of the two spools: every message
    from both filters arrives exactly once (distinct == published; the
    graceful path has no redelivery, so raw == distinct too)."""
    _run_union_query_over_cells(spark, broker, tmp_path, ["a", "b"])


def test_four_bridge_processes_one_query(spark, broker, tmp_path):
    """The 4-cell point of the scale-out curve (VERDICT r6 item 4):
    four bridge processes, four disjoint filters, one union query —
    exactly-once still holds with no cross-cell interference."""
    _run_union_query_over_cells(spark, broker, tmp_path, ["a", "b", "c", "d"])
