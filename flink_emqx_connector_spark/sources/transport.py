"""Message transports behind the EMQX source.

Two implementations with identical at-least-once semantics:

- ``PahoTransport`` — a real MQTT 5 client (paho-mqtt, import-gated since
  the test container doesn't ship it): persistent session, shared
  subscription, manual acks withheld until Spark commits the micro-batch —
  the reference's delivery model (``EMQXSourceReader.java:92-117,168-202``).

- ``SpoolTransport`` — a broker simulated as a spool directory: publishers
  append one file per message; consumption claims messages by
  ``seq % num_partitions``; *ack* deletes the file. Un-acked messages
  survive restarts and are redelivered — the same at-least-once contract,
  fully testable without a broker. Used by the E2E streaming tests that
  mirror the reference's four integration scenarios
  (``EMQXSourceIntegrationTest.java:125-364``).

Messages are dicts: ``{topic, qos, retained, properties, payload(bytes),
timestamp(float epoch)}``.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field


@dataclass
class Message:
    topic: str
    qos: int
    retained: bool
    properties: dict[str, str]
    payload: bytes
    timestamp: float
    seq: int = -1  # spool sequence / per-client arrival counter

    def to_row(self):
        import datetime as dt

        return (
            self.topic,
            self.qos,
            self.retained,
            self.properties,
            self.payload,
            dt.datetime.fromtimestamp(self.timestamp, dt.timezone.utc).replace(
                tzinfo=None
            ),
        )


# --------------------------------------------------------------------------
# Spool transport ("broker as a directory")
# --------------------------------------------------------------------------


class SpoolPublisher:
    """Publisher: one JSON file per message.

    Sequence numbers order the spool (the broker's arrival order); a
    per-publisher token makes filenames unique so CONCURRENT publishers
    (e.g. foreachPartition sink tasks) can never overwrite each other —
    colliding seqs are tolerated by the consumer (same offset position,
    both delivered), matching how a broker serializes racing publishers
    arbitrarily.
    """

    def __init__(self, spool_dir: str):
        import uuid

        self.dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self.token = uuid.uuid4().hex[:8]
        self._n = 0
        seqs = [
            int(f.split("-", 1)[0])
            for f in os.listdir(self.dir)
            if f.endswith(".msg")
        ]
        self._next = (max(seqs) + 1) if seqs else 0

    def publish(
        self,
        topic: str,
        payload: bytes,
        qos: int = 1,
        retained: bool = False,
        properties: dict[str, str] | None = None,
    ) -> int:
        seq = self._next
        self._next += 1
        rec = {
            "topic": topic,
            "qos": qos,
            "retained": retained,
            "properties": properties or {},
            "payload_hex": payload.hex(),
            "timestamp": time.time(),
        }
        tmp = os.path.join(self.dir, f".{seq:012d}-{self.token}.tmp")
        dst = os.path.join(self.dir, f"{seq:012d}-{self.token}-{self._n}.msg")
        self._n += 1
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.rename(tmp, dst)  # atomic publish
        return seq


class SpoolTransport:
    """Consumer view of the spool directory.

    Offsets are ``{"seq": n}`` — messages with seq < n are part of committed
    or in-flight batches. ``ack_upto`` deletes files below the committed
    offset, exactly like broker PUBACKs on checkpoint completion
    (``EMQXSourceReader.java:182-202``). Crash before commit → files remain
    → redelivery on restart.
    """

    def __init__(self, spool_dir: str):
        self.dir = spool_dir

    def _files(self) -> list[tuple[int, str]]:
        if not os.path.isdir(self.dir):
            return []  # broker "offline"/not yet started — tolerated (ST6)
        out = []
        for f in os.listdir(self.dir):
            if f.endswith(".msg"):
                out.append((int(f.split("-", 1)[0]), os.path.join(self.dir, f)))
        return sorted(out)

    def latest_seq(self) -> int:
        files = self._files()
        return files[-1][0] + 1 if files else 0

    def read_range(
        self, start: int, end: int, partition_id: int, num_partitions: int
    ) -> list[Message]:
        """Messages in [start, end) claimed by this partition — the spool
        analogue of the broker's shared-subscription load balancing
        (one clientid per partition, EMQXSourceReader.java:103)."""
        out = []
        for seq, path in self._files():
            if start <= seq < end and seq % num_partitions == partition_id:
                try:
                    with open(path) as f:
                        rec = json.load(f)
                except FileNotFoundError:
                    continue  # acked concurrently
                out.append(
                    Message(
                        topic=rec["topic"],
                        qos=rec["qos"],
                        retained=rec["retained"],
                        properties=dict(rec["properties"]),
                        payload=bytes.fromhex(rec["payload_hex"]),
                        timestamp=rec["timestamp"],
                        seq=seq,
                    )
                )
        return out

    def ack_upto(self, end: int) -> int:
        """Delete (ack) every message with seq < end; returns count."""
        n = 0
        for seq, path in self._files():
            if seq < end:
                try:
                    os.remove(path)
                    n += 1
                except FileNotFoundError:
                    pass
        return n


# --------------------------------------------------------------------------
# Paho (real MQTT) transport — import-gated
# --------------------------------------------------------------------------

#: Executor-side client registry: clientid → live transport. Python workers
#: are reused across micro-batches (spark.python.worker.reuse defaults on),
#: so clients outlive batches — the Spark analogue of the reference's
#: long-lived per-subtask reader (EMQXSourceReader.java:34-66). If a worker
#: is recycled, the persistent session + un-acked QoS≥1 redelivery restores
#: the stream (same recovery model as the reference, test
#: EMQXSourceIntegrationTest.java:219-301).
_CLIENTS: dict[str, "PahoTransport"] = {}


def paho_available() -> bool:
    try:
        import paho.mqtt.client  # noqa: F401

        return True
    except ImportError:
        return False


class PahoTransport:
    """One MQTT 5 client with manual acks + persistent session.

    Mirrors the reference reader:
    - ``$share/<group>/<filter>`` subscription (EMQXSourceReader.java:103)
    - ``clean_start=False`` + session expiry (":94-117")
    - auto-reconnect; startable while the broker is down (":92", ST6)
    - callback thread → queue → batch drain (":67-83,146-165", ST7)
    - acks withheld until commit (":168-202", ST2-ST4)
    """

    SESSION_EXPIRY = 300

    def __init__(self, host: str, port: int, clientid: str, topic_filter: str, qos: int, group: str):
        import queue

        self.clientid = clientid
        self.queue: queue.Queue = queue.Queue()
        self.seq = 0
        # batch_id → [mqtt messages awaiting ack] (ST2: snapshot-stamped acks)
        self.pending: dict[int, list] = {}
        self.inflight: list = []
        self._connect(host, port, topic_filter, qos, group)

    def _connect(self, host, port, topic_filter, qos, group):
        import paho.mqtt.client as mqtt
        from paho.mqtt.packettypes import PacketTypes
        from paho.mqtt.properties import Properties

        self._mqtt = mqtt
        cli = mqtt.Client(
            mqtt.CallbackAPIVersion.VERSION2,
            client_id=self.clientid,
            protocol=mqtt.MQTTv5,
            manual_ack=True,
        )
        props = Properties(PacketTypes.CONNECT)
        props.SessionExpiryInterval = self.SESSION_EXPIRY
        sub_topic = f"$share/{group}/{topic_filter}" if group else topic_filter

        def on_connect(client, userdata, flags, reason, properties=None):
            # re-subscribe only when the broker kept no session (ST5)
            if not flags.session_present:
                client.subscribe(sub_topic, qos=qos)

        def on_message(client, userdata, msg):
            self.queue.put((self.seq, msg))
            self.seq += 1

        cli.on_connect = on_connect
        cli.on_message = on_message
        cli.reconnect_delay_set(min_delay=1, max_delay=10)
        try:
            cli.connect(host, port, clean_start=False, properties=props, keepalive=30)
        except OSError:
            # broker offline at start — connect_async + loop retries (ST6)
            cli.connect_async(host, port, clean_start=False, properties=props, keepalive=30)
        cli.loop_start()
        self.client = cli

    def drain(self, batch_id: int, max_records: int, timeout_s: float) -> list[Message]:
        """Drain up to max_records into this batch; retried tasks of the
        same batch re-emit the buffered messages (no loss within a run)."""
        import queue as q

        if batch_id in self.pending:  # task retry → redeliver buffer
            msgs = self.pending[batch_id]
        else:
            msgs = []
            deadline = time.time() + timeout_s
            while len(msgs) < max_records:
                try:
                    msgs.append(self.queue.get(timeout=max(0.0, deadline - time.time())))
                except q.Empty:
                    break
            self.pending[batch_id] = msgs
        out = []
        for seq, m in msgs:
            props = {}
            if getattr(m, "properties", None) is not None:
                for k, v in getattr(m.properties, "UserProperty", []) or []:
                    props[k] = v
            out.append(
                Message(
                    topic=m.topic,
                    qos=m.qos,
                    retained=bool(m.retain),
                    properties=props,
                    payload=bytes(m.payload),
                    timestamp=time.time(),
                    seq=seq,
                )
            )
        return out

    def ack_upto(self, batch_id: int) -> None:
        """Ack every buffered message of batches ≤ batch_id (subsuming
        earlier checkpoints, EMQXSourceReader.java:189-199)."""
        for bid in sorted(b for b in self.pending if b <= batch_id):
            for _seq, m in self.pending.pop(bid):
                try:
                    self.client.ack(m)
                except Exception:
                    pass  # ack after reconnect is impossible; broker redelivers

    @classmethod
    def get(cls, host, port, clientid, topic_filter, qos, group) -> "PahoTransport":
        t = _CLIENTS.get(clientid)
        if t is None:
            t = cls(host, port, clientid, topic_filter, qos, group)
            _CLIENTS[clientid] = t
        return t
