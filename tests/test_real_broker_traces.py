"""Real-EMQX frame-trace replay against the client/transport legs.

The realbroker suite (tests/test_real_broker.py) has never executed —
no Docker daemon exists in this environment — so the broker double is
the only thing the paho leg has ever talked to. This module narrows
that gap from the other side (VERDICT r7 item 3): scripted servers
replay the frame sequences a real EMQX emits in the scenarios the
double cannot naturally produce, hand-authored from the MQTT 5 spec
(OASIS §3.3.4, §3.14) and EMQX's documented behavior:

- CONNACK carrying ``Receive-Maximum`` → the client must hold its
  un-acked QoS≥1 publishes at the quota (EMQX kills violators with
  DISCONNECT 0x93);
- server-initiated DISCONNECT with reason codes: 0x8E (session taken
  over → the client must CEDE, not reconnect — the takeover ping-pong
  storm), 0x89 (server busy → reconnect with backoff IS correct);
- session-resume redelivery: CONNACK(session_present=1) followed by the
  un-acked backlog as DUP publishes in original order.

Each trace pins BOTH directions: the frames the client sends back
(PUBACK order, reconnect attempts or their absence) and the
client-visible outcome (delivery order, callbacks).
"""

import socket
import struct
import threading
import time

from flink_emqx_connector_spark.sources.mqtt_wire import (
    CONNECT,
    PUBACK,
    PUBLISH,
    RC_SERVER_BUSY,
    RC_SESSION_TAKEN_OVER,
    CallbackAPIVersion,
    Client,
    MQTTv5,
    connack_packet,
    disconnect_packet,
    publish_packet,
    read_packet,
    suback_packet,
)


def _wait(predicate, timeout=15.0, step=0.05):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(step)
    return False


class _TraceServer:
    """One-port scripted server: each accepted connection is handed to
    the next handler in ``handlers`` (so reconnect traces can script the
    second connection differently)."""

    def __init__(self, *handlers):
        self.srv = socket.socket()
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(4)
        self.port = self.srv.getsockname()[1]
        self.handlers = list(handlers)
        self.accepted = 0
        self.errors: list = []
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        for handler in self.handlers:
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            self.accepted += 1
            try:
                handler(conn)
            except Exception as e:  # surfaced by the test's final assert
                self.errors.append(e)
            finally:
                try:
                    conn.close()
                except OSError:
                    pass

    def close(self):
        try:
            self.srv.close()
        except OSError:
            pass


def test_trace_receive_maximum_send_quota():
    """EMQX advertises Receive-Maximum in CONNACK; MQTT-3.3.4-9 requires
    the client to keep its un-acked QoS≥1 publishes at or below it
    (violations draw DISCONNECT 0x93 from the real broker). Trace: quota
    2, acks withheld — the server must observe exactly 2 PUBLISHes, then
    exactly one more per PUBACK it releases."""
    seen = []  # publish mids in arrival order
    phase_counts = []
    done = threading.Event()

    def handler(conn):
        read_packet(conn)  # CONNECT
        conn.sendall(connack_packet(False, receive_maximum=2))
        # phase 1: the client wants to publish 5; quota lets 2 through
        for _ in range(2):
            ptype, _f, body = read_packet(conn)
            assert ptype == PUBLISH, ptype
            (tlen,) = struct.unpack_from(">H", body, 0)
            (mid,) = struct.unpack_from(">H", body, 2 + tlen)
            seen.append(mid)
        # no third PUBLISH may arrive while the quota is exhausted
        conn.settimeout(0.6)
        try:
            read_packet(conn)
            phase_counts.append("EARLY")  # quota violated
        except (TimeoutError, socket.timeout):
            phase_counts.append("held")
        conn.settimeout(30)
        # release one slot at a time; one more PUBLISH per PUBACK
        for _ in range(3):
            conn.sendall(struct.pack(">BBH", (PUBACK << 4), 2, seen[-1]))
            ptype, _f, body = read_packet(conn)
            assert ptype == PUBLISH, ptype
            (tlen,) = struct.unpack_from(">H", body, 0)
            (mid,) = struct.unpack_from(">H", body, 2 + tlen)
            seen.append(mid)
        # ack the stragglers so the publisher thread unblocks
        for mid in seen[-2:]:
            conn.sendall(struct.pack(">BBH", (PUBACK << 4), 2, mid))
        done.set()
        time.sleep(0.2)

    ts = _TraceServer(handler)
    cli = Client(CallbackAPIVersion.VERSION2, client_id="quota-c", protocol=MQTTv5)
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()

    def publisher():
        for i in range(5):
            cli.publish("t/q", b"m%d" % i, qos=1)

    th = threading.Thread(target=publisher, daemon=True)
    th.start()
    assert _wait(done.is_set, timeout=20), (phase_counts, seen, ts.errors)
    th.join(timeout=5)
    assert phase_counts == ["held"], phase_counts
    assert len(seen) == 5 and len(set(seen)) == 5, seen
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_session_takeover_disconnect_stops_reconnect():
    """EMQX sends DISCONNECT 0x8E (Session taken over) to the old
    connection when a new client claims the clientid. The old client
    must surface the reason and CEDE — a reconnect here takes the
    session back and ping-pongs (measured 34× duplicate delivery in
    round 2). Trace: CONNACK → DISCONNECT 0x8E → close; the server
    then listens for a reconnect that must never come."""
    reasons = []

    def handler(conn):
        read_packet(conn)  # CONNECT
        conn.sendall(connack_packet(False))
        time.sleep(0.1)
        conn.sendall(disconnect_packet(RC_SESSION_TAKEN_OVER))

    # a second handler slot exists purely to detect an illegal reconnect
    ts = _TraceServer(handler, lambda conn: None)
    cli = Client(CallbackAPIVersion.VERSION2, client_id="cede-c", protocol=MQTTv5)
    cli.on_disconnect = lambda c, u, f, reason, p=None: reasons.append(reason)
    cli.reconnect_delay_set(min_delay=0.05, max_delay=0.1)
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()

    assert _wait(lambda: reasons, timeout=10), "on_disconnect never fired"
    assert reasons == [RC_SESSION_TAKEN_OVER], [hex(r) for r in reasons]
    time.sleep(1.0)  # many reconnect periods at 0.05-0.1 s backoff
    assert ts.accepted == 1, "client reconnected after session takeover"
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_server_busy_disconnect_reconnects_with_backoff():
    """DISCONNECT 0x89 (Server busy) is transient per EMQX semantics —
    unlike 0x8E the client SHOULD come back. Trace: first connection gets
    CONNACK → DISCONNECT 0x89; the scripted second connection must see a
    fresh CONNECT and serve it normally."""
    reasons = []
    second_ok = threading.Event()

    def busy(conn):
        read_packet(conn)
        conn.sendall(connack_packet(False))
        time.sleep(0.1)
        conn.sendall(disconnect_packet(RC_SERVER_BUSY))

    def normal(conn):
        ptype, _f, _b = read_packet(conn)
        assert ptype == CONNECT, ptype
        conn.sendall(connack_packet(False))
        second_ok.set()
        time.sleep(0.5)

    ts = _TraceServer(busy, normal)
    cli = Client(CallbackAPIVersion.VERSION2, client_id="busy-c", protocol=MQTTv5)
    cli.on_disconnect = lambda c, u, f, reason, p=None: reasons.append(reason)
    cli.reconnect_delay_set(min_delay=0.05, max_delay=0.2)
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()

    assert _wait(second_ok.is_set, timeout=10), (reasons, ts.errors)
    assert reasons[:1] == [RC_SERVER_BUSY], [hex(r) for r in reasons]
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_session_resume_redelivers_backlog_in_order():
    """Persistent-session resume, the reference's recovery scenario as
    real EMQX plays it: CONNACK(session_present=1) — the client must NOT
    re-subscribe (ST5) — immediately followed by the un-acked backlog as
    DUP publishes in original publish order. The client must deliver
    in order, exactly once each, and PUBACK in the same order."""
    delivered = []
    acked = []
    done = threading.Event()

    def handler(conn):
        read_packet(conn)  # CONNECT (clean_start=False)
        conn.sendall(connack_packet(True))
        # resumed-session backlog: mids 3,4,5 as DUP, original order
        for mid, payload in ((3, b"r3"), (4, b"r4"), (5, b"r5")):
            conn.sendall(publish_packet("t/r", payload, 1, mid, False, True))
        for _ in range(3):
            ptype, _f, body = read_packet(conn)
            assert ptype == PUBACK, ptype
            acked.append(struct.unpack_from(">H", body, 0)[0])
        # MQTT-3.8.4: no SUBSCRIBE may arrive on a resumed session
        conn.settimeout(0.5)
        try:
            ptype, _f, _b = read_packet(conn)
            raise AssertionError(f"unexpected packet after resume: {ptype}")
        except (TimeoutError, socket.timeout):
            pass
        done.set()

    ts = _TraceServer(handler)
    cli = Client(CallbackAPIVersion.VERSION2, client_id="resume-c", protocol=MQTTv5)
    flags_seen = []
    cli.on_connect = lambda c, u, flags, r, p=None: (
        flags_seen.append(flags.session_present),
        None if flags.session_present else c.subscribe("t/#", qos=1),
    )
    cli.on_message = lambda c, u, m: delivered.append(
        (m.mid, bytes(m.payload), m.dup)
    )
    cli.connect("127.0.0.1", ts.port, clean_start=False)
    cli.loop_start()

    assert _wait(done.is_set, timeout=10), (delivered, acked, ts.errors)
    assert flags_seen == [True]
    assert delivered == [(3, b"r3", True), (4, b"r4", True), (5, b"r5", True)]
    assert acked == [3, 4, 5]
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()
