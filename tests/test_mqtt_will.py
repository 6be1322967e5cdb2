"""Will-message (LWT) E2E over real sockets: the death-notice leg of the
MQTT 5 surface (``sources/mqtt_wire.py``). The reference connector never
sets a will, but any production bridge deployment watches one — a
monitor/rebalancer subscribed to a status topic learns a reader died
from the BROKER, not from a timeout of its own.

Spec behaviors pinned here (OASIS MQTT 5, §3.1.2.5-7 / §3.1.3.2 / §3.14):
- abnormal network close publishes the will (MQTT-3.1.2-8);
- clean DISCONNECT 0x00 discards it (MQTT-3.14.4-3);
- DISCONNECT 0x04 "Disconnect with Will Message" publishes it;
- Will Delay Interval defers publication, and a session resume inside
  the window cancels it (MQTT-3.1.3-9) — the orderly-failover window;
- keepalive timeout (MQTT-3.1.2-22, the round-10 broker timer) is an
  abnormal close, so a silent client's will fires;
- session takeover publishes the superseded connection's will.
"""

import socket
import struct
import time

import pytest

from flink_emqx_connector_spark.sources.mqtt_wire import (
    CallbackAPIVersion,
    Client,
    EmbeddedBroker,
    MQTTv5,
    Properties,
    connect_packet,
    disconnect_packet,
    read_packet,
)


@pytest.fixture()
def broker():
    b = EmbeddedBroker().start()
    yield b
    b.stop()


def _wait(predicate, timeout=30.0, step=0.05):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(step)
    return False


def _monitor(broker, topic="status/#", client_id="monitor"):
    """Subscriber that records every message on the status topic."""
    got = []
    sub = Client(CallbackAPIVersion.VERSION2, client_id=client_id, protocol=MQTTv5)
    sub.on_connect = lambda c, u, f, r, p=None: c.subscribe(topic, qos=1)
    sub.on_message = lambda c, u, m: got.append(m)
    sub.connect("127.0.0.1", broker.port)
    sub.loop_start()
    assert _wait(
        lambda: broker.sessions.get(client_id) and broker.sessions[client_id].subs
    )
    return sub, got


def _armed_client(broker, cid, delay=0, qos=1, retain=False, payload=b"dead"):
    cli = Client(CallbackAPIVersion.VERSION2, client_id=cid, protocol=MQTTv5)
    props = Properties()
    props.WillDelayInterval = delay
    cli.will_set(f"status/{cid}", payload, qos=qos, retain=retain, properties=props)
    cli.connect("127.0.0.1", broker.port)
    cli.loop_start()
    assert _wait(lambda: broker.sessions.get(cid) is not None)
    return cli


def test_will_published_on_abnormal_close(broker):
    sub, got = _monitor(broker)
    cli = _armed_client(broker, "reader-1")
    # crash: kill the socket without DISCONNECT (the reader-process-died
    # case a supervisor cares about)
    cli._running = False
    cli._close_sock()
    assert _wait(lambda: len(got) == 1)
    assert got[0].topic == "status/reader-1"
    assert got[0].payload == b"dead"
    assert got[0].qos == 1
    sub.disconnect()


def test_no_will_on_clean_disconnect(broker):
    sub, got = _monitor(broker)
    cli = _armed_client(broker, "reader-2")
    cli.disconnect()  # DISCONNECT 0x00: will must be discarded
    # the detach definitely happened once the session shows no live conn
    assert _wait(lambda: broker.sessions["reader-2"].conn is None)
    time.sleep(0.3)
    assert got == []
    sub.disconnect()


def test_disconnect_with_will_reason_0x04_publishes(broker):
    """DISCONNECT 0x04 is the client ASKING for the will to be sent —
    the deliberate hand-off announcement."""
    sub, got = _monitor(broker)
    cli = _armed_client(broker, "reader-3")
    cli._send(disconnect_packet(0x04))
    assert _wait(lambda: len(got) == 1)
    assert got[0].topic == "status/reader-3"
    cli.loop_stop()
    sub.disconnect()


def test_will_delay_cancelled_by_session_resume(broker):
    """MQTT-3.1.3-9: a new network connection to the session inside the
    delay window cancels the will — a respawned bridge that resumes fast
    enough never alarms the monitors."""
    sub, got = _monitor(broker)
    cli = _armed_client(broker, "reader-4", delay=1)
    cli._running = False
    cli._close_sock()  # crash
    assert _wait(lambda: broker.sessions["reader-4"].conn is None)
    # respawn with the same clientid, resuming the session, before 1 s
    cli2 = Client(CallbackAPIVersion.VERSION2, client_id="reader-4", protocol=MQTTv5)
    cli2.connect("127.0.0.1", broker.port, clean_start=False)
    cli2.loop_start()
    assert _wait(lambda: broker.sessions["reader-4"].conn is not None)
    time.sleep(1.5)  # past the delay: the timer must have fired and ceded
    assert got == []
    cli2.disconnect()
    sub.disconnect()


def test_will_delay_fires_without_resume(broker):
    sub, got = _monitor(broker)
    cli = _armed_client(broker, "reader-5", delay=1)
    crashed_at = time.monotonic()
    cli._running = False
    cli._close_sock()
    assert _wait(lambda: len(got) == 1, timeout=10.0)
    assert time.monotonic() - crashed_at >= 0.9  # held for the delay
    assert got[0].topic == "status/reader-5"
    sub.disconnect()


def test_keepalive_timeout_publishes_will(broker):
    """A half-open/hung client (no PINGREQ) is closed by the broker at
    1.5x keepalive — an abnormal close, so its will fires. This is the
    exact signal chain a monitor relies on: hung reader -> broker
    keepalive timer -> will on the status topic."""
    sub, got = _monitor(broker)
    # raw socket client: CONNECT with keepalive=1 and a will, then silence
    raw = socket.create_connection(("127.0.0.1", broker.port), timeout=5)
    raw.sendall(
        connect_packet(
            "reader-6", True, 1, None, will=("status/reader-6", b"hung", 1, False, 0)
        )
    )
    ptype, _flags, _body = read_packet(raw)
    assert ptype == 2  # CONNACK
    assert _wait(lambda: len(got) == 1, timeout=10.0)  # ~1.5 s later
    assert got[0].payload == b"hung"
    raw.close()
    sub.disconnect()


def test_takeover_publishes_old_connections_will(broker):
    """Session takeover closes the old connection abnormally (DISCONNECT
    0x8E from the broker, not a clean client 0x00) — its will fires; the
    new connection's own will stays armed."""
    sub, got = _monitor(broker)
    old = _armed_client(broker, "reader-7", payload=b"superseded")
    new = _armed_client(broker, "reader-7", payload=b"new-owner")
    assert _wait(lambda: len(got) == 1)
    assert got[0].payload == b"superseded"
    new.disconnect()  # clean: the new connection's will is discarded
    time.sleep(0.3)
    assert len(got) == 1
    old.loop_stop()
    sub.disconnect()


def test_connect_packet_will_fields_roundtrip(broker):
    """Wire-level: will flag/QoS/retain bits and the length-prefixed will
    payload parse back into the broker's armed-will tuple, including the
    Will Delay Interval property."""
    raw = socket.create_connection(("127.0.0.1", broker.port), timeout=5)
    raw.sendall(
        connect_packet(
            "wire-cli", True, 30, None,
            will=("s/w", b"\x00\x01bin", 2, True, 7),
        )
    )
    ptype, _f, _b = read_packet(raw)
    assert ptype == 2
    assert _wait(lambda: broker.sessions.get("wire-cli") is not None)
    conn = broker.sessions["wire-cli"].conn
    assert conn.will == ("s/w", b"\x00\x01bin", 2, True, 7)
    # clean DISCONNECT clears it before detach
    raw.sendall(disconnect_packet(0x00))
    assert _wait(lambda: broker.sessions["wire-cli"].conn is None)
    assert conn.will is None
    raw.close()


def test_bridge_status_wills_lifecycle(broker, tmp_path):
    """Bridge liveness telemetry (status_topic): members publish retained
    'online' on connect; a crashed member's retained WILL flips its
    record to 'dead' (visible to a LATE monitor via the retained
    snapshot); graceful scale-in and stop write 'offline' explicitly
    (a clean DISCONNECT discards the will)."""
    from flink_emqx_connector_spark.sources.bridge import MqttSpoolBridge

    bridge = MqttSpoolBridge(
        "127.0.0.1", broker.port, "t/st/#", group="g", clientid="st",
        spool_dir=str(tmp_path / "spool"), qos=1, members=2,
        status_topic="bridge-status",
    )
    try:
        names = ["st-bridge-0", "st-bridge-1"]
        assert _wait(lambda: all(
            broker.retained.get(f"bridge-status/{n}", (None,))[0] == b"online"
            for n in names
        ))
        # graceful scale-in -> explicit retained "offline" for the leaver
        bridge.scale_to(1, drain_s=0.2)
        assert _wait(
            lambda: broker.retained["bridge-status/st-bridge-1"][0]
            == b"offline"
        )
        assert broker.retained["bridge-status/st-bridge-0"][0] == b"online"
        # crash the survivor (watchdog off first so it can't self-heal
        # before the assertion): retained will flips the record to "dead"
        bridge._stopped.set()
        cli = bridge._clients[0]
        cli._running = False
        cli._close_sock()
        assert _wait(
            lambda: broker.retained["bridge-status/st-bridge-0"][0] == b"dead"
        )
        # a LATE monitor learns both states from the retained snapshot
        got = {}
        mon = Client(
            CallbackAPIVersion.VERSION2, client_id="late-mon", protocol=MQTTv5
        )
        mon.on_connect = lambda c, u, f, r, p=None: c.subscribe(
            "bridge-status/#", qos=1
        )
        mon.on_message = lambda c, u, m: got.__setitem__(
            m.topic, bytes(m.payload)
        )
        mon.connect("127.0.0.1", broker.port)
        mon.loop_start()
        assert _wait(lambda: len(got) == 2)
        assert got == {
            "bridge-status/st-bridge-0": b"dead",
            "bridge-status/st-bridge-1": b"offline",
        }
        mon.disconnect()
    finally:
        bridge.stop()


def test_stale_will_not_published_after_resume_then_clean_disconnect(broker):
    """ADVICE r10 #1: crash → resume within the delay → CLEAN disconnect.
    The resume removes the will from session state (MQTT-3.1.3-9) — the
    pre-fix lazy `conn is not None` check at timer fire let the stale
    will publish after the clean disconnect ('dead' after an orderly
    shutdown, the exact false alarm the delay window exists to avoid)."""
    sub, got = _monitor(broker)
    cli = _armed_client(broker, "reader-10", delay=1)
    cli._running = False
    cli._close_sock()  # crash: will armed, 1 s fuse
    assert _wait(lambda: broker.sessions["reader-10"].conn is None)
    # respawn resumes the session well inside the window...
    cli2 = Client(CallbackAPIVersion.VERSION2, client_id="reader-10", protocol=MQTTv5)
    cli2.connect("127.0.0.1", broker.port, clean_start=False)
    cli2.loop_start()
    assert _wait(lambda: broker.sessions["reader-10"].conn is not None)
    # ...then shuts down CLEANLY before the fuse burns down
    cli2.disconnect()
    cli2.loop_stop()
    assert _wait(lambda: broker.sessions["reader-10"].conn is None)
    time.sleep(1.5)  # past the original fuse: the stale timer must no-op
    assert got == [], [(m.topic, m.payload) for m in got]
    sub.disconnect()


def test_second_crash_rearms_will_with_fresh_delay(broker):
    """ADVICE r10 #1 second leg: crash → resume → crash AGAIN inside the
    first fuse. The second crash owns the pending will; the FIRST timer
    firing at its original deadline must not publish the new will early
    (stamp guard, like _expire_session's last_detach)."""
    sub, got = _monitor(broker)
    cli = _armed_client(broker, "reader-11", delay=1)
    cli._running = False
    cli._close_sock()  # first crash at t=0, fuse ends t=1.0
    assert _wait(lambda: broker.sessions["reader-11"].conn is None)
    # resume (clean_start=False — a clean start would END the session and
    # correctly publish the pending will immediately) with a fresh will
    cli2 = Client(CallbackAPIVersion.VERSION2, client_id="reader-11", protocol=MQTTv5)
    props = Properties()
    props.WillDelayInterval = 1
    cli2.will_set("status/reader-11", b"dead", qos=1, properties=props)
    cli2.connect("127.0.0.1", broker.port, clean_start=False)
    cli2.loop_start()
    assert _wait(lambda: broker.sessions["reader-11"].conn is not None)
    second_crash = time.monotonic()
    cli2._running = False
    cli2._close_sock()  # second crash; its own fuse ends ≈ t=1.1
    assert _wait(lambda: len(got) == 1, timeout=10.0)
    held = time.monotonic() - second_crash
    assert held >= 0.9, f"will fired {held:.2f}s after the second crash (early)"
    assert got[0].topic == "status/reader-11"
    time.sleep(0.5)
    assert len(got) == 1, "will published twice"
    sub.disconnect()


def test_clean_start_reconnect_publishes_pending_will(broker):
    """§3.1.2.5: session END beats the Will Delay. A clean-start CONNECT
    with the same clientid discards (ends) the detached session, so its
    pending delayed will publishes immediately — not cancelled, not
    deferred to the fuse."""
    sub, got = _monitor(broker)
    cli = _armed_client(broker, "reader-12", delay=5)
    cli._running = False
    cli._close_sock()  # crash: 5 s fuse
    assert _wait(lambda: broker.sessions["reader-12"].conn is None)
    t0 = time.monotonic()
    cli2 = Client(CallbackAPIVersion.VERSION2, client_id="reader-12", protocol=MQTTv5)
    cli2.connect("127.0.0.1", broker.port, clean_start=True)  # ends old session
    cli2.loop_start()
    assert _wait(lambda: len(got) == 1, timeout=5.0), "will not published at session end"
    assert time.monotonic() - t0 < 4.0  # long before the 5 s fuse
    assert got[0].topic == "status/reader-12"
    cli2.disconnect()
    sub.disconnect()


def test_expiry_zero_session_end_publishes_delayed_will_immediately(broker):
    """§3.1.2.11 + §3.1.2.5: Session Expiry 0 means the session ends WITH
    the network connection — so an abnormal close publishes the will at
    once, ignoring a longer Will Delay (the session the delay belongs to
    no longer exists)."""
    sub, got = _monitor(broker)
    cli = Client(CallbackAPIVersion.VERSION2, client_id="reader-13", protocol=MQTTv5)
    wprops = Properties()
    wprops.WillDelayInterval = 5
    cli.will_set("status/reader-13", b"dead", qos=1, properties=wprops)
    cprops = Properties()
    cprops.SessionExpiryInterval = 0
    cli.connect("127.0.0.1", broker.port, properties=cprops)
    cli.loop_start()
    assert _wait(lambda: broker.sessions.get("reader-13") is not None)
    t0 = time.monotonic()
    cli._running = False
    cli._close_sock()  # crash
    assert _wait(lambda: len(got) == 1, timeout=5.0), "will not published"
    assert time.monotonic() - t0 < 4.0  # immediately, not after the 5 s fuse
    assert got[0].topic == "status/reader-13"
    sub.disconnect()
