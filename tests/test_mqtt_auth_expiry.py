"""Username/password auth + session-expiry timers on the embedded broker
(the last two MQTT 5 connection-lifecycle legs): refused CONNECTs create
no session and publish no will; the client CEDES on the permanent 0x86;
sessions with an explicit expiry end at (0) or N seconds after (N>0)
disconnect unless resumed first; property-less clients keep the
documented indefinite persistence."""

import time

import pytest

from flink_emqx_connector_spark.sources.mqtt_wire import (
    CallbackAPIVersion,
    Client,
    EmbeddedBroker,
    MQTTv5,
    Properties,
)


def _wait(predicate, timeout=30.0, step=0.05):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(step)
    return False


@pytest.fixture()
def auth_broker():
    b = EmbeddedBroker(credentials={"bridge": "s3cret"}).start()
    yield b
    b.stop()


@pytest.fixture()
def broker():
    b = EmbeddedBroker().start()
    yield b
    b.stop()


def _connect(broker, cid, username=None, password=None, expiry=None,
             clean_start=True, will=None):
    cli = Client(CallbackAPIVersion.VERSION2, client_id=cid, protocol=MQTTv5)
    if username is not None:
        cli.username_pw_set(username, password)
    if will is not None:
        cli.will_set(*will)
    props = None
    if expiry is not None:
        props = Properties()
        props.SessionExpiryInterval = expiry
    cli.connect("127.0.0.1", broker.port, clean_start=clean_start,
                properties=props)
    cli.loop_start()
    return cli


def test_good_credentials_connect_and_flow(auth_broker):
    got = []
    sub = _connect(auth_broker, "s1", "bridge", "s3cret")
    sub.on_message = lambda c, u, m: got.append(m)
    assert _wait(lambda: auth_broker.sessions.get("s1") is not None)
    sub.subscribe("t/#", qos=1)
    pub = _connect(auth_broker, "p1", "bridge", "s3cret")
    assert _wait(lambda: pub.is_connected())
    pub.publish("t/1", b"ok", qos=1).wait_for_publish()
    assert _wait(lambda: len(got) == 1)
    pub.disconnect(), sub.disconnect()


@pytest.mark.parametrize(
    "username,password",
    [("bridge", "wrong"), ("nobody", "s3cret"), (None, None)],
    ids=["bad-password", "unknown-user", "anonymous"],
)
def test_bad_credentials_refused_and_ceded(auth_broker, username, password):
    """0x86 is permanent: no session, the client's loop stops (no CONNECT
    storm), connect_refused is surfaced for the supervisor."""
    cli = _connect(auth_broker, "bad-1", username, password)
    assert _wait(lambda: cli.connect_refused == 0x86)
    assert "bad-1" not in auth_broker.sessions
    assert _wait(lambda: not cli.is_connected())
    time.sleep(0.3)  # no reconnect attempts re-create a session
    assert "bad-1" not in auth_broker.sessions
    cli.loop_stop()


def test_refused_connect_publishes_no_will(auth_broker):
    """MQTT-3.1.4: a refused CONNECT is not processed further — the will
    from its payload must never fire, even though the connection then
    closes abnormally."""
    mon_got = []
    mon = _connect(auth_broker, "mon", "bridge", "s3cret")
    mon.on_message = lambda c, u, m: mon_got.append(m)
    assert _wait(lambda: auth_broker.sessions.get("mon") is not None)
    mon.subscribe("status/#", qos=1)
    bad = _connect(
        auth_broker, "bad-2", "bridge", "wrong",
        will=("status/bad-2", b"dead", 1),
    )
    assert _wait(lambda: bad.connect_refused == 0x86)
    time.sleep(0.3)
    assert mon_got == []
    bad.loop_stop(), mon.disconnect()


def test_expiry_zero_session_ends_with_connection(broker):
    cli = _connect(broker, "e0", expiry=0)
    assert _wait(lambda: broker.sessions.get("e0") is not None)
    cli.subscribe("t/#", qos=1)
    assert _wait(lambda: broker.sessions["e0"].subs)
    cli.disconnect()
    assert _wait(lambda: "e0" not in broker.sessions)
    # reconnecting resumes nothing
    cli2 = _connect(broker, "e0", expiry=0, clean_start=False)
    assert _wait(lambda: broker.sessions.get("e0") is not None)
    assert broker.sessions["e0"].subs == {}
    cli2.disconnect()


def test_expiry_n_discards_after_n_unless_resumed(broker):
    # crash with expiry=1: session (and its queued backlog) gone ~1 s later
    cli = _connect(broker, "e1", expiry=1)
    assert _wait(lambda: broker.sessions.get("e1") is not None)
    cli.subscribe("t/#", qos=1)
    assert _wait(lambda: broker.sessions["e1"].subs)
    cli._running = False
    cli._close_sock()
    assert _wait(lambda: "e1" not in broker.sessions, timeout=10.0)
    # resume INSIDE the window cancels the expiry
    cli2 = _connect(broker, "e2", expiry=2)
    assert _wait(lambda: broker.sessions.get("e2") is not None)
    cli2._running = False
    cli2._close_sock()
    assert _wait(lambda: broker.sessions["e2"].conn is None)
    cli3 = _connect(broker, "e2", expiry=2, clean_start=False)
    assert _wait(lambda: broker.sessions["e2"].conn is not None)
    time.sleep(2.5)  # past the original window: stale timer must no-op
    assert "e2" in broker.sessions
    cli3.disconnect()


def test_no_expiry_property_keeps_legacy_persistence(broker):
    """Documented divergence: a property-less CONNECT keeps the session
    indefinitely (models EMQX's configured-default deployments; the
    spec default would be 0)."""
    cli = _connect(broker, "leg-1")
    assert _wait(lambda: broker.sessions.get("leg-1") is not None)
    cli.disconnect()
    time.sleep(0.5)
    assert "leg-1" in broker.sessions


def test_disconnect_updates_session_expiry(broker):
    """§3.14.2.2.2: DISCONNECT may carry a new Session Expiry Interval —
    connect with 300, disconnect with 1, session gone ~1 s later."""
    cli = _connect(broker, "du-1", expiry=300)
    assert _wait(lambda: broker.sessions.get("du-1") is not None)
    props = Properties()
    props.SessionExpiryInterval = 1
    cli.disconnect(properties=props)
    assert _wait(lambda: "du-1" not in broker.sessions, timeout=10.0)


def test_raising_zero_expiry_from_disconnect_is_protocol_error(broker):
    """MQTT-3.1.2-30: CONNECT expiry 0 cannot be raised at DISCONNECT —
    the broker answers DISCONNECT 0x82 and the session still ends with
    the connection."""
    import socket as _socket

    from flink_emqx_connector_spark.sources.mqtt_wire import (
        connect_packet,
        disconnect_packet,
        read_packet,
    )

    raw = _socket.create_connection(("127.0.0.1", broker.port), timeout=5)
    raw.sendall(connect_packet("du-2", True, 30, 0))  # expiry 0
    ptype, _f, _b = read_packet(raw)
    assert ptype == 2
    assert _wait(lambda: broker.sessions.get("du-2") is not None)
    raw.sendall(disconnect_packet(0x00, session_expiry=60))
    ptype, _f, body = read_packet(raw)
    assert ptype == 14 and body[0] == 0x82  # Protocol Error back
    assert _wait(lambda: "du-2" not in broker.sessions)
    raw.close()


def test_session_expiry_beats_longer_will_delay(broker):
    """§3.1.2.5: a delayed will publishes at the EARLIER of will-delay
    and session end — expiry 1 with delay 10 fires the will ~1 s after
    the crash, and only once."""
    import time as _t

    got = []
    mon = _connect(broker, "mon-w")
    mon.on_message = lambda c, u, m: got.append(m)
    assert _wait(lambda: broker.sessions.get("mon-w") is not None)
    mon.subscribe("status/#", qos=1)

    cli = Client(CallbackAPIVersion.VERSION2, client_id="wexp", protocol=MQTTv5)
    wprops = Properties()
    wprops.WillDelayInterval = 10
    cli.will_set("status/wexp", b"gone", qos=1, properties=wprops)
    sprops = Properties()
    sprops.SessionExpiryInterval = 1
    cli.connect("127.0.0.1", broker.port, properties=sprops)
    cli.loop_start()
    assert _wait(lambda: broker.sessions.get("wexp") is not None)
    crashed = _t.monotonic()
    cli._running = False
    cli._close_sock()
    assert _wait(lambda: len(got) == 1, timeout=10.0)
    took = _t.monotonic() - crashed
    assert took < 5.0, took  # session end fired it, not the 10 s delay
    assert got[0].payload == b"gone"
    _t.sleep(0.5)
    assert len(got) == 1  # the will timer no-ops on the consumed entry
    mon.disconnect()
