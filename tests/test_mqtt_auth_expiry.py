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
