"""Enhanced authentication (OASIS MQTT 5 §4.12) against the embedded
broker: the AUTH-packet exchange EMQX runs for SCRAM/Kerberos-class
mechanisms — CONNECT names the method (0x15), the server challenges
over AUTH 0x18, the client answers, the CONNACK completes (echoing the
method); plus mid-connection re-authentication (0x19) and every
refusal class: wrong secret (0x87 Not authorized), missing/unknown
method (0x8C Bad authentication method) — both PERMANENT refusals the
client cedes on instead of storming retries."""

import time

import pytest

from flink_emqx_connector_spark.sources.mqtt_wire import (
    CallbackAPIVersion,
    Client,
    EmbeddedBroker,
    MQTTv5,
    ScramLiteAuth,
)

SECRET = b"fleet-shared-secret"


@pytest.fixture()
def broker():
    b = EmbeddedBroker(auth=ScramLiteAuth({"auth-ok": SECRET, "auth-re": SECRET}))
    b.start()
    yield b
    b.stop()


def _wait(predicate, timeout=30.0, step=0.05):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(step)
    return False


def _client(broker, cid, secret=SECRET, method=ScramLiteAuth.method):
    cli = Client(CallbackAPIVersion.VERSION2, client_id=cid, protocol=MQTTv5)
    if method is not None:
        cli.enhanced_auth(method, secret)
    cli.connect("127.0.0.1", broker.port)
    cli.loop_start()
    return cli


def test_enhanced_auth_happy_path_establishes_session(broker):
    got = []
    cli = _client(broker, "auth-ok")
    cli.on_message = lambda c, u, m: got.append(bytes(m.payload))
    assert _wait(lambda: broker.sessions.get("auth-ok") is not None)
    cli.subscribe("a/t", qos=1)
    assert _wait(lambda: broker.sessions["auth-ok"].subs)
    cli.publish("a/t", b"through-auth", qos=1).wait_for_publish()
    assert _wait(lambda: got == [b"through-auth"]), got
    assert cli.connect_refused is None
    cli.loop_stop()


def test_enhanced_auth_wrong_secret_refused_0x87_cedes(broker):
    cli = _client(broker, "auth-ok", secret=b"wrong")
    assert _wait(lambda: cli.connect_refused == 0x87), cli.connect_refused
    # permanent refusal: the loop cedes rather than storming retries
    assert _wait(lambda: not cli._running)
    assert broker.sessions.get("auth-ok") is None
    cli.loop_stop()


def test_enhanced_auth_unknown_client_refused_0x87(broker):
    cli = _client(broker, "auth-stranger")  # right secret, unknown clientid
    assert _wait(lambda: cli.connect_refused == 0x87), cli.connect_refused
    cli.loop_stop()


def test_connect_without_method_against_auth_broker_is_0x8C(broker):
    cli = _client(broker, "auth-ok", method=None)
    assert _wait(lambda: cli.connect_refused == 0x8C), cli.connect_refused
    assert _wait(lambda: not cli._running)
    cli.loop_stop()


def test_method_against_plain_broker_is_0x8C():
    plain = EmbeddedBroker().start()
    try:
        cli = _client(plain, "auth-ok")
        assert _wait(lambda: cli.connect_refused == 0x8C), cli.connect_refused
        cli.loop_stop()
    finally:
        plain.stop()


def test_reauthentication_round_trip_keeps_traffic_flowing(broker):
    got = []
    cli = _client(broker, "auth-re")
    cli.on_message = lambda c, u, m: got.append(bytes(m.payload))
    assert _wait(lambda: broker.sessions.get("auth-re") is not None)
    cli.subscribe("r/t", qos=1)
    assert _wait(lambda: broker.sessions["auth-re"].subs)
    cli.publish("r/t", b"before", qos=1).wait_for_publish()
    assert _wait(lambda: got == [b"before"])
    cli.reauthenticate()
    assert _wait(lambda: cli.reauth_complete == 1), cli.reauth_complete
    cli.publish("r/t", b"after", qos=1).wait_for_publish()
    assert _wait(lambda: got == [b"before", b"after"]), got
    cli.loop_stop()


def test_reauthentication_failure_draws_disconnect_0x87(broker):
    reasons = []
    cli = _client(broker, "auth-re")
    cli.on_disconnect = lambda c, u, f, r, p=None: reasons.append(r)
    assert _wait(lambda: broker.sessions.get("auth-re") is not None)
    # rotate the broker-side secret so the next challenge fails
    broker.auth.secrets["auth-re"] = b"rotated-away"
    cli.reauthenticate()
    assert _wait(lambda: 0x87 in reasons), reasons
    cli.loop_stop()


def test_paho_transport_enhanced_auth_end_to_end(broker):
    """Connector-surface plumbing: a PahoTransport constructed with the
    auth_method/auth_secret source options completes the §4.12 exchange
    (embedded-client leg) and receives traffic from an authenticated
    publisher — the reader path a SCRAM-enforcing EMQX requires."""
    from flink_emqx_connector_spark.sources.transport import PahoTransport

    broker.auth.secrets["auth-reader"] = SECRET
    t = PahoTransport(
        "127.0.0.1", broker.port, "auth-reader", "at/#", 1, "",
        auth_method=ScramLiteAuth.method, auth_secret=SECRET,
    )
    try:
        assert _wait(
            lambda: broker.sessions.get("auth-reader") is not None
            and broker.sessions["auth-reader"].subs
        )
        pub = _client(broker, "auth-ok")
        pub.publish("at/x", b"authed-payload", qos=1).wait_for_publish()
        assert _wait(lambda: not t.queue.empty())
        _seq, _ts, msg = t.queue.get_nowait()
        assert bytes(msg.payload) == b"authed-payload"
        pub.loop_stop()
    finally:
        t.close() if hasattr(t, "close") else t.client.loop_stop()
