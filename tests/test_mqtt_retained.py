"""Retained-message STORE on the embedded broker (OASIS MQTT 5
§3.3.1.3, §4.8.2): one retained message per topic; replace / clear /
snapshot-on-subscribe / retain-flag semantics, and the composition with
will messages (a retained will leaves last-known state for late
monitors — the production monitoring pattern)."""

import time

import pytest

from flink_emqx_connector_spark.sources.mqtt_wire import (
    CallbackAPIVersion,
    Client,
    EmbeddedBroker,
    MQTTv5,
    Properties,
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


def _client(broker, cid, on_message=None, sub=None, qos=1):
    cli = Client(CallbackAPIVersion.VERSION2, client_id=cid, protocol=MQTTv5)
    if on_message is not None:
        cli.on_message = on_message
    if sub is not None:
        cli.on_connect = lambda c, u, f, r, p=None: c.subscribe(sub, qos=qos)
    cli.connect("127.0.0.1", broker.port)
    cli.loop_start()
    assert _wait(lambda: broker.sessions.get(cid) is not None)
    if sub is not None:
        assert _wait(lambda: broker.sessions[cid].subs)
    return cli


def test_late_subscriber_gets_retained_snapshot(broker):
    pub = _client(broker, "pub-1")
    pub.publish("state/a", b"v1", qos=1, retain=True).wait_for_publish()
    assert _wait(lambda: "state/a" in broker.retained)
    got = []
    sub = _client(
        broker, "sub-1", on_message=lambda c, u, m: got.append(m), sub="state/#"
    )
    assert _wait(lambda: len(got) == 1)
    assert got[0].payload == b"v1"
    assert got[0].retain is True  # snapshot, not live traffic
    pub.disconnect(), sub.disconnect()


def test_retained_replaced_and_cleared(broker):
    pub = _client(broker, "pub-2")
    pub.publish("state/b", b"v1", qos=1, retain=True).wait_for_publish()
    pub.publish("state/b", b"v2", qos=1, retain=True).wait_for_publish()
    assert _wait(lambda: broker.retained.get("state/b", (None,))[0] == b"v2")
    got = []
    sub = _client(
        broker, "sub-2", on_message=lambda c, u, m: got.append(m), sub="state/b"
    )
    assert _wait(lambda: len(got) == 1)
    assert got[0].payload == b"v2"  # only the LATEST retained message
    # zero-byte retained publish clears the store (MQTT-3.3.1-6/7)
    pub.publish("state/b", b"", qos=1, retain=True).wait_for_publish()
    assert _wait(lambda: "state/b" not in broker.retained)
    got2 = []
    sub2 = _client(
        broker, "sub-2b", on_message=lambda c, u, m: got2.append(m), sub="state/b"
    )
    time.sleep(0.3)
    assert got2 == []
    pub.disconnect(), sub.disconnect(), sub2.disconnect()


def test_live_forward_clears_retain_flag(broker):
    """An established subscriber sees retain=0 on live traffic even when
    the publisher set retain=1 (the flag marks SUBSCRIBE-time snapshots;
    no Retain-As-Published) — the exact client contract the trace suite
    pins from the other side."""
    got = []
    sub = _client(
        broker, "sub-3", on_message=lambda c, u, m: got.append(m), sub="state/c"
    )
    pub = _client(broker, "pub-3")
    pub.publish("state/c", b"live", qos=1, retain=True).wait_for_publish()
    assert _wait(lambda: len(got) == 1)
    assert got[0].retain is False
    assert broker.retained["state/c"][0] == b"live"  # stored nonetheless
    pub.disconnect(), sub.disconnect()


def test_shared_subscription_gets_no_retained(broker):
    """§4.8.2: retained messages are not delivered to shared
    subscriptions — only the snapshot path is skipped, live flow works."""
    pub = _client(broker, "pub-4")
    pub.publish("state/d", b"snap", qos=1, retain=True).wait_for_publish()
    assert _wait(lambda: "state/d" in broker.retained)
    got = []
    sub = _client(
        broker,
        "sub-4",
        on_message=lambda c, u, m: got.append(m),
        sub="$share/g1/state/d",
    )
    time.sleep(0.3)
    assert got == []  # no snapshot
    pub.publish("state/d", b"live", qos=1).wait_for_publish()
    assert _wait(lambda: len(got) == 1)  # live still routes to the group
    assert got[0].payload == b"live"
    pub.disconnect(), sub.disconnect()


def test_retained_will_leaves_last_known_state(broker):
    """Will + retained composition: a reader whose will is retained
    leaves 'dead' on its status topic; a monitor subscribing AFTER the
    crash still learns the state — the reason production bridges set
    retained wills."""
    cli = Client(CallbackAPIVersion.VERSION2, client_id="reader-r", protocol=MQTTv5)
    cli.will_set("status/reader-r", b"dead", qos=1, retain=True,
                 properties=Properties())
    cli.connect("127.0.0.1", broker.port)
    cli.loop_start()
    assert _wait(lambda: broker.sessions.get("reader-r") is not None)
    cli._running = False
    cli._close_sock()  # crash without DISCONNECT
    assert _wait(lambda: "status/reader-r" in broker.retained)
    got = []
    late = _client(
        broker, "monitor-late",
        on_message=lambda c, u, m: got.append(m), sub="status/#",
    )
    assert _wait(lambda: len(got) == 1)
    assert got[0].payload == b"dead"
    assert got[0].retain is True
    late.disconnect()
