"""Broker-side outbound topic-alias assignment (MQTT-3.3.2-26/27) over
real sockets: repeated topics compress to a 2-byte alias up to the
client's advertised Topic-Alias-Maximum; aliases are per network
connection (reset on reconnect); clients advertising 0 never see one.
The client's inbound alias table (round 9, previously trace-replay-only)
is the other half of every assertion here."""

import time

import pytest

from flink_emqx_connector_spark.sources.mqtt_wire import (
    CallbackAPIVersion,
    Client,
    EmbeddedBroker,
    MQTTv5,
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


def _sub(broker, cid, alias_max, topic="t/#"):
    got = []
    cli = Client(CallbackAPIVersion.VERSION2, client_id=cid, protocol=MQTTv5)
    cli.topic_alias_maximum = alias_max
    cli.on_connect = lambda c, u, f, r, p=None: c.subscribe(topic, qos=1)
    cli.on_message = lambda c, u, m: got.append(m)
    cli.connect("127.0.0.1", broker.port)
    cli.loop_start()
    assert _wait(lambda: broker.sessions.get(cid) and broker.sessions[cid].subs)
    return cli, got


def _pub(broker):
    cli = Client(CallbackAPIVersion.VERSION2, protocol=MQTTv5)
    cli.connect("127.0.0.1", broker.port)
    cli.loop_start()
    return cli


def test_repeated_topic_compresses_to_alias(broker):
    sub, got = _sub(broker, "al-1", alias_max=16)
    pub = _pub(broker)
    for i in range(3):
        pub.publish("t/sensor", b"%d" % i, qos=1).wait_for_publish()
    assert _wait(lambda: len(got) == 3)
    # topics resolved correctly on every delivery...
    assert [m.topic for m in got] == ["t/sensor"] * 3
    assert [bytes(m.payload) for m in got] == [b"0", b"1", b"2"]
    # ...and the alias path was genuinely used on the wire: the broker
    # bound an alias and the client's rx table learned it
    conn = broker.sessions["al-1"].conn
    assert conn.tx_alias == {"t/sensor": 1}
    assert sub._rx_alias == {1: "t/sensor"}
    pub.disconnect(), sub.disconnect()


def test_zero_alias_maximum_gets_plain_topics(broker):
    sub, got = _sub(broker, "al-0", alias_max=0)
    pub = _pub(broker)
    for i in range(2):
        pub.publish("t/x", b"p", qos=1).wait_for_publish()
    assert _wait(lambda: len(got) == 2)
    assert broker.sessions["al-0"].conn.tx_alias == {}
    assert sub._rx_alias == {}
    pub.disconnect(), sub.disconnect()


def test_alias_capacity_overflow_goes_plain(broker):
    """More distinct topics than the advertised maximum: the first two
    bind aliases, the rest are delivered with plain topics — all resolve
    correctly client-side."""
    sub, got = _sub(broker, "al-2", alias_max=2)
    pub = _pub(broker)
    topics = [f"t/{i}" for i in range(5)]
    for t in topics:
        pub.publish(t, b"p", qos=1).wait_for_publish()
    assert _wait(lambda: len(got) == 5)
    assert sorted(m.topic for m in got) == sorted(topics)
    assert len(broker.sessions["al-2"].conn.tx_alias) == 2
    pub.disconnect(), sub.disconnect()


def test_aliases_reset_on_reconnect(broker):
    """MQTT-3.3.2-7: aliases never outlive the network connection — a
    resumed session rebinds from scratch and redelivered backlog still
    resolves."""
    sub, got = _sub(broker, "al-3", alias_max=16, topic="t/r")
    pub = _pub(broker)
    pub.publish("t/r", b"one", qos=1).wait_for_publish()
    assert _wait(lambda: len(got) == 1)
    old_conn = broker.sessions["al-3"].conn
    assert old_conn.tx_alias == {"t/r": 1}
    # drop the subscriber's link; queue a message while offline
    sub._running = False
    sub._close_sock()
    assert _wait(lambda: broker.sessions["al-3"].conn is None)
    pub.publish("t/r", b"two", qos=1).wait_for_publish()
    # resume the session on a FRESH connection
    cli2 = Client(CallbackAPIVersion.VERSION2, client_id="al-3", protocol=MQTTv5)
    got2 = []
    cli2.on_message = lambda c, u, m: got2.append(m)
    cli2.connect("127.0.0.1", broker.port, clean_start=False)
    cli2.loop_start()
    assert _wait(lambda: len(got2) == 1)
    assert got2[0].topic == "t/r" and bytes(got2[0].payload) == b"two"
    new_conn = broker.sessions["al-3"].conn
    assert new_conn is not old_conn
    assert new_conn.tx_alias == {"t/r": 1}  # rebound on the new conn
    pub.disconnect(), cli2.disconnect()


def test_outbound_alias_roundtrip_through_broker(broker):
    """Client→broker aliasing E2E: the embedded broker advertises a
    Topic-Alias-Maximum in CONNACK, the publisher compresses repeats,
    the broker RESOLVES them — the subscriber sees every copy on the
    full topic. The publisher connection's inbound table on the broker
    proves compression actually happened on the wire."""
    sub, got = _sub(broker, "oalias-sub", alias_max=16, topic="oa/#")
    pub = Client(
        CallbackAPIVersion.VERSION2, client_id="oalias-pub", protocol=MQTTv5
    )
    pub.connect("127.0.0.1", broker.port)
    pub.loop_start()
    for i in range(3):
        pub.publish("oa/rep", b"m%d" % i, qos=1).wait_for_publish()
    assert _wait(lambda: len(got) == 3), got
    assert [(m.topic, bytes(m.payload)) for m in got] == [
        ("oa/rep", b"m0"), ("oa/rep", b"m1"), ("oa/rep", b"m2"),
    ]
    pconn = broker.sessions["oalias-pub"].conn
    assert pconn.rx_alias == {1: "oa/rep"}, pconn.rx_alias
    sub.loop_stop()
    pub.loop_stop()


def test_inbound_alias_out_of_range_is_0x94(broker):
    """MQTT-3.3.2-8/9: an alias above the broker's advertised maximum
    draws DISCONNECT 0x94 Topic Alias invalid."""
    from flink_emqx_connector_spark.sources.mqtt_wire import publish_packet

    reasons = []
    cli = _pub(broker)
    cli.on_disconnect = lambda c, u, f, r, p=None: reasons.append(r)
    cli._send(publish_packet("t/x", b"p", 0, topic_alias=99))
    assert _wait(lambda: 0x94 in reasons), reasons
    cli.loop_stop()


def test_inbound_unknown_alias_and_bare_empty_topic_are_0x82(broker):
    """An empty-topic publish whose alias was never bound — or with no
    alias at all (MQTT-4.7.3-1) — is a Protocol Error."""
    from flink_emqx_connector_spark.sources.mqtt_wire import publish_packet

    for cid, pkt_args in [
        ("oalias-unk", {"topic_alias": 3}),   # alias never bound
        ("oalias-mt", {}),                     # no topic, no alias
    ]:
        reasons = []
        cli = _pub(broker)
        cli.on_disconnect = lambda c, u, f, r, p=None: reasons.append(r)
        cli._send(publish_packet("", b"p", 0, **pkt_args))
        assert _wait(lambda: 0x82 in reasons), (cid, reasons)
        cli.loop_stop()
