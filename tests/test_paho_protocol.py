"""PahoTransport protocol tests against an in-process fake MQTT client.

paho-mqtt isn't installed in this container, so the real-broker path is
exercised by faking the paho module surface the transport touches: shared
subscription + manual-ack subscribe (ST1/ST4), callback→queue→drain
handoff (ST7), retry-of-same-batch redelivery, checkpoint-subsuming acks
(ST2-ST3, EMQXSourceReader.java:182-202), and broker-offline-at-start
tolerance (ST6)."""

import sys
import types

import pytest


class FakeMsg:
    def __init__(self, topic, payload, qos=1, retain=False):
        self.topic = topic
        self.payload = payload
        self.qos = qos
        self.retain = retain
        self.properties = None


class FakeClient:
    offline = False

    def __init__(self, api_version=None, client_id="", protocol=None, manual_ack=False):
        self.client_id = client_id
        self.manual_ack = manual_ack
        self.subscribed = []
        self.acked = []
        self.on_connect = None
        self.on_message = None
        self.async_pending = False

    def reconnect_delay_set(self, min_delay=1, max_delay=10):
        pass

    def connect(self, host, port, clean_start=True, properties=None, keepalive=60):
        if FakeClient.offline:
            raise OSError("connection refused")

    def connect_async(self, *a, **k):
        self.async_pending = True

    def loop_start(self):
        if not FakeClient.offline and self.on_connect is not None:
            flags = types.SimpleNamespace(session_present=False)
            self.on_connect(self, None, flags, 0, None)

    def subscribe(self, topic, qos=0):
        self.subscribed.append((topic, qos))

    def ack(self, m):
        self.acked.append(m)


@pytest.fixture()
def fake_paho(monkeypatch):
    mqtt = types.ModuleType("paho.mqtt.client")
    mqtt.Client = FakeClient
    mqtt.CallbackAPIVersion = types.SimpleNamespace(VERSION2=2)
    mqtt.MQTTv5 = 5
    pkt = types.ModuleType("paho.mqtt.packettypes")
    pkt.PacketTypes = types.SimpleNamespace(CONNECT=1)
    prop = types.ModuleType("paho.mqtt.properties")

    class Properties:
        def __init__(self, _t):
            pass

    prop.Properties = Properties
    paho = types.ModuleType("paho")
    paho_mqtt = types.ModuleType("paho.mqtt")
    monkeypatch.setitem(sys.modules, "paho", paho)
    monkeypatch.setitem(sys.modules, "paho.mqtt", paho_mqtt)
    monkeypatch.setitem(sys.modules, "paho.mqtt.client", mqtt)
    monkeypatch.setitem(sys.modules, "paho.mqtt.packettypes", pkt)
    monkeypatch.setitem(sys.modules, "paho.mqtt.properties", prop)
    FakeClient.offline = False
    yield mqtt


def _transport(group="g1", clientid="c-0"):
    from flink_emqx_connector_spark.sources.transport import PahoTransport

    return PahoTransport("localhost", 1883, clientid, "t/#", 1, group)


def test_shared_subscription_on_fresh_session(fake_paho):
    t = _transport()
    assert t.client.subscribed == [("$share/g1/t/#", 1)]


def test_drain_retry_and_subsuming_acks(fake_paho):
    t = _transport()
    for i in range(5):
        t.client.on_message(t.client, None, FakeMsg("t/1", str(i).encode()))

    b1 = t.drain(1, max_records=3, timeout_s=0.05)
    assert [m.payload for m in b1] == [b"0", b"1", b"2"]
    # a retried task of the same batch re-reads the SAME buffered messages
    again = t.drain(1, max_records=3, timeout_s=0.05)
    assert [m.payload for m in again] == [b"0", b"1", b"2"]

    b2 = t.drain(2, max_records=10, timeout_s=0.05)
    assert [m.payload for m in b2] == [b"3", b"4"]
    assert t.client.acked == []  # nothing acked before commit

    # committing batch 2 acks batch 1 too (subsume previous checkpoints)
    t.ack_upto(2)
    assert [bytes(m.payload) for m in t.client.acked] == [
        b"0", b"1", b"2", b"3", b"4"
    ]
    assert t.pending == {}
    # idempotent
    t.ack_upto(2)
    assert len(t.client.acked) == 5


def test_broker_offline_at_start_tolerated(fake_paho):
    FakeClient.offline = True
    t = _transport(clientid="c-off")  # must not raise (ST6)
    assert t.client.async_pending
    assert t.drain(1, max_records=10, timeout_s=0.01) == []


def test_session_expiry_option_reaches_connect():
    """The `session_expiry` source option must land in the CONNECT
    properties (the reference hard-codes 60 s behind a TODO —
    EMQXSourceReader.java:96,100; here it is configurable)."""
    from flink_emqx_connector_spark.sources.transport import PahoTransport

    t = PahoTransport("localhost", 1883, "expiry-test", "t/#", 1, "g",
                      session_expiry=77)
    assert t.session_expiry == 77
    # the wire client stores the CONNECT session-expiry it will send
    assert t.client._session_expiry == 77
