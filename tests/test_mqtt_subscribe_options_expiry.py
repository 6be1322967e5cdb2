"""Embedded-broker E2E for the round-13 MQTT 5 surface (VERDICT r12
item 1): Message Expiry Interval store-and-forward (OASIS §3.3.2.3.3 —
decremented on forward per MQTT-3.3.2-6, expired copies deleted per
MQTT-3.3.2-5, retained entries expire too) and the full §3.8.3.1
SUBSCRIBE options against the retained store: No Local (MQTT-3.8.3-3,
Protocol Error on shared subscriptions per MQTT-3.8.3-4), Retain As
Published (MQTT-3.3.1-12/13) and Retain Handling 0/1/2.

The trace corpus (tests/test_real_broker_traces.py) pins the CLIENT
frames for the same scenarios; this module pins the broker double's
behavior so the two sides stay in contract without a real EMQX
(``EMQXSourceIntegrationTest.java:63-170`` is the reference's
live-broker equivalent)."""

import time

import pytest

from flink_emqx_connector_spark.sources.mqtt_wire import (
    CallbackAPIVersion,
    Client,
    EmbeddedBroker,
    MQTTv5,
    Properties,
    SubscribeOptions,
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


def _client(broker, cid, on_message=None, session_expiry=None, clean=True):
    cli = Client(CallbackAPIVersion.VERSION2, client_id=cid, protocol=MQTTv5)
    if on_message is not None:
        cli.on_message = on_message
    props = None
    if session_expiry is not None:
        props = Properties()
        props.SessionExpiryInterval = session_expiry
    cli.connect("127.0.0.1", broker.port, clean_start=clean, properties=props)
    cli.loop_start()
    assert _wait(lambda: broker.sessions.get(cid) is not None)
    return cli


def _pub_expiry(cli, topic, payload, expiry, qos=1, retain=False):
    p = Properties()
    p.MessageExpiryInterval = expiry
    cli.publish(topic, payload, qos=qos, retain=retain, properties=p).wait_for_publish()


# ---------------------------------------------------------------------------
# Message Expiry Interval (§3.3.2.3.3)
# ---------------------------------------------------------------------------


def test_message_expiry_decremented_and_stale_dropped_on_resume(broker):
    """Offline queueing: a resumed session receives only the copies whose
    expiry has not elapsed, each carrying the received value minus its
    queueing time (MQTT-3.3.2-5/6). One message expires while queued
    (1 s < 1.4 s wait), one survives with a visibly decremented
    interval, one without the property never expires."""
    got = []
    sub = _client(
        broker, "mx-sub",
        on_message=lambda c, u, m: got.append(
            (bytes(m.payload), m.properties.MessageExpiryInterval)
        ),
        session_expiry=300, clean=True,
    )
    sub.subscribe("mx/t", qos=1)
    assert _wait(lambda: broker.sessions["mx-sub"].subs)
    sub.loop_stop()  # abnormal-ish detach: session (expiry 300) persists

    pub = _client(broker, "mx-pub")
    _pub_expiry(pub, "mx/t", b"dies-queued", expiry=1)
    _pub_expiry(pub, "mx/t", b"survives", expiry=60)
    pub.publish("mx/t", b"no-expiry", qos=1).wait_for_publish()
    assert _wait(lambda: broker.session_backlog("mx-sub") >= 2)

    time.sleep(1.4)  # the 1 s copy expires in the queue
    sub2 = _client(broker, "mx-sub", on_message=sub.on_message,
                   session_expiry=300, clean=False)
    assert _wait(lambda: len(got) == 2), got
    time.sleep(0.3)  # the expired copy must never trickle in late
    payloads = [p for p, _e in got]
    assert payloads == [b"survives", b"no-expiry"], got
    by_payload = dict(got)
    # 60 s minus ~1.4 s queueing: forwarded as ceil(remaining) — strictly
    # below the published value, far above the elapsed floor
    assert by_payload[b"no-expiry"] is None
    assert 55 <= by_payload[b"survives"] <= 59, got
    sub2.loop_stop()
    pub.loop_stop()


def test_message_expiry_live_forward_keeps_received_value(broker):
    """A live (un-queued) forward must NOT lose a second to rounding:
    ceil(received - ~0) == received (MQTT-3.3.2-6)."""
    got = []
    sub = _client(
        broker, "mxl-sub",
        on_message=lambda c, u, m: got.append(m.properties.MessageExpiryInterval),
    )
    sub.subscribe("mxl/t", qos=1)
    assert _wait(lambda: broker.sessions["mxl-sub"].subs)
    pub = _client(broker, "mxl-pub")
    _pub_expiry(pub, "mxl/t", b"fresh", expiry=60)
    assert _wait(lambda: got == [60]), got
    sub.loop_stop()
    pub.loop_stop()


def test_retained_message_expires_before_subscribe(broker):
    """A retained message past its Message Expiry Interval is deleted at
    the first onward-delivery attempt instead of delivered — the store
    forgets stale last-known state (§3.3.2.3.3 applies to retained
    copies; EMQX evicts them the same way)."""
    pub = _client(broker, "rx-pub")
    _pub_expiry(pub, "rx/state", b"stale", expiry=1, retain=True)
    assert _wait(lambda: "rx/state" in broker.retained)
    time.sleep(1.3)
    got = []
    sub = _client(broker, "rx-sub", on_message=lambda c, u, m: got.append(m))
    sub.subscribe("rx/#", qos=1)
    assert _wait(lambda: broker.sessions["rx-sub"].subs)
    time.sleep(0.4)
    assert got == [], [(m.topic, m.payload) for m in got]
    assert "rx/state" not in broker.retained  # evicted, not just skipped
    sub.loop_stop()
    pub.loop_stop()


# ---------------------------------------------------------------------------
# SUBSCRIBE options (§3.8.3.1)
# ---------------------------------------------------------------------------


def test_no_local_suppresses_own_publishes(broker):
    """MQTT-3.8.3-3: with No Local set, the broker never forwards a
    message to the connection that published it — the loop-breaker for
    a bridge republishing onto an overlapping filter. A second client's
    publishes still arrive."""
    got = []
    loopy = _client(
        broker, "nl-bridge", on_message=lambda c, u, m: got.append(bytes(m.payload))
    )
    loopy.subscribe("nl/t", options=SubscribeOptions(qos=1, noLocal=True))
    assert _wait(lambda: broker.sessions["nl-bridge"].subs)
    loopy.publish("nl/t", b"own-echo", qos=1).wait_for_publish()
    other = _client(broker, "nl-other")
    other.publish("nl/t", b"from-other", qos=1).wait_for_publish()
    assert _wait(lambda: got == [b"from-other"]), got
    loopy.loop_stop()
    other.loop_stop()


def test_no_local_on_shared_subscription_is_protocol_error(broker):
    """MQTT-3.8.3-4: No Local on a Shared Subscription draws DISCONNECT
    0x82 (Protocol Error) and the connection closes — pinned against
    the broker double exactly as EMQX behaves."""
    reasons = []
    cli = Client(CallbackAPIVersion.VERSION2, client_id="nl-shared", protocol=MQTTv5)
    cli.on_disconnect = lambda c, u, f, r, p=None: reasons.append(r)
    cli.connect("127.0.0.1", broker.port)
    cli.loop_start()
    assert _wait(lambda: broker.sessions.get("nl-shared") is not None)
    cli.subscribe("$share/g/nl/t", options=SubscribeOptions(qos=1, noLocal=True))
    assert _wait(lambda: 0x82 in reasons), reasons
    cli.loop_stop()


def test_retain_handling_modes_against_retained_store(broker):
    """Retain Handling vs the retained store: 2 never sends the
    snapshot, 1 sends it only when the SUBSCRIBE creates the
    subscription (a refresh of an existing one stays silent), 0 sends
    it on every SUBSCRIBE (§3.8.3.1)."""
    pub = _client(broker, "rh-pub")
    pub.publish("rh/state", b"snap", qos=1, retain=True).wait_for_publish()
    assert _wait(lambda: "rh/state" in broker.retained)

    got = []
    sub = _client(
        broker, "rh-sub",
        on_message=lambda c, u, m: got.append((bytes(m.payload), m.retain)),
    )
    sub.subscribe("rh/state", options=SubscribeOptions(qos=1, retainHandling=2))
    assert _wait(lambda: broker.sessions["rh-sub"].subs)
    time.sleep(0.3)
    assert got == [], got  # RH2: never

    sub.subscribe("rh/new", options=SubscribeOptions(qos=1, retainHandling=1))
    pub.publish("rh/new", b"snap2", qos=1, retain=True).wait_for_publish()
    assert _wait(lambda: "rh/new" in broker.retained)
    # the LIVE forward of the retained publish still arrives (retain
    # handling gates only the subscribe-time snapshot), flag cleared
    assert _wait(lambda: got == [(b"snap2", False)]), got
    # refresh of the EXISTING rh/new subscription: RH1 stays silent
    sub.subscribe("rh/new", options=SubscribeOptions(qos=1, retainHandling=1))
    time.sleep(0.3)
    assert got == [(b"snap2", False)], got  # no snapshot for a refresh

    # a FRESH RH1 subscription (different client) gets the snapshot once
    got_b = []
    sub_b = _client(
        broker, "rh-sub-b",
        on_message=lambda c, u, m: got_b.append((bytes(m.payload), m.retain)),
    )
    sub_b.subscribe("rh/new", options=SubscribeOptions(qos=1, retainHandling=1))
    assert _wait(lambda: got_b == [(b"snap2", True)]), got_b

    # RH0 (the default): every SUBSCRIBE re-sends the snapshot
    sub.subscribe("rh/state", options=SubscribeOptions(qos=1, retainHandling=0))
    assert _wait(lambda: got == [(b"snap2", False), (b"snap", True)]), got
    sub.subscribe("rh/state", qos=1)
    assert _wait(
        lambda: got == [(b"snap2", False), (b"snap", True), (b"snap", True)]
    ), got

    sub.loop_stop()
    sub_b.loop_stop()
    pub.loop_stop()


def test_retain_as_published_forwards_retain_flag(broker):
    """MQTT-3.3.1-12/13: with Retain As Published the live forward keeps
    the publish's retain flag; without it the flag is cleared (the
    snapshot-vs-live distinction the decode layer exposes)."""
    got_rap, got_plain = [], []
    rap = _client(
        broker, "rap-sub",
        on_message=lambda c, u, m: got_rap.append((bytes(m.payload), m.retain)),
    )
    rap.subscribe("rap/t", options=SubscribeOptions(qos=1, retainAsPublished=True))
    plain = _client(
        broker, "plain-sub",
        on_message=lambda c, u, m: got_plain.append((bytes(m.payload), m.retain)),
    )
    plain.subscribe("rap/t", qos=1)
    assert _wait(
        lambda: broker.sessions["rap-sub"].subs and broker.sessions["plain-sub"].subs
    )
    pub = _client(broker, "rap-pub")
    pub.publish("rap/t", b"live-retained", qos=1, retain=True).wait_for_publish()
    assert _wait(lambda: got_rap and got_plain)
    assert got_rap == [(b"live-retained", True)], got_rap
    assert got_plain == [(b"live-retained", False)], got_plain
    rap.loop_stop()
    plain.loop_stop()
    pub.loop_stop()


# ---------------------------------------------------------------------------
# Subscription Identifiers (§3.8.2.1.2 / MQTT-3.3.4-3/-6)
# ---------------------------------------------------------------------------


def _sub_props(subid):
    p = Properties()
    p.SubscriptionIdentifier = subid
    return p


def test_subscription_identifier_routes_overlapping_subs(broker):
    """Two overlapping subscriptions with different identifiers: a
    matching publish is delivered once PER subscription, each copy
    echoing ITS identifier (MQTT-3.3.4-3) — the router leg a consumer
    uses instead of re-matching topic filters."""
    got = []
    sub = _client(
        broker, "sid-sub",
        on_message=lambda c, u, m: got.append(
            (m.topic, m.properties.SubscriptionIdentifier)
        ),
    )
    sub.subscribe("sid/#", qos=1, properties=_sub_props(7))
    sub.subscribe("sid/a", qos=1, properties=_sub_props(9))
    assert _wait(lambda: len(broker.sessions["sid-sub"].subs) == 2)
    pub = _client(broker, "sid-pub")
    pub.publish("sid/a", b"x", qos=1).wait_for_publish()
    assert _wait(lambda: len(got) == 2), got
    assert sorted(got) == [("sid/a", 7), ("sid/a", 9)], got
    sub.loop_stop()
    pub.loop_stop()


def test_subscription_identifier_rides_offline_queue(broker):
    """The identifier is subscription state: a message queued for an
    offline session must still carry it on resume redelivery."""
    got = []
    sub = _client(
        broker, "sidq-sub",
        on_message=lambda c, u, m: got.append(
            (bytes(m.payload), m.properties.SubscriptionIdentifier)
        ),
        session_expiry=300,
    )
    sub.subscribe("sidq/t", qos=1, properties=_sub_props(42))
    assert _wait(lambda: broker.sessions["sidq-sub"].subs)
    sub.loop_stop()
    pub = _client(broker, "sidq-pub")
    pub.publish("sidq/t", b"queued", qos=1).wait_for_publish()
    assert _wait(lambda: broker.session_backlog("sidq-sub") >= 1)
    sub2 = _client(broker, "sidq-sub", on_message=sub.on_message,
                   session_expiry=300, clean=False)
    assert _wait(lambda: got == [(b"queued", 42)]), got
    sub2.loop_stop()
    pub.loop_stop()


def test_subscription_identifier_on_retained_snapshot(broker):
    """The subscribe-time retained snapshot is caused by the NEW
    subscription, so it echoes that subscription's identifier."""
    pub = _client(broker, "sidr-pub")
    pub.publish("sidr/state", b"snap", qos=1, retain=True).wait_for_publish()
    assert _wait(lambda: "sidr/state" in broker.retained)
    got = []
    sub = _client(
        broker, "sidr-sub",
        on_message=lambda c, u, m: got.append(
            (m.retain, m.properties.SubscriptionIdentifier)
        ),
    )
    sub.subscribe("sidr/#", qos=1, properties=_sub_props(5))
    assert _wait(lambda: got == [(True, 5)]), got
    sub.loop_stop()
    pub.loop_stop()


def test_subscription_identifier_on_outbound_publish_is_protocol_error(broker):
    """MQTT-3.3.4-6: a client→server PUBLISH carrying 0x0B draws
    DISCONNECT 0x82 and the connection closes."""
    from flink_emqx_connector_spark.sources.mqtt_wire import publish_packet

    reasons = []
    cli = Client(CallbackAPIVersion.VERSION2, client_id="sidp-bad", protocol=MQTTv5)
    cli.on_disconnect = lambda c, u, f, r, p=None: reasons.append(r)
    cli.connect("127.0.0.1", broker.port)
    cli.loop_start()
    assert _wait(lambda: broker.sessions.get("sidp-bad") is not None)
    # hand-craft the illegal frame (the public publish() API cannot emit
    # one — 0x0B has no client-side publish surface by design)
    cli._send(publish_packet("sid/bad", b"x", 0, subscription_id=3))
    assert _wait(lambda: 0x82 in reasons), reasons
    cli.loop_stop()


# ---------------------------------------------------------------------------
# Request/Response envelope pass-through (§3.3.2.3, MQTT-3.3.2-15/16/20)
# ---------------------------------------------------------------------------


def test_request_response_envelope_passes_through_unaltered(broker):
    """The RPC-over-MQTT pattern: the requester publishes with
    ResponseTopic + CorrelationData (+ ContentType / PayloadFormat);
    the broker must forward ALL FOUR unaltered (MQTT-3.3.2-4/-15/-16/
    -20 — pre-r13 the double silently dropped them); the responder
    answers on the ResponseTopic echoing the CorrelationData, closing
    the loop."""
    answered = []

    def respond(c, u, m):
        rt = m.properties.ResponseTopic
        assert rt == "rpc/replies/req-1", rt
        assert m.properties.ContentType == "application/json"
        assert m.properties.PayloadFormatIndicator == 1
        p = Properties()
        p.CorrelationData = m.properties.CorrelationData
        c.publish(rt, b'{"ok":true}', qos=1, properties=p)

    responder = _client(broker, "rr-responder", on_message=respond)
    responder.subscribe("rpc/calls", qos=1)
    assert _wait(lambda: broker.sessions["rr-responder"].subs)

    requester = _client(
        broker, "rr-requester",
        on_message=lambda c, u, m: answered.append(
            (bytes(m.payload), m.properties.CorrelationData)
        ),
    )
    requester.subscribe("rpc/replies/req-1", qos=1)
    assert _wait(lambda: broker.sessions["rr-requester"].subs)

    p = Properties()
    p.ResponseTopic = "rpc/replies/req-1"
    p.CorrelationData = b"\x00\x01corr\xff"
    p.ContentType = "application/json"
    p.PayloadFormatIndicator = 1
    requester.publish("rpc/calls", b'{"op":"ping"}', qos=1, properties=p)

    assert _wait(lambda: answered == [(b'{"ok":true}', b"\x00\x01corr\xff")]), (
        answered
    )
    responder.loop_stop()
    requester.loop_stop()


def test_envelope_survives_offline_queue_and_retained(broker):
    """Pass-through properties ride the offline queue (session resume)
    and the retained store — a late responder still sees where to
    answer."""
    got = []
    sub = _client(
        broker, "rr-late",
        on_message=lambda c, u, m: got.append(
            (m.retain, m.properties.ResponseTopic, m.properties.CorrelationData)
        ),
        session_expiry=300,
    )
    sub.subscribe("rr/q", qos=1)
    assert _wait(lambda: broker.sessions["rr-late"].subs)
    sub.loop_stop()

    pub = _client(broker, "rr-pub")
    p = Properties()
    p.ResponseTopic = "rr/back"
    p.CorrelationData = b"c-42"
    pub.publish("rr/q", b"queued", qos=1, properties=p).wait_for_publish()
    pub.publish("rr/state", b"snap", qos=1, retain=True, properties=p
                ).wait_for_publish()
    assert _wait(lambda: broker.session_backlog("rr-late") >= 1)

    sub2 = _client(broker, "rr-late", on_message=sub.on_message,
                   session_expiry=300, clean=False)
    assert _wait(lambda: (False, "rr/back", b"c-42") in got), got

    late = _client(
        broker, "rr-very-late",
        on_message=lambda c, u, m: got.append(
            (m.retain, m.properties.ResponseTopic, m.properties.CorrelationData)
        ),
    )
    late.subscribe("rr/state", qos=1)
    assert _wait(lambda: (True, "rr/back", b"c-42") in got), got
    sub2.loop_stop()
    pub.loop_stop()
    late.loop_stop()
