"""Property-based round-trip fuzz of the MQTT 5 wire codecs
(``sources/mqtt_wire.py``): every CONNECT option combination — will
fields (QoS/retain/delay), credentials, expiry, alias maximum — must
parse back byte-exactly through the broker's own parser; varint and
property blocks must round-trip at every boundary. This hardens the
codec surface the round-10 lifecycle work grew (wills, auth, expiry)
against encode/parse drift."""

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_emqx_connector_spark.sources.mqtt_wire import (
    _parse_props,
    _parse_str,
    _props_bytes,
    _varint,
    _varint_from,
    connect_packet,
    disconnect_packet,
    publish_packet,
)


def _parse_connect_body(body: bytes):
    """Reference parse of a CONNECT body, mirroring EmbeddedBroker._on_connect
    field order (§3.1.2-3.1.3): flags, keepalive, props, clientid, will,
    username, password."""
    proto, i = _parse_str(body, 0)
    assert proto == "MQTT" and body[i] == 5
    i += 1
    flags = body[i]
    i += 1
    (keepalive,) = struct.unpack_from(">H", body, i)
    i += 2
    props, i = _parse_props(body, i)
    clientid, i = _parse_str(body, i)
    will = None
    if flags & 0x04:
        wprops, i = _parse_props(body, i)
        wtopic, i = _parse_str(body, i)
        (wlen,) = struct.unpack_from(">H", body, i)
        i += 2
        wpayload = body[i : i + wlen]
        i += wlen
        will = (
            wtopic, wpayload, (flags >> 3) & 0x03, bool(flags & 0x20),
            wprops.get(0x18, 0),
        )
    username = password = None
    if flags & 0x80:
        username, i = _parse_str(body, i)
    if flags & 0x40:
        (plen,) = struct.unpack_from(">H", body, i)
        i += 2
        password = body[i : i + plen]
        i += plen
    assert i == len(body)  # nothing trailing
    return flags, keepalive, props, clientid, will, username, password


_topic = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1,
    max_size=40,
).filter(lambda s: "\x00" not in s)


@settings(max_examples=200, deadline=None)
@given(
    clientid=_topic,
    clean=st.booleans(),
    keepalive=st.integers(0, 65535),
    expiry=st.one_of(st.none(), st.integers(0, 2**32 - 1)),
    alias_max=st.one_of(st.none(), st.integers(1, 65535)),
    will=st.one_of(
        st.none(),
        st.tuples(
            _topic,
            st.binary(max_size=64),
            st.integers(0, 2),
            st.booleans(),
            st.integers(0, 2**31),
        ),
    ),
    username=st.one_of(st.none(), _topic),
    password=st.one_of(st.none(), st.binary(max_size=32)),
)
def test_connect_packet_roundtrip(
    clientid, clean, keepalive, expiry, alias_max, will, username, password
):
    pkt = connect_packet(
        clientid, clean, keepalive, expiry,
        topic_alias_maximum=alias_max, will=will,
        username=username, password=password,
    )
    # fixed header
    assert pkt[0] == 0x10
    length, i = _varint_from(pkt, 1)
    body = pkt[i:]
    assert length == len(body)
    flags, ka, props, cid, w, u, p = _parse_connect_body(body)
    assert bool(flags & 0x02) == clean
    assert ka == keepalive
    assert cid == clientid
    assert props.get(0x11) == expiry if expiry is not None else 0x11 not in props
    if alias_max is not None:
        assert props.get(0x22) == alias_max
    if will is None:
        assert w is None
    else:
        t, pay, q, r, d = will
        assert w == (t, pay, q, r, d)
    assert u == username
    assert p == password


@settings(max_examples=200, deadline=None)
@given(n=st.integers(0, 268_435_455))
def test_varint_roundtrip(n):
    buf = _varint(n)
    val, i = _varint_from(buf, 0)
    assert (val, i) == (n, len(buf))
    assert len(buf) <= 4


@settings(max_examples=200, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.text(max_size=20).filter(lambda s: "\x00" not in s),
            st.text(max_size=20).filter(lambda s: "\x00" not in s),
        ),
        max_size=8,
    ),
    expiry=st.one_of(st.none(), st.integers(0, 2**32 - 1)),
)
def test_props_roundtrip_with_duplicate_user_keys(pairs, expiry):
    """User properties keep ORDER and DUPLICATES (MQTT 5 allows both —
    EMQXMessage.java:9 parity)."""
    buf = _props_bytes(session_expiry=expiry, user_props=pairs)
    props, end = _parse_props(buf, 0)
    assert end == len(buf)
    assert props["user"] == pairs
    if expiry is not None:
        assert props[0x11] == expiry


@settings(max_examples=150, deadline=None)
@given(
    topic=_topic,
    payload=st.binary(max_size=128),
    qos=st.integers(0, 2),
    retain=st.booleans(),
    dup=st.booleans(),
    alias=st.one_of(st.none(), st.integers(1, 65535)),
)
def test_publish_packet_flag_and_field_roundtrip(
    topic, payload, qos, retain, dup, alias
):
    pid = 7 if qos else None
    pkt = publish_packet(
        topic, payload, qos, pid, retain, dup, topic_alias=alias
    )
    assert pkt[0] >> 4 == 3
    flags = pkt[0] & 0x0F
    assert bool(flags & 0x08) == dup
    assert (flags >> 1) & 0x03 == qos
    assert bool(flags & 0x01) == retain
    _len, i = _varint_from(pkt, 1)
    body = pkt[i:]
    t, j = _parse_str(body, 0)
    assert t == topic
    if qos:
        (got_pid,) = struct.unpack_from(">H", body, j)
        assert got_pid == 7
        j += 2
    props, j = _parse_props(body, j)
    if alias is not None:
        assert props[0x23] == alias
    assert body[j:] == payload


@settings(max_examples=100, deadline=None)
@given(
    reason=st.integers(0, 255),
    expiry=st.one_of(st.none(), st.integers(0, 2**32 - 1)),
)
def test_disconnect_packet_roundtrip(reason, expiry):
    pkt = disconnect_packet(reason, session_expiry=expiry)
    _len, i = _varint_from(pkt, 1)
    body = pkt[i:]
    assert body[0] == reason
    props, end = _parse_props(body, 1)
    assert end == len(body)
    if expiry is not None:
        assert props[0x11] == expiry
    else:
        assert 0x11 not in props
