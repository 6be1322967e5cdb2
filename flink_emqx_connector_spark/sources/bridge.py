"""MQTT → spool bridge: the stable-process ingestion tier for the MQTT
source at scale.

Why it exists (measured, not theoretical): MQTT 5 manual acks are
CONNECTION-scoped — only the connection that received a message can ack
it. The executor-resident client design (one client per partition inside
Python workers, ``transport=paho``) therefore assumes each partition's
tasks keep landing on the same worker process. Spark's worker pool makes
no such promise: under load, tasks rotate across workers, each new worker
opens a client with the same clientid, the broker's session takeover
kicks the previous one, its reconnect loop fights back, and every
takeover redelivers the un-acked backlog that no surviving connection can
ever ack — a 100k-message pump measured 34× duplicate delivery. The
reference never hits this because a Flink subtask IS a stable long-lived
process (``EMQXSourceReader.java:34-66``).

The bridge restores a stable process: N shared-subscription clients run
as threads in the DRIVER (which lives exactly as long as the streaming
query), append every message to the segment-log spool, and ack the broker
only after the durable append — the same ack-after-durable contract as
checkpoint-gated acks, moved one hop earlier. Downstream, executors read
the spool, which is a seekable replayable log, so Structured Streaming's
offset WAL upgrades delivery to exactly-once from the spool onward; the
broker→spool hop stays at-least-once (bridge crash before ack →
redelivery → duplicate spool rows, deduplicable by key downstream).

Scale posture: the bridge is ingestion I/O only (no decode, no compute) —
one thread per shared-subscription member, fan-in bounded by broker
delivery. Heavy lifting stays in executors reading the spool in parallel
(whole-segment claims, ~1/N of the log each). For multi-driver scale-out,
run one bridge per topic-filter on any stable host; the spool directory
is the handoff point.
"""

from __future__ import annotations

import threading

from .transport import SpoolPublisher, _load_mqtt


class MqttSpoolBridge:
    """N manual-ack shared-subscription clients draining a broker into a
    spool directory; acks follow the durable append."""

    #: Watchdog poll period (seconds). A respawn is driven by broker
    #: session resume, so a couple of seconds of detection latency only
    #: delays redelivery, never loses it.
    WATCHDOG_INTERVAL = 2.0

    def __init__(
        self,
        host: str,
        port: int,
        topic_filter: str,
        group: str,
        clientid: str,
        spool_dir: str,
        qos: int = 1,
        members: int = 1,
        status_topic: str | None = None,
    ):
        self.spool_dir = spool_dir
        self._lock = threading.Lock()
        self._pub = SpoolPublisher(spool_dir)
        self._host, self._port, self._qos = host, port, qos
        self._clientid = clientid
        #: When set, every member maintains a RETAINED liveness record at
        #: ``{status_topic}/{member-clientid}``: "online" on each connect,
        #: "offline" on graceful departure (scale-in / stop), and a
        #: retained WILL "dead" the broker publishes if the member dies
        #: without a clean DISCONNECT — so a monitor subscribed to
        #: ``{status_topic}/#`` (or arriving late, via the retained
        #: snapshot) learns member health from the BROKER, not from its
        #: own timeouts. This is the operational telemetry leg the
        #: reference leaves to Flink's metrics system.
        self._status_topic = status_topic
        self._sub_topic = (
            f"$share/{group}/{topic_filter}" if group else topic_filter
        )
        self._stopped = threading.Event()
        self.respawns = 0
        self._clients = [self._spawn_member(i) for i in range(members)]
        # Member supervision — the dynamic-rebalancing leg BOTH the
        # reference and the pre-round-8 engine lacked (the reference's
        # EMQXSplitEnumerator.addSplitsBack is a no-op stub,
        # EMQXSplitEnumerator.java:37-47): if a member's network loop
        # thread dies for any reason OTHER than session takeover, its
        # clientid's share of the shared subscription would go unserved
        # until session expiry. The watchdog respawns the member with
        # the SAME clientid and clean_start=False, so broker session
        # resume redelivers everything un-acked — no coordination needed
        # beyond the clientid itself. Takeover-superseded members are
        # deliberately NOT respawned: a new owner holds the clientid and
        # a respawn would ping-pong the takeover (the round-2 storm).
        self._watchdog = threading.Thread(target=self._watch, daemon=True)
        self._watchdog.start()

    def _spawn_member(self, i: int):
        mqtt, PacketTypes, Properties = _load_mqtt()
        cli = mqtt.Client(
            mqtt.CallbackAPIVersion.VERSION2,
            client_id=f"{self._clientid}-bridge-{i}",
            protocol=mqtt.MQTTv5,
            manual_ack=True,
        )
        props = Properties(PacketTypes.CONNECT)
        props.SessionExpiryInterval = 300
        status = (
            f"{self._status_topic}/{self._clientid}-bridge-{i}"
            if self._status_topic
            else None
        )
        if status:
            # retained will: an abnormal death leaves "dead" as the
            # topic's last-known state for monitors that subscribe later
            cli.will_set(status, b"dead", qos=1, retain=True)

        def on_connect(client, userdata, flags, reason, properties=None):
            if getattr(reason, "value", reason) != 0:
                return  # CONNACK refusal — never subscribe into it
            if status:
                # overwrite any stale "dead"/"offline" record — a watchdog
                # respawn self-heals the status topic on reconnect
                client.publish(status, b"online", qos=1, retain=True)
            if not flags.session_present:
                client.subscribe(self._sub_topic, qos=self._qos)

        def on_message(client, userdata, msg):
            # ordered (key, value) pairs — duplicate keys preserved
            # end-to-end (EMQXMessage.java:9 Mqtt5UserProperties parity)
            props_p = []
            if getattr(msg, "properties", None) is not None:
                props_p = list(getattr(msg.properties, "UserProperty", []) or [])
            # durable append THEN ack: a crash between the two yields
            # broker redelivery (duplicate spool row), never loss
            with self._lock:
                if self._stopped.is_set():
                    return  # spool closed; leave un-acked → redelivery
                self._pub.publish(
                    msg.topic, bytes(msg.payload), qos=msg.qos, properties=props_p
                )
            client.ack(msg)

        def on_disconnect(client, userdata, flags, reason, properties=None):
            # real-paho leg: mark takeover so the watchdog cedes (the
            # embedded double sets .superseded itself on 0x8E). Must ALSO
            # stop the client: with reconnect_delay_set + loop_start,
            # stock paho would otherwise auto-reconnect with the same
            # clientid and clean_start=False, retaking the session and
            # ping-ponging with the new owner — exactly the duplicate
            # storm the cede policy exists to prevent (transport.py
            # applies the same disconnect-on-0x8E).
            if getattr(reason, "value", reason) == 0x8E:
                client.superseded = True
                try:
                    client.disconnect()
                except Exception:
                    pass  # socket already gone — superseded flag still cedes

        cli.on_connect = on_connect
        cli.on_message = on_message
        cli.on_disconnect = on_disconnect
        cli._graft_status = status  # for graceful-departure announcements
        cli.reconnect_delay_set(min_delay=1, max_delay=10)
        try:
            cli.connect(
                self._host, self._port, clean_start=False,
                properties=props, keepalive=30,
            )
        except OSError:
            cli.connect_async(
                self._host, self._port, clean_start=False,
                properties=props, keepalive=30,
            )
        cli.loop_start()
        return cli

    @staticmethod
    def _member_dead(cli) -> bool:
        """True when the member's network loop is permanently gone (the
        auto-reconnect loop covers transient failures internally)."""
        th = getattr(cli, "_thread", None)
        return th is not None and not th.is_alive()

    def _watch(self) -> None:
        while not self._stopped.wait(self.WATCHDOG_INTERVAL):
            for i, cli in enumerate(self._clients):
                if self._stopped.is_set():
                    return
                if getattr(cli, "superseded", False):
                    continue  # new owner holds the clientid — cede
                if getattr(cli, "connect_refused", None) is not None:
                    # permanent CONNACK refusal (bad clientid/credentials/
                    # not authorized) stopped the loop — respawning would
                    # storm doomed CONNECTs; transient refusals never kill
                    # the loop, so they never reach this branch
                    continue
                if self._member_dead(cli):
                    self.respawns += 1
                    self._clients[i] = self._spawn_member(i)

    def scale_to(self, members: int, drain_s: float = 1.0) -> None:
        """Dynamic resize of the shared-subscription group (round-10).

        Scale OUT spawns new members (broker round-robins new work to
        them immediately). Scale IN is the graceful three-step the
        broker's departure semantics expect: each departing member
        UNSUBSCRIBEs its ``$share`` filter (no new work; the broker
        immediately re-dispatches its never-delivered queue), gets a
        ``drain_s`` window in which deliveries already in flight keep
        flowing through the normal append-then-ack path, then
        disconnects — whatever it never acked re-dispatches to the
        surviving members (EMQX behavior, pinned by
        ``test_shared_group_graceful_scale_in_no_loss``). No message is
        lost or stranded in either direction; duplicates follow the
        at-least-once contract the spool consumer already de-dups.

        Retired member indices are reused on a later scale-out (same
        clientids, ``clean_start=False``) — safe because departure left
        their sessions empty.
        """
        import time as _time

        members = max(int(members), 0)
        cur = len(self._clients)
        if members > cur:
            fresh = [self._spawn_member(i) for i in range(cur, members)]
            self._clients.extend(fresh)
            # A reused index resumes its old session (clean_start=False,
            # session_present=1) so on_connect skips the subscribe — but
            # graceful departure REMOVED the subscription from that
            # session. Re-subscribe explicitly; harmless duplicate when
            # on_connect also subscribed (fresh session).
            for cli in fresh:
                deadline = _time.monotonic() + 10.0
                while _time.monotonic() < deadline:
                    try:
                        cli.subscribe(self._sub_topic, qos=self._qos)
                        break
                    except Exception:
                        _time.sleep(0.05)  # CONNACK not in yet
            return
        if members == cur:
            return
        departing = self._clients[members:]
        # shrink FIRST so the watchdog stops supervising departing
        # members (a respawn mid-departure would undo the unsubscribe)
        self._clients = self._clients[:members]
        for cli in departing:
            try:
                cli.unsubscribe(self._sub_topic)
            except Exception:
                pass  # already dead → broker detach re-dispatch covers it
        _time.sleep(drain_s)  # in-flight deliveries append+ack normally
        for cli in departing:
            self._announce_offline(cli)
            try:
                cli.disconnect()
            except Exception:
                pass

    @staticmethod
    def _announce_offline(cli) -> None:
        """Graceful departure: a clean DISCONNECT discards the will, so
        the last-known state is published explicitly (retained) first —
        monitors distinguish planned 'offline' from crashed 'dead'."""
        status = getattr(cli, "_graft_status", None)
        if status:
            try:
                info = cli.publish(status, b"offline", qos=1, retain=True)
                # Wait for the PUBACK before the caller's clean
                # DISCONNECT: with real paho the publish is queued to an
                # async network loop, and disconnect() right behind it
                # drops the frame — leaving a stale retained 'online' as
                # the topic's last-known state with no will to correct
                # it (clean disconnect discards the will). The embedded
                # client only worked by accident (synchronous socket
                # write). ADVICE r10 #2.
                info.wait_for_publish(timeout=1.0)
            except Exception:
                pass  # dead socket: the retained WILL tells the truth

    def stop(self) -> None:
        self._stopped.set()
        self._watchdog.join(timeout=2 * self.WATCHDOG_INTERVAL + 1)
        for cli in self._clients:
            self._announce_offline(cli)
            try:
                cli.disconnect()
            except Exception:
                pass
        with self._lock:
            self._pub.close()
