"""Broker sources/sinks against in-process fake brokers speaking the
real wire protocols (RESP2, NATS text, MQTT 3.1.1)."""

import json
import socket
import socketserver
import threading

import pytest

from vector_spark.sources_brokers import (
    MqttClient,
    RespError,
    RespParser,
    mqtt_connect_packet,
    mqtt_decode_packets,
    mqtt_publish_packet,
    mqtt_sink,
    mqtt_source,
    mqtt_subscribe_packet,
    nats_sink,
    nats_source,
    redis_channel_source,
    redis_list_source,
    redis_sink,
    resp_encode_command,
)


# ---- protocol codec unit tests -----------------------------------------


def test_resp_encode_command():
    assert resp_encode_command("LPOP", "k", 2) == (
        b"*3\r\n$4\r\nLPOP\r\n$1\r\nk\r\n$1\r\n2\r\n"
    )


def test_resp_parser_all_types():
    p = RespParser()
    p.feed(b"+OK\r\n:42\r\n$3\r\nabc\r\n$-1\r\n*2\r\n$1\r\na\r\n:7\r\n")
    assert p.next() == "OK"
    assert p.next() == 42
    assert p.next() == b"abc"
    assert p.next() is None
    assert p.next() == [b"a", 7]


def test_resp_parser_incremental_and_error():
    p = RespParser()
    p.feed(b"*2\r\n$5\r\nhel")
    first = p.next()
    assert first.__class__.__name__ == "_Incomplete"
    p.feed(b"lo\r\n$5\r\nworld\r\n")
    assert p.next() == [b"hello", b"world"]
    p.feed(b"-ERR nope\r\n")
    err = p.next()
    assert isinstance(err, RespError) and "nope" in str(err)


def test_mqtt_packet_roundtrip():
    pkts, rest = mqtt_decode_packets(
        mqtt_connect_packet("cid")
        + mqtt_subscribe_packet("t/#", qos=1, packet_id=7)
        + mqtt_publish_packet("t/a", b"payload")
        + mqtt_publish_packet("t/b", b"x", qos=1, packet_id=9,
                              retain=True)
    )
    assert rest == b""
    assert [p["type"] for p in pkts] == [1, 8, 3, 3]
    assert pkts[0]["client_id"] == "cid"
    assert pkts[0]["protocol_level"] == 4
    assert pkts[1] == {"type": 8, "packet_id": 7, "topic": "t/#", "qos": 1}
    assert pkts[2]["topic"] == "t/a" and pkts[2]["payload"] == b"payload"
    assert pkts[2]["qos"] == 0 and pkts[2]["retain"] is False
    assert pkts[3]["packet_id"] == 9 and pkts[3]["retain"] is True


def test_mqtt_decode_partial_keeps_remainder():
    full = mqtt_publish_packet("topic", b"0123456789")
    pkts, rest = mqtt_decode_packets(full[:5])
    assert pkts == [] and rest == full[:5]
    pkts, rest = mqtt_decode_packets(full + full[:3])
    assert len(pkts) == 1 and rest == full[:3]


def test_mqtt_varint_large_packet():
    big = mqtt_publish_packet("t", b"x" * 300)  # 2-byte varint length
    pkts, rest = mqtt_decode_packets(big)
    assert rest == b"" and len(pkts[0]["payload"]) == 300


# ---- fake brokers -------------------------------------------------------


class _FakeRedis(socketserver.ThreadingTCPServer):
    """Speaks enough RESP2 for LPOP/RPOP count, RPUSH/LPUSH, PUBLISH,
    ZADD, SUBSCRIBE."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self):
        self.lists: dict = {}
        self.zsets: dict = {}
        self.published: list = []
        self.sub_ready = threading.Event()
        self._sub_conns: list = []
        super().__init__(("127.0.0.1", 0), _FakeRedisHandler)


class _FakeRedisHandler(socketserver.BaseRequestHandler):
    def handle(self):
        srv = self.server
        parser = RespParser()
        subscribed = None
        while True:
            try:
                data = self.request.recv(65536)
            except OSError:
                return
            if not data:
                return
            parser.feed(data)
            while True:
                cmd = parser.next()
                if cmd.__class__.__name__ == "_Incomplete":
                    break
                name = cmd[0].decode().upper()
                if name in ("LPOP", "RPOP"):
                    key = cmd[1].decode()
                    n = int(cmd[2])
                    lst = srv.lists.get(key, [])
                    take = lst[:n] if name == "LPOP" else lst[-n:][::-1]
                    srv.lists[key] = (
                        lst[n:] if name == "LPOP"
                        else lst[:-n] if n < len(lst) else []
                    )
                    if not take:
                        self.request.sendall(b"*-1\r\n")
                    else:
                        out = [b"*%d\r\n" % len(take)]
                        for it in take:
                            out.append(b"$%d\r\n%s\r\n" % (len(it), it))
                        self.request.sendall(b"".join(out))
                elif name in ("RPUSH", "LPUSH"):
                    key = cmd[1].decode()
                    lst = srv.lists.setdefault(key, [])
                    for it in cmd[2:]:
                        if name == "RPUSH":
                            lst.append(it)
                        else:
                            lst.insert(0, it)
                    self.request.sendall(b":%d\r\n" % len(lst))
                elif name == "PUBLISH":
                    ch, payload = cmd[1], cmd[2]
                    srv.published.append((ch.decode(), payload))
                    n = 0
                    for conn, sub_ch in srv._sub_conns:
                        if sub_ch == ch.decode():
                            conn.sendall(
                                b"*3\r\n$7\r\nmessage\r\n"
                                b"$%d\r\n%s\r\n$%d\r\n%s\r\n"
                                % (len(ch), ch, len(payload), payload)
                            )
                            n += 1
                    self.request.sendall(b":%d\r\n" % n)
                elif name == "ZADD":
                    key = cmd[1].decode()
                    srv.zsets.setdefault(key, []).append(
                        (float(cmd[2]), cmd[3])
                    )
                    self.request.sendall(b":1\r\n")
                elif name == "SUBSCRIBE":
                    subscribed = cmd[1].decode()
                    srv._sub_conns.append((self.request, subscribed))
                    ch = cmd[1]
                    self.request.sendall(
                        b"*3\r\n$9\r\nsubscribe\r\n$%d\r\n%s\r\n:1\r\n"
                        % (len(ch), ch)
                    )
                    srv.sub_ready.set()
                else:
                    self.request.sendall(b"-ERR unknown\r\n")


@pytest.fixture()
def fake_redis():
    srv = _FakeRedis()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv, "127.0.0.1", srv.server_address[1]
    srv.shutdown()


def test_redis_list_source_lpop(spark, fake_redis):
    srv, host, port = fake_redis
    srv.lists["events"] = [b"a", b"b", b"c"]
    df = redis_list_source(spark, host, port, "events")
    rows = df.orderBy("seq").collect()
    assert [r["message"] for r in rows] == ["a", "b", "c"]
    assert rows[0]["redis_key"] == "events"
    assert rows[0]["source_type"] == "redis"
    assert srv.lists["events"] == []


def test_redis_list_source_rpop_max(spark, fake_redis):
    srv, host, port = fake_redis
    srv.lists["k"] = [b"1", b"2", b"3", b"4"]
    df = redis_list_source(spark, host, port, "k", method="rpop",
                           max_events=2, batch_count=2)
    assert [r["message"] for r in df.orderBy("seq").collect()] == [
        "4", "3",
    ]
    assert srv.lists["k"] == [b"1", b"2"]


def test_redis_sink_list_and_zset(spark, fake_redis):
    srv, host, port = fake_redis
    df = spark.createDataFrame(
        [("m1", 1.0), ("m2", 2.0)], "message string, score double"
    ).coalesce(1)
    n = redis_sink(df, host, port, "out")
    assert n == 2
    assert sorted(srv.lists["out"]) == [b"m1", b"m2"]
    n = redis_sink(df, host, port, "zs", data_type="sorted_set",
                   score_col="score")
    assert n == 2
    assert sorted(srv.zsets["zs"]) == [(1.0, b"m1"), (2.0, b"m2")]


def test_redis_pubsub_roundtrip(spark, fake_redis):
    srv, host, port = fake_redis
    result = {}

    def consume():
        result["df"] = redis_channel_source(
            spark, host, port, "chan", max_events=2
        )

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    assert srv.sub_ready.wait(10)
    pub = spark.createDataFrame([("x",), ("y",)], "message string") \
        .coalesce(1)
    redis_sink(pub, host, port, "chan", data_type="channel")
    t.join(timeout=30)
    assert not t.is_alive()
    msgs = {r["message"] for r in result["df"].collect()}
    assert msgs == {"x", "y"}
    assert [c for c, _ in srv.published] == ["chan", "chan"]


class _FakeNats(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self):
        self.published: list = []
        self.sub_ready = threading.Event()
        self._subs: list = []
        super().__init__(("127.0.0.1", 0), _FakeNatsHandler)


class _FakeNatsHandler(socketserver.BaseRequestHandler):
    def handle(self):
        srv = self.server
        self.request.sendall(
            b'INFO {"server_id":"fake","version":"0"}\r\n'
        )
        buf = bytearray()
        while True:
            try:
                data = self.request.recv(65536)
            except OSError:
                return
            if not data:
                return
            buf.extend(data)
            while True:
                idx = buf.find(b"\r\n")
                if idx < 0:
                    break
                line = bytes(buf[:idx])
                del buf[:idx + 2]
                if line.startswith(b"CONNECT"):
                    continue
                if line.startswith(b"SUB "):
                    _, subj, sid = line.split(b" ")
                    srv._subs.append((self.request, subj, sid))
                    srv.sub_ready.set()
                elif line.startswith(b"PUB "):
                    _, subj, nbytes = line.split(b" ")
                    n = int(nbytes)
                    while len(buf) < n + 2:
                        more = self.request.recv(65536)
                        if not more:
                            return
                        buf.extend(more)
                    payload = bytes(buf[:n])
                    del buf[:n + 2]
                    srv.published.append((subj.decode(), payload))
                    for conn, ssubj, sid in srv._subs:
                        if ssubj == subj:
                            conn.sendall(
                                b"MSG %s %s %d\r\n%s\r\n"
                                % (subj, sid, n, payload)
                            )


@pytest.fixture()
def fake_nats():
    srv = _FakeNats()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv, "127.0.0.1", srv.server_address[1]
    srv.shutdown()


def test_nats_roundtrip(spark, fake_nats):
    srv, host, port = fake_nats
    result = {}

    def consume():
        result["df"] = nats_source(spark, host, port, "logs.app",
                                   max_events=3)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    assert srv.sub_ready.wait(10)
    df = spark.createDataFrame(
        [("n1",), ("n2",), ("n3",)], "message string"
    ).coalesce(1)
    n = nats_sink(df, host, port, "logs.app")
    assert n == 3
    t.join(timeout=30)
    assert not t.is_alive()
    rows = result["df"].collect()
    assert {r["message"] for r in rows} == {"n1", "n2", "n3"}
    assert rows[0]["key"] == "logs.app"
    assert rows[0]["source_type"] == "nats"
    assert len(srv.published) == 3


def test_nats_sink_json_encoding(spark, fake_nats):
    srv, host, port = fake_nats
    df = spark.createDataFrame([("hello", 1)], "message string, n int") \
        .coalesce(1)
    nats_sink(df, host, port, "j", encoding="json")
    subj, payload = srv.published[0]
    assert subj == "j"
    assert json.loads(payload) == {"message": "hello", "n": 1}


class _FakeMqtt(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, drop_first_pubacks: int = 0,
                 drop_first_pubrecs: int = 0):
        self.published: list = []
        self.publish_packets: list = []  # full pkts incl. qos/dup/id
        self.pubacks_received: list = []  # acks from subscribers
        self.pubcomps_received: list = []  # qos2 completions from subs
        self.drop_first_pubacks = drop_first_pubacks
        self.drop_first_pubrecs = drop_first_pubrecs
        self.sub_ready = threading.Event()
        self._subs: list = []
        super().__init__(("127.0.0.1", 0), _FakeMqttHandler)


class _FakeMqttHandler(socketserver.BaseRequestHandler):
    def handle(self):
        from vector_spark.sources_brokers import (
            mqtt_encode_packet,
            mqtt_puback_packet,
            mqtt_pubcomp_packet,
            mqtt_pubrec_packet,
            mqtt_pubrel_packet,
        )

        srv = self.server
        rest = b""
        pending_qos2: dict = {}  # pid → pkt, awaiting PUBREL
        while True:
            try:
                data = self.request.recv(65536)
            except OSError:
                return
            if not data:
                return
            rest += data
            packets, rest = mqtt_decode_packets(rest)
            for pkt in packets:
                if pkt["type"] == 1:  # CONNECT → CONNACK accepted
                    self.request.sendall(
                        mqtt_encode_packet(2, 0, b"\x00\x00")
                    )
                elif pkt["type"] == 8:  # SUBSCRIBE → SUBACK
                    srv._subs.append(
                        (self.request, pkt["topic"], pkt["qos"])
                    )
                    self.request.sendall(mqtt_encode_packet(
                        9, 0,
                        pkt["packet_id"].to_bytes(2, "big")
                        + bytes([pkt["qos"]]),
                    ))
                    srv.sub_ready.set()
                elif pkt["type"] == 3:  # PUBLISH → (ack,) fan out
                    srv.publish_packets.append(pkt)
                    if pkt["qos"] == 2:
                        # receiver half of §4.3.3: store once per
                        # packet id, PUBREC, release on PUBREL
                        if srv.drop_first_pubrecs > 0:
                            srv.drop_first_pubrecs -= 1
                            continue  # lost PUBREC → DUP resend
                        pid = pkt["packet_id"]
                        if pid not in pending_qos2:
                            pending_qos2[pid] = pkt
                        self.request.sendall(mqtt_pubrec_packet(pid))
                        continue  # delivery happens on PUBREL
                    if pkt["qos"] == 1:
                        if srv.drop_first_pubacks > 0:
                            # simulate a lost PUBACK: message received
                            # but unacknowledged → client must resend
                            # with the DUP flag
                            srv.drop_first_pubacks -= 1
                            continue
                        self.request.sendall(
                            mqtt_puback_packet(pkt["packet_id"])
                        )
                    self._deliver(srv, pkt)
                elif pkt["type"] == 6:  # PUBREL (publisher finished)
                    pid = pkt["packet_id"]
                    held = pending_qos2.pop(pid, None)
                    self.request.sendall(mqtt_pubcomp_packet(pid))
                    if held is not None:
                        self._deliver(srv, held)
                elif pkt["type"] == 4:  # PUBACK from a subscriber
                    srv.pubacks_received.append(pkt["packet_id"])
                elif pkt["type"] == 5:  # PUBREC from a subscriber
                    self.request.sendall(
                        mqtt_pubrel_packet(pkt["packet_id"]))
                elif pkt["type"] == 7:  # PUBCOMP from a subscriber
                    srv.pubcomps_received.append(pkt["packet_id"])
                elif pkt["type"] == 14:  # DISCONNECT
                    return

    @staticmethod
    def _deliver(srv, pkt) -> None:
        srv.published.append((pkt["topic"], pkt["payload"]))
        for conn, topic, sub_qos in srv._subs:
            if topic == pkt["topic"]:
                out_qos = min(pkt["qos"], sub_qos)
                conn.sendall(mqtt_publish_packet(
                    pkt["topic"], pkt["payload"],
                    qos=out_qos,
                    packet_id=len(srv.published),
                ))


@pytest.fixture()
def fake_mqtt():
    srv = _FakeMqtt()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv, "127.0.0.1", srv.server_address[1]
    srv.shutdown()


def test_mqtt_client_handshake(fake_mqtt):
    _srv, host, port = fake_mqtt
    c = MqttClient(host, port, "t1")
    c.close()


def test_mqtt_roundtrip(spark, fake_mqtt):
    srv, host, port = fake_mqtt
    result = {}

    def consume():
        result["df"] = mqtt_source(spark, host, port, "sensors/a",
                                   max_events=2)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    assert srv.sub_ready.wait(10)
    df = spark.createDataFrame([("p1",), ("p2",)], "message string") \
        .coalesce(1)
    n = mqtt_sink(df, host, port, "sensors/a")
    assert n == 2
    t.join(timeout=30)
    assert not t.is_alive()
    rows = result["df"].collect()
    assert {r["message"] for r in rows} == {"p1", "p2"}
    assert rows[0]["key"] == "sensors/a"
    assert len(srv.published) == 2


def test_mqtt_qos1_publish_waits_for_puback(fake_mqtt):
    srv, host, port = fake_mqtt
    c = MqttClient(host, port, "q1")
    c.publish("t", b"hello", qos=1)
    c.close()
    pkts = [p for p in srv.publish_packets if p["type"] == 3]
    assert len(pkts) == 1
    assert pkts[0]["qos"] == 1 and pkts[0]["packet_id"] == 1
    assert not pkts[0]["dup"]


def test_mqtt_qos1_redelivery_on_missing_puback():
    """A dropped PUBACK must trigger a resend carrying the SAME packet
    id with the DUP flag set (MQTT 3.1.1 §4.4)."""
    srv = _FakeMqtt(drop_first_pubacks=1)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        host, port = srv.server_address
        c = MqttClient(host, port, "q1r", timeout=1.0)
        c.publish("t", b"again", qos=1)
        c.close()
        pkts = [p for p in srv.publish_packets if p["type"] == 3]
        assert len(pkts) == 2
        assert (pkts[0]["dup"], pkts[1]["dup"]) == (False, True)
        assert pkts[0]["packet_id"] == pkts[1]["packet_id"]
        assert len(srv.published) == 1  # delivered exactly once here
    finally:
        srv.shutdown()


def test_mqtt_qos1_source_acks_received_publishes(spark, fake_mqtt):
    srv, host, port = fake_mqtt
    result = {}

    def consume():
        result["df"] = mqtt_source(spark, host, port, "q/a",
                                   max_events=2, qos=1)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    assert srv.sub_ready.wait(10)
    df = spark.createDataFrame([("a1",), ("a2",)], "message string") \
        .coalesce(1)
    n = mqtt_sink(df, host, port, "q/a", qos=1)
    assert n == 2
    t.join(timeout=30)
    assert not t.is_alive()
    rows = result["df"].collect()
    assert {r["message"] for r in rows} == {"a1", "a2"}
    # the source PUBACKed both broker→subscriber deliveries
    assert len(srv.pubacks_received) == 2


def test_mqtt_invalid_qos_rejected(spark):
    with pytest.raises(ValueError, match="QoS 0/1/2"):
        mqtt_source(spark, "127.0.0.1", 1, "t", max_events=1, qos=3)
    with pytest.raises(ValueError, match="QoS 0/1/2"):
        mqtt_sink(spark.range(1), "127.0.0.1", 1, "t", qos=3)


def test_topology_redis_to_redis(spark, fake_redis):
    """Config loader wires `type: redis` source and sink end-to-end:
    drain one list, filter, push to another."""
    from vector_spark.config.loader import load_topology, run_sinks

    srv, host, port = fake_redis
    srv.lists["in"] = [b"keep-1", b"drop-2", b"keep-3"]
    topo = load_topology(spark, f"""
sources:
  rin:
    type: redis
    url: redis://{host}:{port}
    key: in
transforms:
  only_keep:
    type: filter
    inputs: [rin]
    condition: "message LIKE 'keep%'"
sinks:
  rout:
    type: redis
    url: redis://{host}:{port}
    key: out
    inputs: [only_keep]
""")
    results = run_sinks(topo)
    assert results["rout"]["sent"] == 2
    assert sorted(srv.lists["out"]) == [b"keep-1", b"keep-3"]
    assert srv.lists["in"] == []


# ---- AMQP ---------------------------------------------------------------

from vector_spark.sources_brokers import (  # noqa: E402
    AmqpClient,
    amqp_decode_frames,
    amqp_encode_frame,
    amqp_method_payload,
    amqp_parse_method,
    amqp_sink,
    amqp_source,
)


def test_amqp_frame_roundtrip():
    f = amqp_encode_frame(1, 3, amqp_method_payload(60, 40, b"\x00\x01"))
    frames, rest = amqp_decode_frames(f + f[:4])
    assert rest == f[:4]
    ftype, channel, payload = frames[0]
    assert (ftype, channel) == (1, 3)
    assert amqp_parse_method(payload) == (60, 40, b"\x00\x01")


def test_amqp_frame_end_octet_enforced():
    f = bytearray(amqp_encode_frame(1, 0, b"\x00\x0a\x00\x0a"))
    f[-1] = 0x00
    with pytest.raises(ValueError, match="frame-end"):
        amqp_decode_frames(bytes(f))


class _FakeAmqp(socketserver.ThreadingTCPServer):
    """Speaks the 0-9-1 handshake plus queue.declare / basic.get /
    basic.publish, storing messages per queue. basic.publish routes by
    routing_key == queue name (default-exchange semantics)."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self):
        self.queues: dict = {}
        self.auth_seen: list = []
        super().__init__(("127.0.0.1", 0), _FakeAmqpHandler)


class _FakeAmqpHandler(socketserver.BaseRequestHandler):
    def _send_method(self, channel, payload):
        self.request.sendall(amqp_encode_frame(1, channel, payload))

    def handle(self):
        from vector_spark.sources_brokers import (
            _amqp_longstr,
            _amqp_shortstr,
        )

        srv = self.server
        hdr = self.request.recv(8)
        if hdr != b"AMQP\x00\x00\x09\x01":
            return
        self._send_method(0, amqp_method_payload(
            10, 10, b"\x00\x09",            # version-major/minor
            _amqp_longstr(b""),             # server-properties {}
            _amqp_longstr(b"PLAIN"), _amqp_longstr(b"en_US"),
        ))
        rest = b""
        pending_publish = None  # (exchange, routing_key) awaiting content
        body_size = None
        while True:
            try:
                data = self.request.recv(65536)
            except OSError:
                return
            if not data:
                return
            rest += data
            frames, rest = amqp_decode_frames(rest)
            for ftype, _ch, payload in frames:
                if ftype == 2 and pending_publish:       # content header
                    body_size = int.from_bytes(payload[4:12], "big")
                    if body_size == 0:
                        self._store(pending_publish, b"")
                        pending_publish = None
                    continue
                if ftype == 3 and pending_publish:       # content body
                    self._store(pending_publish, payload)
                    pending_publish = None
                    continue
                if ftype != 1:
                    continue
                cls, mid, args = amqp_parse_method(payload)
                if (cls, mid) == (10, 11):               # start-ok
                    # client-props longstr, mechanism shortstr, response
                    pos = 4 + int.from_bytes(args[:4], "big")
                    mlen = args[pos]
                    pos += 1 + mlen
                    rlen = int.from_bytes(args[pos:pos + 4], "big")
                    srv.auth_seen.append(args[pos + 4:pos + 4 + rlen])
                    self._send_method(0, amqp_method_payload(
                        10, 30, b"\x07\xff",
                        (131072).to_bytes(4, "big"), b"\x00\x00",
                    ))                                   # connection.tune
                elif (cls, mid) == (10, 40):             # connection.open
                    self._send_method(0, amqp_method_payload(
                        10, 41, _amqp_shortstr("")
                    ))
                elif (cls, mid) == (20, 10):             # channel.open
                    self._send_method(1, amqp_method_payload(
                        20, 11, _amqp_longstr(b"")
                    ))
                elif (cls, mid) == (50, 10):             # queue.declare
                    qlen = args[2]
                    q = args[3:3 + qlen].decode()
                    srv.queues.setdefault(q, [])
                    self._send_method(1, amqp_method_payload(
                        50, 11, _amqp_shortstr(q),
                        (0).to_bytes(4, "big"), (0).to_bytes(4, "big"),
                    ))
                elif (cls, mid) == (60, 70):             # basic.get
                    qlen = args[2]
                    q = args[3:3 + qlen].decode()
                    msgs = srv.queues.get(q, [])
                    if not msgs:
                        self._send_method(1, amqp_method_payload(
                            60, 72, _amqp_shortstr("")
                        ))
                    else:
                        body = msgs.pop(0)
                        self._send_method(1, amqp_method_payload(
                            60, 71,
                            (1).to_bytes(8, "big"), b"\x00",  # tag, redeliv
                            _amqp_shortstr(""),               # exchange
                            _amqp_shortstr(q),                # routing key
                            (len(msgs)).to_bytes(4, "big"),   # message-count
                        ))
                        header = ((60).to_bytes(2, "big") + b"\x00\x00"
                                  + len(body).to_bytes(8, "big")
                                  + b"\x00\x00")
                        self.request.sendall(
                            amqp_encode_frame(2, 1, header)
                            + amqp_encode_frame(3, 1, body)
                        )
                elif (cls, mid) == (60, 40):             # basic.publish
                    elen = args[2]
                    exchange = args[3:3 + elen].decode()
                    pos = 3 + elen
                    rlen = args[pos]
                    rk = args[pos + 1:pos + 1 + rlen].decode()
                    pending_publish = (exchange, rk)

    def _store(self, pub, body):
        _exchange, rk = pub
        self.server.queues.setdefault(rk, []).append(body)


@pytest.fixture()
def fake_amqp():
    srv = _FakeAmqp()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv, "127.0.0.1", srv.server_address[1]
    srv.shutdown()


def test_amqp_client_handshake_and_declare(fake_amqp):
    srv, host, port = fake_amqp
    c = AmqpClient(host, port, user="u", password="p")
    c.queue_declare("q1")
    c.close()
    assert "q1" in srv.queues
    assert srv.auth_seen == [b"\x00u\x00p"]


def test_amqp_source_drains_queue(spark, fake_amqp):
    srv, host, port = fake_amqp
    srv.queues["logs"] = [b"e1", b"e2", b"e3"]
    df = amqp_source(spark, host, port, "logs")
    rows = df.orderBy("seq").collect()
    assert [r["message"] for r in rows] == ["e1", "e2", "e3"]
    assert rows[0]["routing_key"] == "logs"
    assert rows[0]["source_type"] == "amqp"
    assert srv.queues["logs"] == []


def test_amqp_sink_publishes(spark, fake_amqp):
    srv, host, port = fake_amqp
    df = spark.createDataFrame([("m1",), ("m2",)], "message string") \
        .coalesce(1)
    n = amqp_sink(df, host, port, exchange="", routing_key="out")
    assert n == 2
    assert sorted(srv.queues["out"]) == [b"m1", b"m2"]


def test_amqp_roundtrip_via_topology(spark, fake_amqp):
    from vector_spark.config.loader import load_topology, run_sinks

    srv, host, port = fake_amqp
    srv.queues["in"] = [b"x-1", b"y-2"]
    topo = load_topology(spark, f"""
sources:
  ain: {{type: amqp, host: {host}, port: {port}, queue: in}}
sinks:
  aout:
    type: amqp
    host: {host}
    port: {port}
    exchange: ""
    routing_key: out
    inputs: [ain]
""")
    results = run_sinks(topo)
    assert results["aout"]["sent"] == 2
    assert sorted(srv.queues["out"]) == [b"x-1", b"y-2"]


# ---- Pulsar -------------------------------------------------------------

from vector_spark.sources_brokers import (  # noqa: E402
    PULSAR_ACK,
    PULSAR_CONNECT,
    PULSAR_CONNECTED,
    PULSAR_FLOW,
    PULSAR_MESSAGE,
    PULSAR_PRODUCER,
    PULSAR_PRODUCER_SUCCESS,
    PULSAR_SEND,
    PULSAR_SEND_RECEIPT,
    PULSAR_SUBSCRIBE,
    PULSAR_SUCCESS,
    crc32c,
    pulsar_decode_frame,
    pulsar_encode_command,
    pulsar_encode_send,
    pulsar_sink,
    pulsar_source,
)


def test_crc32c_spec_vector():
    # the RFC 3720 / iSCSI check value for "123456789"
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_pulsar_frame_roundtrip_and_crc():
    f = pulsar_encode_send(
        {"type": PULSAR_SEND,
         "send": {"producer_id": 7, "sequence_id": 3, "num_messages": 1}},
        {"producer_name": "p1", "sequence_id": 3, "publish_time": 99,
         "properties": [{"key": "a", "value": "b"}]},
        b"payload-bytes",
    )
    total = int.from_bytes(f[:4], "big")
    assert total == len(f) - 4
    cmd, meta, payload = pulsar_decode_frame(f[4:])
    assert cmd["send"] == {"producer_id": 7, "sequence_id": 3,
                           "num_messages": 1}
    assert meta["producer_name"] == "p1"
    assert meta["properties"] == [{"key": "a", "value": "b"}]
    assert payload == b"payload-bytes"
    # corrupt one payload byte -> CRC failure
    bad = bytearray(f)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        pulsar_decode_frame(bytes(bad[4:]))


class _FakePulsar(socketserver.ThreadingTCPServer):
    """Binary-protocol fake: CONNECTED handshake, producer registry,
    SEND→receipt + store, SUBSCRIBE/FLOW→MESSAGE delivery, ACK
    tracking."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self):
        self.topics: dict = {}
        self.acked: list = []
        self.sub_ready = threading.Event()
        self._consumers: list = []
        super().__init__(("127.0.0.1", 0), _FakePulsarHandler)


class _FakePulsarHandler(socketserver.BaseRequestHandler):
    def _send(self, cmd):
        self.request.sendall(pulsar_encode_command(cmd))

    def handle(self):
        srv = self.server
        rest = b""
        entry = 0
        while True:
            try:
                data = self.request.recv(65536)
            except OSError:
                return
            if not data:
                return
            rest += data
            while len(rest) >= 4:
                total = int.from_bytes(rest[:4], "big")
                if len(rest) < 4 + total:
                    break
                frame = rest[4:4 + total]
                rest = rest[4 + total:]
                cmd, meta, payload = pulsar_decode_frame(frame)
                t = cmd["type"]
                if t == PULSAR_CONNECT:
                    self._send({"type": PULSAR_CONNECTED,
                                "connected": {"server_version": "fake"}})
                elif t == PULSAR_PRODUCER:
                    self._topic = cmd["producer"]["topic"]
                    self._send({
                        "type": PULSAR_PRODUCER_SUCCESS,
                        "producer_success": {
                            "request_id": cmd["producer"]["request_id"],
                            "producer_name": "fake-producer",
                        },
                    })
                elif t == PULSAR_SEND:
                    topic = self._topic
                    srv.topics.setdefault(topic, []).append(payload)
                    self._send({
                        "type": PULSAR_SEND_RECEIPT,
                        "send_receipt": {
                            "producer_id": cmd["send"]["producer_id"],
                            "sequence_id": cmd["send"]["sequence_id"],
                            "message_id": {"ledgerId": 1,
                                           "entryId": entry},
                        },
                    })
                    entry += 1
                    for conn, ctopic, cid in srv._consumers:
                        if ctopic == topic:
                            conn.sendall(pulsar_encode_send(
                                {"type": PULSAR_MESSAGE,
                                 "message": {
                                     "consumer_id": cid,
                                     "message_id": {"ledgerId": 1,
                                                    "entryId": entry},
                                 }},
                                {"producer_name": "fake-producer",
                                 "sequence_id": 0, "publish_time": 1},
                                payload,
                            ))
                elif t == PULSAR_SUBSCRIBE:
                    self._send({
                        "type": PULSAR_SUCCESS,
                        "success": {
                            "request_id": cmd["subscribe"]["request_id"]
                        },
                    })
                    srv._consumers.append((
                        self.request, cmd["subscribe"]["topic"],
                        cmd["subscribe"]["consumer_id"],
                    ))
                elif t == PULSAR_FLOW:
                    srv.sub_ready.set()
                elif t == PULSAR_ACK:
                    srv.acked.extend(
                        m["entryId"] for m in cmd["ack"]["message_id"]
                    )


@pytest.fixture()
def fake_pulsar():
    srv = _FakePulsar()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv, "127.0.0.1", srv.server_address[1]
    srv.shutdown()


def test_pulsar_sink_publishes(spark, fake_pulsar):
    srv, host, port = fake_pulsar
    df = spark.createDataFrame([("p1",), ("p2",)], "message string") \
        .coalesce(1)
    n = pulsar_sink(df, host, port, "persistent://public/default/t1")
    assert n == 2
    assert sorted(srv.topics["persistent://public/default/t1"]) == [
        b"p1", b"p2",
    ]


def test_pulsar_roundtrip(spark, fake_pulsar):
    srv, host, port = fake_pulsar
    result = {}

    def consume():
        result["df"] = pulsar_source(
            spark, host, port, "persistent://public/default/t2",
            max_events=2,
        )

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    assert srv.sub_ready.wait(10)
    df = spark.createDataFrame([("m1",), ("m2",)], "message string") \
        .coalesce(1)
    pulsar_sink(df, host, port, "persistent://public/default/t2")
    t.join(timeout=30)
    assert not t.is_alive()
    rows = result["df"].collect()
    assert {r["message"] for r in rows} == {"m1", "m2"}
    assert rows[0]["key"] == "persistent://public/default/t2"
    assert rows[0]["source_type"] == "pulsar"
    assert len(srv.acked) == 2  # each delivered message ACKed


def test_mqtt_qos2_publish_full_handshake(fake_mqtt):
    """QoS 2 sender flow (§4.3.3): PUBLISH → PUBREC → PUBREL →
    PUBCOMP; the broker stores the message exactly once and only
    releases it on PUBREL."""
    srv, host, port = fake_mqtt
    c = MqttClient(host, port, "q2")
    c.publish("t2", b"once", qos=2)
    c.close()
    pkts = [p for p in srv.publish_packets if p["type"] == 3]
    assert len(pkts) == 1
    assert pkts[0]["qos"] == 2 and not pkts[0]["dup"]
    assert srv.published == [("t2", b"once")]


def test_mqtt_qos2_redelivery_on_missing_pubrec():
    """A dropped PUBREC must trigger a PUBLISH resend with the SAME
    packet id + DUP; the broker's packet-id dedup still yields exactly
    one stored message."""
    srv = _FakeMqtt(drop_first_pubrecs=1)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        host, port = srv.server_address
        c = MqttClient(host, port, "q2r", timeout=1.0)
        c.publish("t2", b"exactly", qos=2)
        c.close()
        pkts = [p for p in srv.publish_packets if p["type"] == 3]
        assert len(pkts) == 2
        assert (pkts[0]["dup"], pkts[1]["dup"]) == (False, True)
        assert pkts[0]["packet_id"] == pkts[1]["packet_id"]
        assert srv.published == [("t2", b"exactly")]
    finally:
        srv.shutdown()


def test_mqtt_qos2_source_receiver_flow(spark, fake_mqtt):
    """Subscriber half: the source PUBRECs each QoS-2 publish,
    delivers once per packet id, and PUBCOMPs the broker's PUBREL."""
    srv, host, port = fake_mqtt
    result = {}

    def consume():
        result["df"] = mqtt_source(spark, host, port, "q2/a",
                                   max_events=2, qos=2)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    assert srv.sub_ready.wait(10)
    c = MqttClient(host, port, "q2pub")
    c.publish("q2/a", b"m1", qos=2)
    c.publish("q2/a", b"m2", qos=2)
    c.close()
    t.join(timeout=30)
    assert not t.is_alive()
    rows = result["df"].collect()
    assert {r["message"] for r in rows} == {"m1", "m2"}
    # the subscriber completed both broker-side QoS-2 handshakes
    assert len(srv.pubcomps_received) == 2


def test_mqtt_multiple_topics(spark, fake_mqtt):
    """`topic` accepts a list (the reference's multiple-topics
    support): one subscription per topic, the matched topic in key."""
    srv, host, port = fake_mqtt
    result = {}

    def consume():
        result["df"] = mqtt_source(
            spark, host, port, ["t/one", "t/two"], max_events=2)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    assert srv.sub_ready.wait(10)
    one = spark.createDataFrame([("a",)], "message string").coalesce(1)
    two = spark.createDataFrame([("b",)], "message string").coalesce(1)
    assert mqtt_sink(one, host, port, "t/one") == 1
    assert mqtt_sink(two, host, port, "t/two") == 1
    t.join(timeout=30)
    assert not t.is_alive()
    got = {(r["key"], r["message"]) for r in result["df"].collect()}
    assert got == {("t/one", "a"), ("t/two", "b")}
