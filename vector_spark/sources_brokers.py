"""Message-broker sources/sinks over their real wire protocols.

The reference's broker families (src/sources/redis/, src/sinks/redis/,
src/sources/nats.rs, src/sinks/nats/, src/sources/mqtt/, src/sinks/mqtt/)
were documented non-goals while "live broker" implied a vendor client
library. None of the three actually needs one: RESP (Redis), the NATS
text protocol, and MQTT 3.1.1 packets are small, publicly specified wire
formats. This module implements each codec from its public spec plus
thin socket clients, so the sources/sinks speak to real brokers — and to
the in-process fake brokers the tests run.

Scale shape: sources are driver-side bounded pulls (one tiny socket per
poll — the same shape as exec/http_client; a 1000-executor cluster would
run many independent topologies, each with its own connection). Sinks
use ``foreachPartition`` so every executor core holds its own broker
connection and the DataFrame never funnels through the driver.

Protocol references (public specs, no vendor code):
- RESP2: https://redis.io/docs/reference/protocol-spec/
- NATS:  https://docs.nats.io/reference/reference-protocols/nats-protocol
- MQTT 3.1.1: OASIS standard, mqtt-v3.1.1-os.html
"""

from __future__ import annotations

import json
import socket

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "message string, key string, source_type string, seq long"
)


# ---- RESP (Redis Serialization Protocol, v2) ----------------------------


def resp_encode_command(*args) -> bytes:
    """Encode one command as a RESP array of bulk strings — the only
    form clients send (protocol-spec 'Sending commands to a Redis
    server')."""
    out = [b"*%d\r\n" % len(args)]
    for a in args:
        b = a if isinstance(a, bytes) else str(a).encode("utf-8")
        out.append(b"$%d\r\n%s\r\n" % (len(b), b))
    return b"".join(out)


class RespParser:
    """Incremental RESP2 reply parser: feed() bytes, next() replies.

    Replies decode to: str (+simple), RespError (-error), int (:),
    bytes/None ($bulk / $-1), list (*array / *-1 → None). Pub/sub
    pushes arrive as plain arrays in RESP2, so one parser covers both
    request/reply and subscribe mode."""

    def __init__(self) -> None:
        self._buf = bytearray()

    def feed(self, data: bytes) -> None:
        self._buf.extend(data)

    def _read_line(self, pos: int):
        idx = self._buf.find(b"\r\n", pos)
        if idx < 0:
            return None, pos
        return bytes(self._buf[pos:idx]), idx + 2

    def _parse(self, pos: int):
        line, npos = self._read_line(pos)
        if line is None:
            return _INCOMPLETE, pos
        kind, rest = line[:1], line[1:]
        if kind == b"+":
            return rest.decode("utf-8"), npos
        if kind == b"-":
            return RespError(rest.decode("utf-8")), npos
        if kind == b":":
            return int(rest), npos
        if kind == b"$":
            n = int(rest)
            if n == -1:
                return None, npos
            if len(self._buf) < npos + n + 2:
                return _INCOMPLETE, pos
            return bytes(self._buf[npos:npos + n]), npos + n + 2
        if kind == b"*":
            n = int(rest)
            if n == -1:
                return None, npos
            items = []
            for _ in range(n):
                item, npos2 = self._parse(npos)
                if item is _INCOMPLETE:
                    return _INCOMPLETE, pos
                items.append(item)
                npos = npos2
            return items, npos
        raise ValueError(f"bad RESP type byte: {kind!r}")

    def next(self):
        """One complete reply, or _INCOMPLETE if more bytes are needed."""
        reply, pos = self._parse(0)
        if reply is not _INCOMPLETE:
            del self._buf[:pos]
        return reply


class RespError(Exception):
    pass


class _Incomplete:
    __slots__ = ()


_INCOMPLETE = _Incomplete()


class RedisClient:
    """Minimal socket Redis client (command/reply + subscribe loop)."""

    def __init__(self, host: str, port: int, timeout: float = 10.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.parser = RespParser()

    def _recv_reply(self):
        while True:
            reply = self.parser.next()
            if reply is not _INCOMPLETE:
                if isinstance(reply, RespError):
                    raise reply
                return reply
            data = self.sock.recv(65536)
            if not data:
                raise ConnectionError("redis connection closed")
            self.parser.feed(data)

    def command(self, *args):
        self.sock.sendall(resp_encode_command(*args))
        return self._recv_reply()

    def close(self) -> None:
        self.sock.close()


def redis_list_source(
    spark: SparkSession,
    host: str,
    port: int,
    key: str,
    method: str = "lpop",
    max_events: int | None = None,
    batch_count: int = 128,
    redis_key_field: str = "redis_key",
    timeout_secs: float = 10.0,
) -> DataFrame:
    """Drain a Redis list into a DataFrame (reference
    src/sources/redis/list.rs): ``lpop`` pops from the head, ``rpop``
    from the tail, until the list is empty or ``max_events``. Pops in
    ``COUNT``-batches (one round-trip per 128 messages, not per
    message). Each event carries the key under ``redis_key_field``
    (src/sources/redis/mod.rs:110-118)."""
    if method not in ("lpop", "rpop"):
        raise ValueError("method must be lpop or rpop")
    client = RedisClient(host, port, timeout_secs)
    rows: list[tuple] = []
    try:
        while max_events is None or len(rows) < max_events:
            want = batch_count
            if max_events is not None:
                want = min(want, max_events - len(rows))
            batch = client.command(method.upper(), key, want)
            if not batch:
                break
            for item in batch:
                text = item.decode("utf-8", errors="replace")
                rows.append((text, key, "redis", len(rows)))
    finally:
        client.close()
    return spark.createDataFrame(rows, EVENT_SCHEMA).withColumnRenamed(
        "key", redis_key_field
    ).withColumn("ts", F.current_timestamp())


def redis_channel_source(
    spark: SparkSession,
    host: str,
    port: int,
    channel: str,
    max_events: int,
    redis_key_field: str = "redis_key",
    timeout_secs: float = 10.0,
) -> DataFrame:
    """SUBSCRIBE to a channel and collect ``max_events`` messages
    (reference src/sources/redis/channel.rs). RESP2 delivers pub/sub
    pushes as 3-element arrays ['message', channel, payload]; the
    initial ['subscribe', ch, n] confirmation is skipped."""
    client = RedisClient(host, port, timeout_secs)
    rows: list[tuple] = []
    try:
        client.sock.sendall(resp_encode_command("SUBSCRIBE", channel))
        while len(rows) < max_events:
            push = client._recv_reply()
            if not isinstance(push, list) or not push:
                continue
            kind = push[0]
            kind = kind.decode() if isinstance(kind, bytes) else str(kind)
            if kind != "message":
                continue
            payload = push[2]
            text = (
                payload.decode("utf-8", errors="replace")
                if isinstance(payload, bytes) else str(payload)
            )
            rows.append((text, channel, "redis", len(rows)))
    finally:
        client.close()
    return spark.createDataFrame(rows, EVENT_SCHEMA).withColumnRenamed(
        "key", redis_key_field
    ).withColumn("ts", F.current_timestamp())


def redis_sink(
    df: DataFrame,
    host: str,
    port: int,
    key: str,
    data_type: str = "list",
    method: str = "rpush",
    score_col: str | None = None,
    value_col: str = "message",
    encoding: str = "text",
    timeout_secs: float = 10.0,
) -> int:
    """Push a DataFrame to Redis (reference src/sinks/redis/config.rs):
    ``list`` with rpush/lpush (rpush appends at the tail — the default,
    config.rs:63), ``channel`` PUBLISH, or ``sorted_set`` ZADD with the
    score taken from ``score_col``. One connection per partition
    (foreachPartition), commands pipelined with replies drained every
    ``DRAIN_EVERY`` (512) commands — bounded pipeline depth so the
    server's output buffer can't fill and deadlock sendall, while
    still avoiding per-row round trips. Returns the row count."""
    if data_type not in ("list", "channel", "sorted_set"):
        raise ValueError(f"bad data_type: {data_type}")
    if data_type == "list" and method not in ("rpush", "lpush"):
        raise ValueError(f"bad list method: {method}")
    if data_type == "sorted_set" and not score_col:
        raise ValueError("sorted_set needs score_col")

    if encoding == "json":
        payload = F.to_json(F.struct(*df.columns))
    else:
        payload = F.col(value_col).cast("string")
    cols = [payload.alias("_payload")]
    if score_col:
        cols.append(F.col(score_col).cast("double").alias("_score"))
    out = df.select(*cols)
    counter = df.sparkSession.sparkContext.accumulator(0)

    # Pipeline depth cap: replies are drained every DRAIN_EVERY
    # commands rather than once after the whole partition — an
    # unbounded pipeline fills the server's output buffer and our
    # receive buffer, the server stops reading, and sendall blocks
    # until the socket timeout kills the task.
    DRAIN_EVERY = 512

    def push_partition(rows) -> None:
        client = None
        sent = 0
        unread = 0
        try:
            for row in rows:
                if client is None:
                    client = RedisClient(host, port, timeout_secs)
                if data_type == "list":
                    cmd = resp_encode_command(
                        method.upper(), key, row["_payload"]
                    )
                elif data_type == "channel":
                    cmd = resp_encode_command("PUBLISH", key,
                                              row["_payload"])
                else:
                    cmd = resp_encode_command(
                        "ZADD", key, row["_score"], row["_payload"]
                    )
                client.sock.sendall(cmd)
                sent += 1
                unread += 1
                if unread >= DRAIN_EVERY:
                    for _ in range(unread):
                        client._recv_reply()
                    unread = 0
            if client is not None:
                for _ in range(unread):
                    client._recv_reply()
        finally:
            if client is not None:
                client.close()
        counter.add(sent)

    out.foreachPartition(push_partition)
    return counter.value


# ---- NATS text protocol -------------------------------------------------


class NatsClient:
    """Minimal NATS client (CONNECT / PUB / SUB / MSG / PING-PONG) over
    the documented text protocol."""

    def __init__(self, host: str, port: int, timeout: float = 10.0,
                 name: str = "vector_spark"):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self._buf = bytearray()
        info = self._read_line()  # server greets with INFO {...}
        if not info.startswith(b"INFO "):
            raise ConnectionError(f"not a NATS server: {info[:40]!r}")
        self.server_info = json.loads(info[5:])
        self.sock.sendall(
            b"CONNECT "
            + json.dumps({"verbose": False, "name": name}).encode()
            + b"\r\n"
        )

    def _fill(self) -> None:
        data = self.sock.recv(65536)
        if not data:
            raise ConnectionError("nats connection closed")
        self._buf.extend(data)

    def _read_line(self) -> bytes:
        while True:
            idx = self._buf.find(b"\r\n")
            if idx >= 0:
                line = bytes(self._buf[:idx])
                del self._buf[:idx + 2]
                return line
            self._fill()

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n + 2:  # payload + trailing \r\n
            self._fill()
        data = bytes(self._buf[:n])
        del self._buf[:n + 2]
        return data

    def publish(self, subject: str, payload: bytes) -> None:
        self.sock.sendall(
            b"PUB %s %d\r\n%s\r\n"
            % (subject.encode(), len(payload), payload)
        )

    def subscribe(self, subject: str, sid: str = "1") -> None:
        self.sock.sendall(b"SUB %s %s\r\n" % (subject.encode(),
                                              sid.encode()))

    def next_msg(self):
        """(subject, sid, reply_to, payload) from the next MSG; answers
        PING transparently."""
        while True:
            line = self._read_line()
            if line.startswith(b"MSG "):
                parts = line.split(b" ")
                # MSG <subject> <sid> [reply-to] <#bytes>
                subject, sid = parts[1], parts[2]
                reply = parts[3] if len(parts) == 5 else None
                nbytes = int(parts[-1])
                payload = self._read_exact(nbytes)
                return (subject.decode(), sid.decode(),
                        reply.decode() if reply else None, payload)
            if line == b"PING":
                self.sock.sendall(b"PONG\r\n")
            # +OK / INFO updates are ignored

    def close(self) -> None:
        self.sock.close()


def nats_source(
    spark: SparkSession,
    host: str,
    port: int,
    subject: str,
    max_events: int,
    timeout_secs: float = 10.0,
) -> DataFrame:
    """SUB a subject and collect ``max_events`` messages (reference
    src/sources/nats.rs; the subject lands in the ``key`` column like
    the reference's subject_key_field)."""
    client = NatsClient(host, port, timeout_secs)
    rows: list[tuple] = []
    try:
        client.subscribe(subject)
        while len(rows) < max_events:
            subj, _sid, _reply, payload = client.next_msg()
            rows.append((payload.decode("utf-8", errors="replace"),
                         subj, "nats", len(rows)))
    finally:
        client.close()
    return spark.createDataFrame(rows, EVENT_SCHEMA).withColumn(
        "ts", F.current_timestamp()
    )


def nats_sink(
    df: DataFrame,
    host: str,
    port: int,
    subject: str,
    value_col: str = "message",
    encoding: str = "text",
    timeout_secs: float = 10.0,
) -> int:
    """PUB each row to a subject (reference src/sinks/nats/). One
    connection per partition; PUBs are streamed without per-message
    acks (NATS is fire-and-forget at the protocol level, like the
    reference's non-confirmed mode)."""
    if encoding == "json":
        payload = F.to_json(F.struct(*df.columns))
    else:
        payload = F.col(value_col).cast("string")
    out = df.select(payload.alias("_payload"))
    counter = df.sparkSession.sparkContext.accumulator(0)

    def push_partition(rows) -> None:
        client = None
        sent = 0
        try:
            for row in rows:
                if client is None:
                    client = NatsClient(host, port, timeout_secs)
                client.publish(subject, row["_payload"].encode("utf-8"))
                sent += 1
        finally:
            if client is not None:
                client.close()
        counter.add(sent)

    out.foreachPartition(push_partition)
    return counter.value


# ---- MQTT 3.1.1 packets -------------------------------------------------

_MQTT_CONNECT, _MQTT_CONNACK = 1, 2
_MQTT_PUBLISH, _MQTT_PUBACK = 3, 4
_MQTT_PUBREC, _MQTT_PUBREL, _MQTT_PUBCOMP = 5, 6, 7
_MQTT_SUBSCRIBE, _MQTT_SUBACK = 8, 9
_MQTT_PINGREQ, _MQTT_PINGRESP, _MQTT_DISCONNECT = 12, 13, 14


def _mqtt_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return len(b).to_bytes(2, "big") + b


def _mqtt_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        byte = n % 128
        n //= 128
        out.append(byte | (0x80 if n else 0))
        if not n:
            return bytes(out)


def mqtt_encode_packet(ptype: int, flags: int, payload: bytes) -> bytes:
    """Fixed header (type<<4 | flags, remaining-length varint) + body —
    MQTT 3.1.1 §2.2."""
    return bytes([(ptype << 4) | flags]) + _mqtt_varint(len(payload)) \
        + payload


def mqtt_connect_packet(client_id: str, keep_alive: int = 60) -> bytes:
    body = (
        _mqtt_string("MQTT") + bytes([4])  # protocol level 4 = 3.1.1
        + bytes([0x02])                    # clean session
        + keep_alive.to_bytes(2, "big")
        + _mqtt_string(client_id)
    )
    return mqtt_encode_packet(_MQTT_CONNECT, 0, body)


def mqtt_publish_packet(topic: str, payload: bytes, qos: int = 0,
                        packet_id: int = 1, retain: bool = False,
                        dup: bool = False) -> bytes:
    flags = (qos << 1) | (1 if retain else 0) | (0x08 if dup else 0)
    body = _mqtt_string(topic)
    if qos > 0:
        body += packet_id.to_bytes(2, "big")
    return mqtt_encode_packet(_MQTT_PUBLISH, flags, body + payload)


def mqtt_puback_packet(packet_id: int) -> bytes:
    return mqtt_encode_packet(_MQTT_PUBACK, 0,
                              packet_id.to_bytes(2, "big"))


def mqtt_pubrec_packet(packet_id: int) -> bytes:
    return mqtt_encode_packet(_MQTT_PUBREC, 0,
                              packet_id.to_bytes(2, "big"))


def mqtt_pubrel_packet(packet_id: int) -> bytes:
    # PUBREL's fixed-header flags MUST be 0b0010 (spec §3.6.1)
    return mqtt_encode_packet(_MQTT_PUBREL, 0b0010,
                              packet_id.to_bytes(2, "big"))


def mqtt_pubcomp_packet(packet_id: int) -> bytes:
    return mqtt_encode_packet(_MQTT_PUBCOMP, 0,
                              packet_id.to_bytes(2, "big"))


def mqtt_subscribe_packet(topic: str, qos: int = 0,
                          packet_id: int = 1) -> bytes:
    body = packet_id.to_bytes(2, "big") + _mqtt_string(topic) + bytes([qos])
    return mqtt_encode_packet(_MQTT_SUBSCRIBE, 0b0010, body)


def mqtt_decode_packets(data: bytes) -> tuple[list, bytes]:
    """Split a byte stream into decoded packets + unconsumed remainder.

    Each packet decodes to a dict with ``type`` and type-specific
    fields; PUBLISH yields topic/qos/retain/payload (and packet_id for
    qos>0) — the subset the source/sink conversation uses."""
    packets: list[dict] = []
    pos = 0
    while pos < len(data):
        if pos + 2 > len(data):
            break
        first = data[pos]
        # remaining-length varint (max 4 bytes)
        rl, shift, vpos = 0, 0, pos + 1
        while True:
            if vpos >= len(data):
                return packets, data[pos:]
            byte = data[vpos]
            rl |= (byte & 0x7F) << shift
            vpos += 1
            if not byte & 0x80:
                break
            shift += 7
            if shift > 21:
                raise ValueError("malformed MQTT remaining length")
        if vpos + rl > len(data):
            return packets, data[pos:]
        body = data[vpos:vpos + rl]
        ptype, flags = first >> 4, first & 0x0F
        pkt: dict = {"type": ptype}
        if ptype == _MQTT_PUBLISH:
            tlen = int.from_bytes(body[:2], "big")
            pkt["topic"] = body[2:2 + tlen].decode("utf-8")
            qos = (flags >> 1) & 0x03
            pkt["qos"], pkt["retain"] = qos, bool(flags & 1)
            pkt["dup"] = bool(flags & 0x08)
            off = 2 + tlen
            if qos > 0:
                pkt["packet_id"] = int.from_bytes(body[off:off + 2], "big")
                off += 2
            pkt["payload"] = body[off:]
        elif ptype in (_MQTT_PUBACK, _MQTT_PUBREC, _MQTT_PUBREL,
                       _MQTT_PUBCOMP):
            pkt["packet_id"] = int.from_bytes(body[:2], "big")
        elif ptype == _MQTT_CONNACK:
            pkt["session_present"] = bool(body[0] & 1)
            pkt["return_code"] = body[1]
        elif ptype == _MQTT_SUBACK:
            pkt["packet_id"] = int.from_bytes(body[:2], "big")
            pkt["return_codes"] = list(body[2:])
        elif ptype == _MQTT_CONNECT:
            plen = int.from_bytes(body[:2], "big")
            off = 2 + plen + 1 + 1 + 2  # name, level, flags, keepalive
            pkt["protocol_name"] = body[2:2 + plen].decode()
            pkt["protocol_level"] = body[2 + plen]
            cid_len = int.from_bytes(body[off:off + 2], "big")
            pkt["client_id"] = body[off + 2:off + 2 + cid_len].decode()
        elif ptype == _MQTT_SUBSCRIBE:
            pkt["packet_id"] = int.from_bytes(body[:2], "big")
            tlen = int.from_bytes(body[2:4], "big")
            pkt["topic"] = body[4:4 + tlen].decode("utf-8")
            pkt["qos"] = body[4 + tlen]
        packets.append(pkt)
        pos = vpos + rl
    return packets, data[pos:]


class MqttClient:
    """Minimal MQTT 3.1.1 client: CONNECT/CONNACK handshake, QoS-0/1
    publish (QoS 1 waits for PUBACK and redelivers with the DUP flag
    on timeout — spec §4.4 at-least-once), subscribe + packet pump."""

    def __init__(self, host: str, port: int, client_id: str,
                 timeout: float = 10.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self._rest = b""
        self._queue: list[dict] = []
        self._next_pid = 0
        self.sock.sendall(mqtt_connect_packet(client_id))
        ack = self._next_packet()
        if ack["type"] != _MQTT_CONNACK or ack["return_code"] != 0:
            raise ConnectionError(f"MQTT connect refused: {ack}")

    def _next_packet(self) -> dict:
        while not self._queue:
            packets, self._rest = mqtt_decode_packets(self._rest)
            if packets:
                self._queue.extend(packets)
                break
            data = self.sock.recv(65536)
            if not data:
                raise ConnectionError("mqtt connection closed")
            self._rest += data
        return self._queue.pop(0)

    def _await_ack(self, ack_type: int, pid: int, held: list) -> bool:
        """Pump packets until an ack of ``ack_type`` for ``pid``
        arrives (True) or the socket times out (False). Unrelated
        packets are parked in ``held``."""
        try:
            while True:
                pkt = self._next_packet()
                if pkt["type"] == ack_type:
                    if pkt.get("packet_id") == pid:
                        return True
                    continue  # stale ack from a prior resend
                if pkt["type"] == _MQTT_PINGREQ:
                    self.sock.sendall(
                        mqtt_encode_packet(_MQTT_PINGRESP, 0, b"")
                    )
                else:
                    held.append(pkt)
        except TimeoutError:
            return False

    def publish(self, topic: str, payload: bytes, qos: int = 0,
                retries: int = 3) -> None:
        if qos == 0:
            self.sock.sendall(mqtt_publish_packet(topic, payload))
            return
        if qos not in (1, 2):
            raise ValueError("publish supports QoS 0/1/2 only")
        self._next_pid = self._next_pid % 65535 + 1  # 1..65535, never 0
        pid = self._next_pid
        held: list[dict] = []  # packets that raced ahead of our acks
        try:
            if qos == 1:
                for attempt in range(retries + 1):
                    self.sock.sendall(mqtt_publish_packet(
                        topic, payload, qos=1, packet_id=pid,
                        dup=attempt > 0,
                    ))
                    if self._await_ack(_MQTT_PUBACK, pid, held):
                        return
                raise ConnectionError(
                    f"no PUBACK for packet {pid} after "
                    f"{retries + 1} attempts"
                )
            # QoS 2 (spec §4.3.3 exactly-once, sender half):
            # PUBLISH → PUBREC (resend PUBLISH+DUP on loss), then
            # PUBREL → PUBCOMP (resend PUBREL on loss — never the
            # PUBLISH again once PUBREC arrived).
            for attempt in range(retries + 1):
                self.sock.sendall(mqtt_publish_packet(
                    topic, payload, qos=2, packet_id=pid,
                    dup=attempt > 0,
                ))
                if self._await_ack(_MQTT_PUBREC, pid, held):
                    break
            else:
                raise ConnectionError(
                    f"no PUBREC for packet {pid} after "
                    f"{retries + 1} attempts"
                )
            for _attempt in range(retries + 1):
                self.sock.sendall(mqtt_pubrel_packet(pid))
                if self._await_ack(_MQTT_PUBCOMP, pid, held):
                    return
            raise ConnectionError(
                f"no PUBCOMP for packet {pid} after "
                f"{retries + 1} attempts"
            )
        finally:
            self._queue[:0] = held

    def subscribe(self, topic: str, qos: int = 0) -> None:
        self.sock.sendall(mqtt_subscribe_packet(topic, qos=qos))
        held = []  # packets that raced ahead of the SUBACK
        while True:
            pkt = self._next_packet()
            if pkt["type"] == _MQTT_SUBACK:
                if pkt["return_codes"] and pkt["return_codes"][0] >= 0x80:
                    raise ConnectionError("MQTT subscription rejected")
                self._queue[:0] = held
                return
            held.append(pkt)

    def next_publish(self) -> dict:
        while True:
            pkt = self.next_inbound()
            if pkt["type"] == _MQTT_PUBLISH:
                return pkt

    def next_inbound(self) -> dict:
        """Next PUBLISH or PUBREL (the two broker→subscriber flow
        packets a receiver must act on); PINGREQs answered inline."""
        while True:
            pkt = self._next_packet()
            if pkt["type"] in (_MQTT_PUBLISH, _MQTT_PUBREL):
                return pkt
            if pkt["type"] == _MQTT_PINGREQ:
                self.sock.sendall(
                    mqtt_encode_packet(_MQTT_PINGRESP, 0, b"")
                )

    def close(self) -> None:
        try:
            self.sock.sendall(mqtt_encode_packet(_MQTT_DISCONNECT, 0, b""))
        except OSError:
            pass
        self.sock.close()


def mqtt_source(
    spark: SparkSession,
    host: str,
    port: int,
    topic: str | list[str],
    max_events: int,
    client_id: str = "vector_spark_source",
    timeout_secs: float = 10.0,
    qos: int = 0,
) -> DataFrame:
    """Subscribe to one or MANY topics (``topic`` accepts a list —
    the reference's multiple-topics support, src/sources/mqtt/) and
    collect ``max_events`` publishes; each event's matched topic lands
    in ``key`` like the reference's topic field. QoS 0 is at-most-once; QoS 1 PUBACKs
    every received publish (at-least-once — a broker redelivery with
    the DUP flag is a NEW event, matching the reference's at-least-
    once consumer). QoS 2 runs the receiver half of the §4.3.3
    exactly-once flow: PUBREC on PUBLISH, delivery exactly once per
    packet id (DUP redeliveries before PUBREL are re-PUBRECed but NOT
    re-delivered), PUBCOMP + id release on PUBREL."""
    if qos not in (0, 1, 2):
        raise ValueError("mqtt_source supports QoS 0/1/2 only")
    client = MqttClient(host, port, client_id, timeout_secs)
    rows: list[tuple] = []
    inflight_qos2: set[int] = set()  # delivered, awaiting PUBREL
    topics = topic if isinstance(topic, (list, tuple)) else [topic]
    try:
        for t in topics:
            client.subscribe(t, qos=qos)
        while len(rows) < max_events:
            pkt = client.next_inbound()
            if pkt["type"] == _MQTT_PUBREL:
                client.sock.sendall(
                    mqtt_pubcomp_packet(pkt["packet_id"]))
                inflight_qos2.discard(pkt["packet_id"])
                continue
            pkt_qos = pkt.get("qos", 0)
            if pkt_qos == 1:
                client.sock.sendall(
                    mqtt_puback_packet(pkt["packet_id"])
                )
            elif pkt_qos == 2:
                pid = pkt["packet_id"]
                client.sock.sendall(mqtt_pubrec_packet(pid))
                if pid in inflight_qos2:
                    continue  # DUP redelivery before PUBREL: once only
                inflight_qos2.add(pid)
            rows.append((
                pkt["payload"].decode("utf-8", errors="replace"),
                pkt["topic"], "mqtt", len(rows),
            ))
        # finish any in-flight QoS-2 handshakes before disconnecting
        # (spec §4.3.3 — the broker is still awaiting our PUBCOMP)
        while inflight_qos2:
            try:
                pkt = client.next_inbound()
            except (TimeoutError, ConnectionError):
                break
            if pkt["type"] == _MQTT_PUBREL:
                client.sock.sendall(
                    mqtt_pubcomp_packet(pkt["packet_id"]))
                inflight_qos2.discard(pkt["packet_id"])
            elif pkt.get("qos", 0) == 2:
                client.sock.sendall(
                    mqtt_pubrec_packet(pkt["packet_id"]))
    finally:
        client.close()
    return spark.createDataFrame(rows, EVENT_SCHEMA).withColumn(
        "ts", F.current_timestamp()
    )


def mqtt_sink(
    df: DataFrame,
    host: str,
    port: int,
    topic: str,
    value_col: str = "message",
    encoding: str = "text",
    client_id: str = "vector_spark_sink",
    timeout_secs: float = 10.0,
    qos: int = 0,
) -> int:
    """PUBLISH each row (reference src/sinks/mqtt/). One CONNECT per
    partition, publishes streamed. QoS 1 waits for PUBACK per publish
    and redelivers with DUP on timeout (spec §4.4); QoS 2 runs the
    full PUBLISH→PUBREC→PUBREL→PUBCOMP sender flow with per-stage
    retransmission (spec §4.3.3)."""
    if qos not in (0, 1, 2):
        raise ValueError("mqtt_sink supports QoS 0/1/2 only")
    if encoding == "json":
        payload = F.to_json(F.struct(*df.columns))
    else:
        payload = F.col(value_col).cast("string")
    out = df.select(payload.alias("_payload"))
    counter = df.sparkSession.sparkContext.accumulator(0)

    def push_partition(rows) -> None:
        client = None
        sent = 0
        try:
            for row in rows:
                if client is None:
                    client = MqttClient(
                        host, port, f"{client_id}_p", timeout_secs
                    )
                client.publish(topic, row["_payload"].encode("utf-8"),
                               qos=qos)
                sent += 1
        finally:
            if client is not None:
                client.close()
        counter.add(sent)

    out.foreachPartition(push_partition)
    return counter.value


# ---- AMQP 0-9-1 ---------------------------------------------------------
# Public spec: https://www.rabbitmq.com/resources/specs/amqp0-9-1.pdf
# Frame = type(1) channel(2) size(4) payload size-bytes 0xCE. Method
# payload = class-id(2) method-id(2) args. Only the small slice the
# source/sink conversation needs is implemented: PLAIN auth handshake,
# channel.open, queue.declare, basic.get (bounded pull — no consumer
# session to manage) and basic.publish with a minimal content header.

_AMQP_FRAME_METHOD, _AMQP_FRAME_HEADER, _AMQP_FRAME_BODY = 1, 2, 3
_AMQP_FRAME_END = 0xCE


def amqp_encode_frame(ftype: int, channel: int, payload: bytes) -> bytes:
    return (
        bytes([ftype]) + channel.to_bytes(2, "big")
        + len(payload).to_bytes(4, "big") + payload
        + bytes([_AMQP_FRAME_END])
    )


def _amqp_shortstr(s: str) -> bytes:
    b = s.encode("utf-8")
    if len(b) > 255:
        raise ValueError("shortstr too long")
    return bytes([len(b)]) + b


def _amqp_longstr(b: bytes) -> bytes:
    return len(b).to_bytes(4, "big") + b


def amqp_method_payload(class_id: int, method_id: int,
                        *parts: bytes) -> bytes:
    return class_id.to_bytes(2, "big") + method_id.to_bytes(2, "big") \
        + b"".join(parts)


def amqp_decode_frames(data: bytes) -> tuple[list, bytes]:
    """Byte stream → [(ftype, channel, payload)] + unconsumed tail."""
    frames = []
    pos = 0
    while pos + 8 <= len(data):
        ftype = data[pos]
        channel = int.from_bytes(data[pos + 1:pos + 3], "big")
        size = int.from_bytes(data[pos + 3:pos + 7], "big")
        end = pos + 7 + size
        if end + 1 > len(data):
            break
        if data[end] != _AMQP_FRAME_END:
            raise ValueError("missing AMQP frame-end octet")
        frames.append((ftype, channel, bytes(data[pos + 7:end])))
        pos = end + 1
    return frames, data[pos:]


def amqp_parse_method(payload: bytes) -> tuple[int, int, bytes]:
    return (int.from_bytes(payload[:2], "big"),
            int.from_bytes(payload[2:4], "big"), payload[4:])


class AmqpClient:
    """Minimal AMQP 0-9-1 client: protocol header, PLAIN auth, tune,
    connection+channel open; then basic.get / basic.publish."""

    def __init__(self, host: str, port: int, user: str = "guest",
                 password: str = "guest", vhost: str = "/",
                 timeout: float = 10.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self._rest = b""
        self._frames: list = []
        self.sock.sendall(b"AMQP\x00\x00\x09\x01")
        cls, mid, _ = self._expect_method()          # connection.start
        if (cls, mid) != (10, 10):
            raise ConnectionError(f"expected connection.start, got "
                                  f"{cls}.{mid}")
        sasl = b"\x00" + user.encode() + b"\x00" + password.encode()
        self._send_method(0, amqp_method_payload(
            10, 11,                                   # connection.start-ok
            _amqp_longstr(b""),                       # client-properties {}
            _amqp_shortstr("PLAIN"),
            _amqp_longstr(sasl),
            _amqp_shortstr("en_US"),
        ))
        cls, mid, args = self._expect_method()        # connection.tune
        if (cls, mid) != (10, 30):
            raise ConnectionError("expected connection.tune")
        self._send_method(0, amqp_method_payload(
            10, 31, args[:2], args[2:6], args[6:8],   # echo channel-max,
        ))                                            # frame-max, heartbeat
        self.frame_max = int.from_bytes(args[2:6], "big") or 131072
        self._send_method(0, amqp_method_payload(
            10, 40, _amqp_shortstr(vhost), _amqp_shortstr(""), b"\x00",
        ))                                            # connection.open
        cls, mid, _ = self._expect_method()
        if (cls, mid) != (10, 41):
            raise ConnectionError("expected connection.open-ok")
        self._send_method(1, amqp_method_payload(20, 10,
                                                 _amqp_shortstr("")))
        cls, mid, _ = self._expect_method()           # channel.open-ok
        if (cls, mid) != (20, 11):
            raise ConnectionError("expected channel.open-ok")

    def _send_method(self, channel: int, payload: bytes) -> None:
        self.sock.sendall(
            amqp_encode_frame(_AMQP_FRAME_METHOD, channel, payload)
        )

    def _next_frame(self):
        while not self._frames:
            data = self.sock.recv(65536)
            if not data:
                raise ConnectionError("amqp connection closed")
            self._rest += data
            frames, self._rest = amqp_decode_frames(self._rest)
            self._frames.extend(frames)
        return self._frames.pop(0)

    def _expect_method(self):
        ftype, _ch, payload = self._next_frame()
        if ftype != _AMQP_FRAME_METHOD:
            raise ConnectionError(f"expected method frame, got {ftype}")
        return amqp_parse_method(payload)

    def queue_declare(self, queue: str) -> None:
        self._send_method(1, amqp_method_payload(
            50, 10, b"\x00\x00", _amqp_shortstr(queue),
            b"\x00",                       # passive/durable/... bits off
            _amqp_longstr(b""),            # arguments {}
        ))
        cls, mid, _ = self._expect_method()
        if (cls, mid) != (50, 11):
            raise ConnectionError("expected queue.declare-ok")

    def basic_get(self, queue: str):
        """(routing_key, exchange, body) or None when the queue is
        empty (basic.get-empty)."""
        self._send_method(1, amqp_method_payload(
            60, 70, b"\x00\x00", _amqp_shortstr(queue), b"\x01",  # no-ack
        ))
        cls, mid, args = self._expect_method()
        if (cls, mid) == (60, 72):                    # basic.get-empty
            return None
        if (cls, mid) != (60, 71):                    # basic.get-ok
            raise ConnectionError(f"expected get-ok, got {cls}.{mid}")
        pos = 8 + 1                                   # delivery-tag + bit
        elen = args[pos]
        exchange = args[pos + 1:pos + 1 + elen].decode()
        pos += 1 + elen
        rlen = args[pos]
        routing_key = args[pos + 1:pos + 1 + rlen].decode()
        ftype, _ch, hdr = self._next_frame()          # content header
        if ftype != _AMQP_FRAME_HEADER:
            raise ConnectionError("expected content header")
        body_size = int.from_bytes(hdr[4:12], "big")
        body = b""
        while len(body) < body_size:
            ftype, _ch, chunk = self._next_frame()
            if ftype != _AMQP_FRAME_BODY:
                raise ConnectionError("expected content body")
            body += chunk
        return routing_key, exchange, body

    def basic_publish(self, exchange: str, routing_key: str,
                      body: bytes) -> None:
        self._send_method(1, amqp_method_payload(
            60, 40, b"\x00\x00", _amqp_shortstr(exchange),
            _amqp_shortstr(routing_key), b"\x00",     # mandatory/immediate
        ))
        header = (
            (60).to_bytes(2, "big") + b"\x00\x00"     # class, weight
            + len(body).to_bytes(8, "big")
            + b"\x00\x00"                             # no property flags
        )
        # The content body must be split at the NEGOTIATED frame-max
        # (tune-ok): each frame is 8 bytes of envelope (type+channel+
        # size header and the 0xCE end octet) around the payload, and a
        # body frame larger than frame_max is a protocol violation the
        # broker answers with a connection close.
        max_chunk = max(1, self.frame_max - 8)
        frames = amqp_encode_frame(_AMQP_FRAME_HEADER, 1, header)
        for off in range(0, len(body), max_chunk):
            frames += amqp_encode_frame(
                _AMQP_FRAME_BODY, 1, body[off:off + max_chunk]
            )
        self.sock.sendall(frames)

    def close(self) -> None:
        self.sock.close()


def amqp_source(
    spark: SparkSession,
    host: str,
    port: int,
    queue: str,
    max_events: int | None = None,
    routing_key_field: str = "routing_key",
    user: str = "guest",
    password: str = "guest",
    vhost: str = "/",
    timeout_secs: float = 10.0,
) -> DataFrame:
    """Drain a queue with basic.get until empty (or ``max_events``) —
    the bounded-pull analog of the reference's consumer loop
    (src/sources/amqp.rs; routing key kept per event like its
    routing_key_field)."""
    client = AmqpClient(host, port, user, password, vhost, timeout_secs)
    rows: list[tuple] = []
    try:
        while max_events is None or len(rows) < max_events:
            got = client.basic_get(queue)
            if got is None:
                break
            routing_key, _exchange, body = got
            rows.append((body.decode("utf-8", errors="replace"),
                         routing_key, "amqp", len(rows)))
    finally:
        client.close()
    return spark.createDataFrame(rows, EVENT_SCHEMA).withColumnRenamed(
        "key", routing_key_field
    ).withColumn("ts", F.current_timestamp())


def amqp_sink(
    df: DataFrame,
    host: str,
    port: int,
    exchange: str,
    routing_key: str = "",
    value_col: str = "message",
    encoding: str = "text",
    user: str = "guest",
    password: str = "guest",
    vhost: str = "/",
    timeout_secs: float = 10.0,
) -> int:
    """basic.publish each row (reference src/sinks/amqp/config.rs:
    exchange + routing_key). One connection+channel per partition,
    frames streamed without publisher confirms (the reference's
    default)."""
    if encoding == "json":
        payload = F.to_json(F.struct(*df.columns))
    else:
        payload = F.col(value_col).cast("string")
    out = df.select(payload.alias("_payload"))
    counter = df.sparkSession.sparkContext.accumulator(0)

    def push_partition(rows) -> None:
        client = None
        sent = 0
        try:
            for row in rows:
                if client is None:
                    client = AmqpClient(host, port, user, password,
                                        vhost, timeout_secs)
                client.basic_publish(exchange, routing_key,
                                     row["_payload"].encode("utf-8"))
                sent += 1
        finally:
            if client is not None:
                client.close()
        counter.add(sent)

    out.foreachPartition(push_partition)
    return counter.value


# ---- Pulsar binary protocol ---------------------------------------------
# Public spec: https://pulsar.apache.org/docs/developing-binary-protocol/
# (PulsarApi.proto). Frames: [totalSize u32][commandSize u32][BaseCommand]
# and, for SEND/MESSAGE, + [magic 0x0e01][crc32c u32][metadataSize u32]
# [MessageMetadata][payload] where the checksum covers everything after
# itself. Commands ride the schema-driven protobuf codec in
# functions/protowire.py; only the producer/consumer slice the
# source/sink conversation needs is described.

_PULSAR_REGISTRY = {
    "MessageIdData": {
        1: ("ledgerId", "uint64"), 2: ("entryId", "uint64"),
        3: ("partition", "int32"), 4: ("batch_index", "int32"),
    },
    "CommandConnect": {
        1: ("client_version", "string"), 2: ("auth_method", "enum"),
        4: ("protocol_version", "int32"),
        5: ("auth_method_name", "string"),
    },
    "CommandConnected": {
        1: ("server_version", "string"), 2: ("protocol_version", "int32"),
    },
    "CommandSubscribe": {
        1: ("topic", "string"), 2: ("subscription", "string"),
        3: ("subType", "enum"), 4: ("consumer_id", "uint64"),
        5: ("request_id", "uint64"), 6: ("consumer_name", "string"),
    },
    "CommandProducer": {
        1: ("topic", "string"), 2: ("producer_id", "uint64"),
        3: ("request_id", "uint64"), 4: ("producer_name", "string"),
    },
    "CommandSend": {
        1: ("producer_id", "uint64"), 2: ("sequence_id", "uint64"),
        3: ("num_messages", "int32"),
    },
    "CommandSendReceipt": {
        1: ("producer_id", "uint64"), 2: ("sequence_id", "uint64"),
        3: ("message_id", "msg:MessageIdData"),
    },
    "CommandMessage": {
        1: ("consumer_id", "uint64"),
        2: ("message_id", "msg:MessageIdData"),
        3: ("redelivery_count", "uint32"),
    },
    "CommandAck": {
        1: ("consumer_id", "uint64"), 2: ("ack_type", "enum"),
        3: ("message_id", "repeated msg:MessageIdData"),
    },
    "CommandFlow": {
        1: ("consumer_id", "uint64"), 2: ("messagePermits", "uint32"),
    },
    "CommandSuccess": {1: ("request_id", "uint64")},
    "CommandError": {
        1: ("request_id", "uint64"), 2: ("error", "enum"),
        3: ("message", "string"),
    },
    "CommandProducerSuccess": {
        1: ("request_id", "uint64"), 2: ("producer_name", "string"),
    },
    "KeyValue": {1: ("key", "string"), 2: ("value", "string")},
    "MessageMetadata": {
        1: ("producer_name", "string"), 2: ("sequence_id", "uint64"),
        3: ("publish_time", "uint64"),
        4: ("properties", "repeated msg:KeyValue"),
        5: ("partition_key", "string"),
    },
    "BaseCommand": {
        1: ("type", "enum"),
        2: ("connect", "msg:CommandConnect"),
        3: ("connected", "msg:CommandConnected"),
        4: ("subscribe", "msg:CommandSubscribe"),
        5: ("producer", "msg:CommandProducer"),
        6: ("send", "msg:CommandSend"),
        7: ("send_receipt", "msg:CommandSendReceipt"),
        9: ("message", "msg:CommandMessage"),
        10: ("ack", "msg:CommandAck"),
        11: ("flow", "msg:CommandFlow"),
        13: ("success", "msg:CommandSuccess"),
        14: ("error", "msg:CommandError"),
        17: ("producer_success", "msg:CommandProducerSuccess"),
        18: ("ping", "msg:Empty"),
        19: ("pong", "msg:Empty"),
    },
    "Empty": {},
}

# BaseCommand.Type values (PulsarApi.proto enum Type)
PULSAR_CONNECT, PULSAR_CONNECTED = 2, 3
PULSAR_SUBSCRIBE, PULSAR_PRODUCER, PULSAR_SEND = 4, 5, 6
PULSAR_SEND_RECEIPT, PULSAR_MESSAGE, PULSAR_ACK = 7, 9, 10
PULSAR_FLOW, PULSAR_SUCCESS, PULSAR_ERROR = 11, 13, 14
PULSAR_PRODUCER_SUCCESS, PULSAR_PING, PULSAR_PONG = 17, 18, 19

_CRC32C_POLY = 0x82F63B78  # Castagnoli, reflected
_CRC32C_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ _CRC32C_POLY if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    """Pure-python CRC-32C (the checksum Pulsar frames carry)."""
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def pulsar_encode_command(cmd: dict) -> bytes:
    """Simple command frame: [totalSize][commandSize][BaseCommand]."""
    from vector_spark.functions.protowire import encode_message

    body = encode_message(cmd, _PULSAR_REGISTRY["BaseCommand"],
                          _PULSAR_REGISTRY)
    return (len(body) + 4).to_bytes(4, "big") \
        + len(body).to_bytes(4, "big") + body


def pulsar_encode_send(cmd: dict, metadata: dict, payload: bytes) -> bytes:
    """Payload frame: command + [0x0e01][crc32c][metadataSize][metadata]
    [payload]; the checksum covers metadataSize+metadata+payload."""
    from vector_spark.functions.protowire import encode_message

    body = encode_message(cmd, _PULSAR_REGISTRY["BaseCommand"],
                          _PULSAR_REGISTRY)
    meta = encode_message(metadata, _PULSAR_REGISTRY["MessageMetadata"],
                          _PULSAR_REGISTRY)
    checked = len(meta).to_bytes(4, "big") + meta + payload
    tail = b"\x0e\x01" + crc32c(checked).to_bytes(4, "big") + checked
    total = 4 + len(body) + len(tail)
    return total.to_bytes(4, "big") + len(body).to_bytes(4, "big") \
        + body + tail


def pulsar_decode_frame(frame: bytes) -> tuple[dict, dict | None, bytes]:
    """One frame (without the leading totalSize) → (command, metadata,
    payload). Verifies the CRC when the checksum magic is present."""
    from vector_spark.functions.protowire import decode_message

    csize = int.from_bytes(frame[:4], "big")
    cmd = decode_message(frame[4:4 + csize],
                         _PULSAR_REGISTRY["BaseCommand"], _PULSAR_REGISTRY)
    rest = frame[4 + csize:]
    if not rest:
        return cmd, None, b""
    if rest[:2] == b"\x0e\x01":
        crc = int.from_bytes(rest[2:6], "big")
        checked = rest[6:]
        if crc32c(checked) != crc:
            raise ValueError("pulsar frame CRC-32C mismatch")
        rest = checked
    msize = int.from_bytes(rest[:4], "big")
    meta = decode_message(rest[4:4 + msize],
                          _PULSAR_REGISTRY["MessageMetadata"],
                          _PULSAR_REGISTRY)
    return cmd, meta, rest[4 + msize:]


class PulsarClient:
    """Minimal Pulsar binary-protocol client: CONNECT/CONNECTED, then
    producer (PRODUCER → SEND → SEND_RECEIPT) or consumer (SUBSCRIBE →
    FLOW → MESSAGE → ACK) on one channel."""

    def __init__(self, host: str, port: int, timeout: float = 10.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self._rest = b""
        self.send(pulsar_encode_command({
            "type": PULSAR_CONNECT,
            "connect": {"client_version": "vector_spark",
                        "protocol_version": 6},
        }))
        cmd, _m, _p = self.next_frame()
        if cmd.get("type") != PULSAR_CONNECTED:
            raise ConnectionError(f"expected CONNECTED, got {cmd}")

    def send(self, frame: bytes) -> None:
        self.sock.sendall(frame)

    def next_frame(self):
        """Next (command, metadata, payload); answers PING."""
        while True:
            while len(self._rest) < 4 or (
                len(self._rest)
                < 4 + int.from_bytes(self._rest[:4], "big")
            ):
                data = self.sock.recv(65536)
                if not data:
                    raise ConnectionError("pulsar connection closed")
                self._rest += data
            total = int.from_bytes(self._rest[:4], "big")
            frame = self._rest[4:4 + total]
            self._rest = self._rest[4 + total:]
            cmd, meta, payload = pulsar_decode_frame(frame)
            if cmd.get("type") == PULSAR_PING:
                self.send(pulsar_encode_command(
                    {"type": PULSAR_PONG, "pong": {}}
                ))
                continue
            if cmd.get("type") == PULSAR_ERROR:
                raise ConnectionError(
                    f"pulsar error: {cmd.get('error', {})}"
                )
            return cmd, meta, payload

    def close(self) -> None:
        self.sock.close()


def pulsar_source(
    spark: SparkSession,
    host: str,
    port: int,
    topic: str,
    subscription: str = "vector_spark",
    max_events: int = 100,
    timeout_secs: float = 10.0,
) -> DataFrame:
    """Subscribe (Exclusive) and collect ``max_events`` messages,
    ACKing each individually (reference src/sources/pulsar/mod.rs; the
    topic lands in ``key``)."""
    client = PulsarClient(host, port, timeout_secs)
    rows: list[tuple] = []
    try:
        client.send(pulsar_encode_command({
            "type": PULSAR_SUBSCRIBE,
            "subscribe": {"topic": topic, "subscription": subscription,
                          "subType": 0, "consumer_id": 1,
                          "request_id": 1},
        }))
        cmd, _m, _p = client.next_frame()
        if cmd.get("type") != PULSAR_SUCCESS:
            raise ConnectionError(f"subscribe failed: {cmd}")
        client.send(pulsar_encode_command({
            "type": PULSAR_FLOW,
            "flow": {"consumer_id": 1, "messagePermits": max_events},
        }))
        while len(rows) < max_events:
            cmd, _meta, payload = client.next_frame()
            if cmd.get("type") != PULSAR_MESSAGE:
                continue
            rows.append((payload.decode("utf-8", errors="replace"),
                         topic, "pulsar", len(rows)))
            client.send(pulsar_encode_command({
                "type": PULSAR_ACK,
                "ack": {"consumer_id": 1, "ack_type": 0,
                        "message_id": [cmd["message"]["message_id"]]},
            }))
    finally:
        client.close()
    return spark.createDataFrame(rows, EVENT_SCHEMA).withColumn(
        "ts", F.current_timestamp()
    )


def pulsar_sink(
    df: DataFrame,
    host: str,
    port: int,
    topic: str,
    value_col: str = "message",
    encoding: str = "text",
    timeout_secs: float = 10.0,
) -> int:
    """Register a producer and SEND each row, awaiting the receipt
    (reference src/sinks/pulsar/). One connection+producer per
    partition; publish_time comes from the broker-visible wall clock on
    the executor (the one place a timestamp is required by the wire
    format)."""
    if encoding == "json":
        payload = F.to_json(F.struct(*df.columns))
    else:
        payload = F.col(value_col).cast("string")
    out = df.select(payload.alias("_payload"))
    counter = df.sparkSession.sparkContext.accumulator(0)

    def push_partition(rows) -> None:
        import time

        client = None
        name = "vs"
        seq = 0
        sent = 0
        try:
            for row in rows:
                if client is None:
                    client = PulsarClient(host, port, timeout_secs)
                    client.send(pulsar_encode_command({
                        "type": PULSAR_PRODUCER,
                        "producer": {"topic": topic, "producer_id": 1,
                                     "request_id": 1},
                    }))
                    cmd, _m, _p = client.next_frame()
                    if cmd.get("type") != PULSAR_PRODUCER_SUCCESS:
                        raise ConnectionError(f"producer failed: {cmd}")
                    name = cmd["producer_success"].get("producer_name",
                                                       "vs")
                client.send(pulsar_encode_send(
                    {"type": PULSAR_SEND,
                     "send": {"producer_id": 1, "sequence_id": seq,
                              "num_messages": 1}},
                    {"producer_name": name, "sequence_id": seq,
                     "publish_time": int(time.time() * 1000)},
                    row["_payload"].encode("utf-8"),
                ))
                cmd, _m, _p = client.next_frame()
                if cmd.get("type") != PULSAR_SEND_RECEIPT:
                    raise ConnectionError(f"no send receipt: {cmd}")
                seq += 1
                sent += 1
        finally:
            if client is not None:
                client.close()
        counter.add(sent)

    out.foreachPartition(push_partition)
    return counter.value
