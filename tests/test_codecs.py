"""Codec round-trip tests (reference lib/codecs, SURVEY §2.5)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from vector_spark.functions.codecs import (
    decode_gelf,
    decode_logfmt,
    encode_cef,
    encode_gelf,
    encode_logfmt,
    encode_syslog,
)
from vector_spark.functions.vrl import parse_syslog


def test_logfmt_roundtrip(spark):
    df = spark.createDataFrame([Row(seq=1, svc="api", msg="hello", n=42)])
    enc = df.select(
        "seq",
        encode_logfmt(
            {"svc": F.col("svc"), "n": F.col("n"), "msg": F.col("msg")}
        ).alias("line"),
    )
    line = enc.collect()[0].line
    assert line == "svc=api n=42 msg=hello"
    dec = enc.select(decode_logfmt(F.col("line")).alias("kv")).collect()[0].kv
    assert dec == {"svc": "api", "n": "42", "msg": "hello"}


def test_logfmt_quoting(spark):
    df = spark.createDataFrame([Row(msg="two words")])
    line = df.select(encode_logfmt({"msg": F.col("msg")}).alias("l")).collect()[0].l
    assert line == 'msg="two words"'


def test_gelf_roundtrip(spark):
    df = spark.createDataFrame(
        [Row(host="web-1", msg="boom", ts=datetime.datetime(2024, 1, 1), svc="api")]
    )
    enc = df.select(
        encode_gelf(
            F.col("host"), F.col("msg"), F.col("ts"),
            level=F.lit(3), extra={"service": F.col("svc")},
        ).alias("gelf")
    )
    raw = enc.collect()[0].gelf
    assert '"version":"1.1"' in raw and '"_service":"api"' in raw
    dec = enc.select(
        decode_gelf(F.col("gelf"), "_service string").alias("d")
    ).collect()[0].d
    assert dec.host == "web-1" and dec.short_message == "boom"
    assert dec.level == 3 and dec._service == "api"


def test_cef_encode(spark):
    df = spark.createDataFrame([Row(sig="100", name="portscan", sev=7, src="1.2.3.4")])
    line = df.select(
        encode_cef(
            "vector_spark", "engine", "1.0",
            F.col("sig"), F.col("name"), F.col("sev"),
            extension={"src": F.col("src")},
        ).alias("cef")
    ).collect()[0].cef
    assert line == "CEF:0|vector_spark|engine|1.0|100|portscan|7|src=1.2.3.4"


def test_syslog_encode_parse_roundtrip(spark):
    df = spark.createDataFrame(
        [Row(ts=datetime.datetime(2024, 3, 5, 12, 30, 1), host="db-1", app="pg", msg="ready")]
    )
    enc = df.select(
        encode_syslog(
            F.lit(13), F.col("ts"), F.col("host"), F.col("app"), F.col("msg"),
            pid=F.lit(99),
        ).alias("line")
    )
    line = enc.collect()[0].line
    assert line == "<13>Mar 5 12:30:01 db-1 pg[99]: ready"
    parsed = enc.select(parse_syslog(F.col("line")).alias("p")).collect()[0].p
    assert parsed.hostname == "db-1" and parsed.appname == "pg"
    # reference contract: name-coded severity (pri 13 -> notice)
    assert parsed.message == "ready" and parsed.severity == "notice"


def test_parse_grok(spark):
    from vector_spark.functions.vrl import grok_to_regex, parse_grok

    df = spark.createDataFrame(
        [Row(line="2024-03-05T12:30:01Z ERROR 10.2.3.4 login failed for bob")]
    )
    pat = "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} %{IP:client} %{GREEDYDATA:msg}"
    out = df.select(parse_grok(F.col("line"), pat).alias("g")).collect()[0].g
    assert out.level == "ERROR" and out.client == "10.2.3.4"
    assert out.msg == "login failed for bob"
    regex, names = grok_to_regex("%{INT:code} %{WORD}")
    assert names == [("code", 1)] and "(?:" in regex  # (name, group index)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        grok_to_regex("%{NOPE:x}")


def test_vrl_parse_url_and_csv(spark):
    from vector_spark.functions.vrl import VRL_FUNCTIONS

    df = spark.createDataFrame(
        [Row(url="https://api.example.com:8443/v1/users?id=7", csvline="a,42")]
    )
    out = df.select(
        VRL_FUNCTIONS["parse_url"](F.col("url"), "HOST").alias("host"),
        VRL_FUNCTIONS["parse_url"](F.col("url"), "PATH").alias("path"),
        VRL_FUNCTIONS["parse_csv"](F.col("csvline"), "name string, n int").alias("c"),
    ).collect()[0]
    assert out.host == "api.example.com"
    assert out.path == "/v1/users"
    assert out.c.name == "a" and out.c.n == 42


def test_decode_statsd(spark):
    from vector_spark.functions.codecs import decode_statsd

    df = spark.createDataFrame(
        [
            Row(line="api.requests:1|c|@0.5|#env:prod,region:us"),
            Row(line="memory.free:1024.5|g"),
            Row(line="not a statsd line"),
        ]
    )
    out = df.select(decode_statsd(F.col("line")).alias("m")).collect()
    m0, m1, m2 = (r.m for r in out)
    assert m0.name == "api.requests" and m0.metric_type == "counter"
    assert m0.sample_rate == 0.5 and m0.tags == {"env": "prod", "region": "us"}
    assert m1.value == 1024.5 and m1.metric_type == "gauge" and m1.sample_rate == 1.0
    assert m2.metric_type is None


def test_decode_influxdb_line(spark):
    from vector_spark.functions.codecs import decode_influxdb_line

    df = spark.createDataFrame(
        [Row(line="cpu,host=web-1,dc=east usage=0.93,idle=0.07 1700000000000000000")]
    )
    m = df.select(decode_influxdb_line(F.col("line")).alias("m")).collect()[0].m
    assert m.measurement == "cpu"
    assert m.tags == {"host": "web-1", "dc": "east"}
    assert m.fields == {"usage": "0.93", "idle": "0.07"}
    assert m.ts_ns == 1700000000000000000


def test_framing_newline_and_character(spark):
    from vector_spark.functions.framing import (
        character_delimited,
        explode_frames,
        newline_delimited,
    )

    df = spark.createDataFrame([Row(src="f1", blob="a\nb\r\nc\n")])
    out = explode_frames(df, "blob", newline_delimited(F.col("blob"))).collect()
    assert [(r.frame_idx, r.message) for r in out] == [(0, "a"), (1, "b"), (2, "c")]
    assert all(r.src == "f1" for r in out)
    df2 = spark.createDataFrame([Row(blob="x|y|z")])
    frames = df2.select(character_delimited(F.col("blob"), "|").alias("f")).collect()[0].f
    assert frames == ["x", "y", "z"]


def test_framing_octet_counting(spark):
    from vector_spark.functions.framing import length_delimited_frames

    # RFC6587: "<len> payload" concatenated; payload may contain spaces/newlines
    blob = "5 hello3 a b11 multi\nframe"
    df = spark.createDataFrame([Row(blob=blob)])
    frames = df.select(
        length_delimited_frames(F.col("blob"), max_frames=8).alias("f")
    ).collect()[0].f
    assert frames == ["hello", "a b", "multi\nframe"]


def test_otlp_logs_roundtrip_unit(spark):
    """OTLP/JSON encode → decode inverts (lib/codecs otlp.rs analog); a
    batched payload with N records explodes to N rows."""
    from pyspark.sql import functions as F

    from vector_spark.functions.codecs import (
        encode_otlp_logs,
        otlp_logs_to_events,
        otlp_resource_attr,
    )

    df = spark.createDataFrame(
        [("2024-01-02 03:04:05", "hello", 9, "INFO", "svc-a")],
        "ts_s string, body string, sev int, sevtext string, svc string",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    payload = df.select(
        encode_otlp_logs(
            ts=F.col("ts"),
            body=F.col("body"),
            severity_number=F.col("sev"),
            severity_text=F.col("sevtext"),
            resource_attrs={"service.name": F.col("svc")},
        ).alias("payload")
    )
    out = otlp_logs_to_events(payload).select(
        "time_unix_nano", "severity_number", "severity_text", "body",
        otlp_resource_attr(F.col("resource"), "service.name").alias("svc"),
        otlp_resource_attr(F.col("resource"), "missing.key").alias("absent"),
    )
    row = out.collect()[0]
    expect_ns = df.select((F.unix_micros("ts") * 1000).alias("n")).collect()[0].n
    assert row.time_unix_nano == expect_ns
    assert row.severity_number == 9 and row.severity_text == "INFO"
    assert row.body == "hello" and row.svc == "svc-a" and row.absent is None


def test_varint_length_delimited_frames(spark):
    """Protobuf varint framing (lib/codecs varint_length_delimited.rs):
    includes a >127-byte frame so the 2-byte varint path is exercised."""
    from pyspark.sql import functions as F

    from vector_spark.functions.framing import varint_length_delimited_frames

    def enc_varint(n: int) -> bytes:
        out = b""
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out += bytes([b | 0x80])
            else:
                return out + bytes([b])

    msgs = ["hello", "x" * 300, "worlds"]
    blob = b"".join(enc_varint(len(m)) + m.encode() for m in msgs)
    df = spark.createDataFrame([(blob,)], "payload binary")
    out = df.select(
        varint_length_delimited_frames(F.col("payload")).alias("frames")
    ).collect()[0]
    assert out.frames == msgs


def test_chunked_gelf_reassembly(spark):
    """chunked_gelf framing: magic 1e0f | msg id | seq | total | payload;
    incomplete messages are withheld, plain datagrams pass through."""
    from vector_spark.functions.framing import reassemble_chunked_gelf

    def chunk(msg_id: bytes, seq: int, total: int, payload: bytes) -> bytes:
        return b"\x1e\x0f" + msg_id + bytes([seq, total]) + payload

    rows = [
        (chunk(b"AAAAAAAA", 1, 2, b" world"),),      # out of order on purpose
        (chunk(b"AAAAAAAA", 0, 2, b"hello"),),
        (b'{"version":"1.1","short_message":"plain"}',),
        (chunk(b"BBBBBBBB", 0, 3, b"incomplete"),),  # missing 2 of 3
    ]
    df = spark.createDataFrame(rows, "payload binary")
    out = sorted(
        r.message for r in reassemble_chunked_gelf(df, "payload").collect()
    )
    assert out == ['hello world', '{"version":"1.1","short_message":"plain"}']


def test_prometheus_and_influx_encode_decode(spark):
    """prometheus text exposition + influxdb line encode (reference
    prometheus scrape source / influxdb sink)."""
    from pyspark.sql import functions as F

    from vector_spark.functions.codecs import (
        decode_prometheus_line,
        encode_influxdb_line,
        encode_prometheus_line,
    )

    df = spark.createDataFrame([("api", 2.5, 1700000000000)],
                               "svc string, v double, ts_ms long")
    line = df.select(
        encode_prometheus_line(
            name=F.lit("http_requests_total"),
            value=F.col("v"),
            labels={"svc": F.col("svc")},
            ts_ms=F.col("ts_ms"),
        ).alias("line")
    )
    assert line.collect()[0].line == (
        'http_requests_total{svc="api"} 2.5 1700000000000'
    )
    d = line.select(decode_prometheus_line(F.col("line")).alias("d")).collect()[0].d
    assert d.name == "http_requests_total" and dict(d.labels) == {"svc": "api"}
    assert d.value == 2.5 and d.ts_ms == 1700000000000

    influx = df.select(
        encode_influxdb_line(
            measurement=F.lit("cpu"),
            fields={"usage": F.col("v")},
            tags={"svc": F.col("svc")},
            ts_ns=F.col("ts_ms") * 1000000,
        ).alias("line")
    ).collect()[0].line
    assert influx == "cpu,svc=api usage=2.5 1700000000000000000"


def test_native_json_roundtrip(spark):
    from pyspark.sql import functions as F

    from vector_spark.functions.codecs import (
        decode_native_json,
        encode_native_json,
    )

    df = spark.createDataFrame(
        [("hello", "h1")], "message string, host string"
    )
    enc = df.select(
        encode_native_json(
            "log", message=F.col("message"), host=F.col("host")
        ).alias("payload")
    )
    import json

    raw = json.loads(enc.head()["payload"])
    assert raw == {"log": {"message": "hello", "host": "h1"}}
    dec = enc.select(
        decode_native_json(F.col("payload"), "message string, host string").alias("e")
    ).select("e.log.message", "e.log.host")
    assert dec.head().asDict() == {"message": "hello", "host": "h1"}


def test_arrow_ipc_roundtrip(spark):
    import pyarrow as pa

    from pyspark.sql import functions as F

    from vector_spark.functions.codecs import decode_arrow_ipc, encode_arrow_ipc

    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v"),
        F.concat(F.lit("m"), F.col("id").cast("string")).alias("msg"),
    )
    enc = encode_arrow_ipc(df, batch_max_rows=30)
    blobs = enc.collect()
    assert sum(r["n_rows"] for r in blobs) == 100
    # independent decode with pyarrow directly (not our decoder)
    import io

    first = next(b for b in blobs if b["n_rows"] > 0)
    t = pa.ipc.open_stream(io.BytesIO(bytes(first["payload"]))).read_all()
    assert set(t.column_names) == {"id", "v", "msg"}
    # engine-side decode: full roundtrip preserves every row
    back = decode_arrow_ipc(enc, "id bigint, v bigint, msg string")
    rows = {r["id"]: r for r in back.collect()}
    assert len(rows) == 100
    assert rows[7]["v"] == 14 and rows[7]["msg"] == "m7"


def test_encode_side_framing(spark):
    from pyspark.sql import functions as F

    from vector_spark.functions.framing import (
        explode_frames,
        frame_length_delimited,
        frame_newline,
        frame_octet_counting,
        length_delimited_frames,
    )

    df = spark.createDataFrame([("hello", "wörld")], "a string, b string")
    nl = df.select(frame_newline(F.array("a", "b")).alias("p")).head()["p"]
    assert nl == "hello\nwörld\n"
    oc = df.select(frame_octet_counting(F.col("b")).alias("p")).head()["p"]
    assert oc == "6 wörld"  # octet count: ö is 2 UTF-8 bytes
    # octet-counting round-trips through the decode-side frame walker
    two = df.select(
        F.concat(
            frame_octet_counting(F.col("a")),
            frame_octet_counting(F.col("a")),
        ).alias("p")
    )
    back = two.select(
        length_delimited_frames(F.col("p")).alias("frames")
    ).head()["frames"]
    assert list(back) == ["hello", "hello"]
    # 4-byte BE length prefix: verify the binary layout directly
    import struct

    ld = bytes(df.select(frame_length_delimited(F.col("a")).alias("p")).head()["p"])
    assert struct.unpack(">I", ld[:4])[0] == 5 and ld[4:] == b"hello"


def test_splunk_hec_roundtrip(spark):
    import json

    from pyspark.sql import functions as F

    from vector_spark.functions.codecs import decode_splunk_hec, encode_splunk_hec

    df = spark.createDataFrame(
        [("disk full", "2024-03-01 12:00:00.500000", "h1")],
        "msg string, t string, host string",
    ).select(F.col("msg"), F.col("t").cast("timestamp").alias("ts"), "host")
    enc = df.select(
        encode_splunk_hec(
            F.col("msg"), F.col("ts"), host=F.col("host"),
            sourcetype=F.lit("syslog"),
        ).alias("payload")
    )
    raw = json.loads(enc.head()["payload"])
    assert raw["event"] == "disk full" and raw["host"] == "h1"
    assert raw["sourcetype"] == "syslog"
    dec = enc.select(decode_splunk_hec(F.col("payload")).alias("e")).select("e.*")
    row = dec.head()
    assert row["event"] == "disk full"
    assert str(row["ts"]) == "2024-03-01 12:00:00.500000"
    # object-valued event comes back as JSON text
    obj = spark.range(1).select(
        decode_splunk_hec(
            F.lit('{"event": {"k": 1}, "time": 1709294400.0}')
        ).alias("e")
    ).head()["e"]
    assert json.loads(obj["event"]) == {"k": 1}


def test_chunked_gelf_encode_decode_roundtrip(spark):
    """chunk_gelf → explode → reassemble recovers the original payload;
    small payloads stay unchunked."""
    from pyspark.sql import functions as F

    from vector_spark.functions.framing import chunk_gelf, reassemble_chunked_gelf

    big = '{"version":"1.1","host":"h","short_message":"' + "x" * 500 + '"}'
    small = '{"version":"1.1","host":"h","short_message":"tiny"}'
    df = spark.createDataFrame([(big,), (small,)], "payload string")
    datagrams = df.select(
        F.explode(chunk_gelf(F.col("payload"), max_chunk_bytes=100)).alias("d")
    )
    n = datagrams.count()
    assert n == 7  # 546-byte payload / 100 + 1 small
    back = reassemble_chunked_gelf(datagrams, "d")
    got = sorted(r["message"] for r in back.collect())
    assert got == sorted([big, small])


def test_chunk_gelf_over_128_chunks_is_null(spark):
    """GELF caps messages at 128 chunks; seq/total are single bytes.
    >128 chunks must yield NULL, not corrupt headers (ADVICE r2)."""
    from vector_spark.functions.framing import chunk_gelf

    df = spark.createDataFrame([("x" * 1300,)], "payload string")
    # 10-byte chunks → 130 chunks > 128 → NULL
    bad = df.select(chunk_gelf(F.col("payload"), max_chunk_bytes=10).alias("d"))
    assert bad.head()["d"] is None
    # exactly 128 chunks is still legal
    df2 = spark.createDataFrame([("x" * 1280,)], "payload string")
    ok = df2.select(chunk_gelf(F.col("payload"), max_chunk_bytes=10).alias("d"))
    assert len(ok.head()["d"]) == 128


def test_octet_counting_multibyte_roundtrip(spark):
    """Byte-accurate decode walker: multi-byte UTF-8 payloads round-trip
    through frame_octet_counting → length_delimited_frames (ADVICE r2)."""
    from pyspark.sql import functions as F

    from vector_spark.functions.framing import (
        frame_octet_counting,
        length_delimited_frames,
    )

    df = spark.createDataFrame([("wörld", "naïve ☃")], "a string, b string")
    two = df.select(
        F.concat(
            frame_octet_counting(F.col("a")),
            frame_octet_counting(F.col("b")),
        ).alias("p")
    )
    back = two.select(length_delimited_frames(F.col("p")).alias("f")).head()["f"]
    assert list(back) == ["wörld", "naïve ☃"]


# ---- arrow_ipc (encoding/format/arrow.rs) --------------------------------

def test_arrow_ipc_roundtrip_and_interop(spark):
    """IPC payloads decode with PLAIN pyarrow (interop: the encoder's
    output is a spec Arrow stream, not a private framing)."""
    import io

    import pyarrow as pa

    from vector_spark.functions.codecs import (
        decode_arrow_ipc,
        encode_arrow_ipc,
    )

    df = spark.range(50).selectExpr(
        "id", "concat('m', id) as message", "cast(id as double)/4 as value")
    enc = encode_arrow_ipc(df.repartition(3))
    rows = enc.collect()
    assert sum(r["n_rows"] for r in rows) == 50
    # independent decode: pa.ipc straight over the payload bytes
    total = 0
    for r in rows:
        t = pa.ipc.open_stream(io.BytesIO(bytes(r["payload"]))).read_all()
        assert t.schema.names == ["id", "message", "value"]
        total += t.num_rows
    assert total == 50
    dec = decode_arrow_ipc(
        enc, "id long, message string, value double")
    got = {r["id"]: (r["message"], r["value"]) for r in dec.collect()}
    assert got[7] == ("m7", 1.75)


def test_arrow_ipc_compression(spark):
    from vector_spark.functions.codecs import (
        decode_arrow_ipc,
        encode_arrow_ipc,
    )

    # highly repetitive payload: zstd body must be smaller than plain
    df = spark.range(2000).selectExpr("'aaaaaaaaaa' as pad").coalesce(1)
    plain = encode_arrow_ipc(df).head()["payload"]
    comp = encode_arrow_ipc(df, compression="zstd").head()["payload"]
    assert len(comp) < len(plain)
    n = decode_arrow_ipc(
        encode_arrow_ipc(df, compression="lz4"), "pad string"
    ).count()
    assert n == 2000


def test_arrow_ipc_nullability_contract(spark):
    import pytest as _pytest

    from vector_spark.functions.codecs import encode_arrow_ipc

    # a null in a non-nullable declared field errors the batch
    # (arrow.rs:41-47) unless allow_nullable_fields is set
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], "id long, message string"
    ).coalesce(1)
    import pyarrow as pa  # noqa: F401 — presence gate

    # Spark marks these nullable, so the default encode succeeds
    assert encode_arrow_ipc(df).count() == 1
