"""Pure-Python protobuf wire codec (functions/protowire.py): spec-pinned
byte patterns, Vector native event roundtrips (event.proto), OTLP logs
roundtrips, unknown-field skipping, packed repeated decode, and the
Spark-side Arrow-batched encode/decode bridge."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from vector_spark.functions.protowire import (
    OTLP_REGISTRY,
    VECTOR_REGISTRY,
    decode_message,
    decode_otlp_logs,
    decode_vector_log,
    encode_message,
    encode_otlp_logs,
    encode_vector_log,
    read_varint,
    write_varint,
)


def test_wire_spec_pinned_bytes():
    # the spec's own worked examples (protobuf.dev/programming-guides/
    # encoding): field 1 varint 150 → 08 96 01; field 2 string "testing"
    # → 12 07 74..67; negative int64 is 10-byte two's complement
    assert encode_message({"a": 150}, {1: ("a", "int64")}, {}) == b"\x08\x96\x01"
    assert (
        encode_message({"b": "testing"}, {2: ("b", "string")}, {})
        == b"\x12\x07testing"
    )
    neg = encode_message({"a": -2}, {1: ("a", "int64")}, {})
    assert neg == b"\x08" + b"\xfe" + b"\xff" * 8 + b"\x01"
    assert decode_message(neg, {1: ("a", "int64")}, {}) == {"a": -2}
    out = bytearray()
    write_varint(300, out)
    assert bytes(out) == b"\xac\x02" and read_varint(bytes(out), 0) == (300, 2)


def test_unknown_fields_skipped_and_packed_repeated():
    # unknown field numbers are skipped (proto3 forward compat)
    buf = encode_message(
        {"a": 1, "zz": "drop-me"},
        {1: ("a", "int64"), 99: ("zz", "string")},
        {},
    )
    assert decode_message(buf, {1: ("a", "int64")}, {}) == {"a": 1}
    # packed repeated varints: one length-delimited chunk
    packed = b"\x0a\x03\x01\x02\x03"
    assert decode_message(packed, {1: ("xs", "repeated int64")}, {}) == {
        "xs": [1, 2, 3]
    }


def test_vector_native_log_roundtrip():
    ev = {
        "message": "hello",
        "count": 7,
        "ratio": 3.5,
        "ok": True,
        "gone": None,
        "ts": dt.datetime(2024, 1, 2, 3, 4, 5, 123456, tzinfo=dt.timezone.utc),
        "nested": {"a": 1, "tags": ["x", 2, False]},
    }
    assert decode_vector_log(encode_vector_log(ev)) == ev
    # deprecated Log.fields map form decodes too (native.rs reads both)
    legacy = encode_message(
        {
            "log": {
                "fields": [
                    {"key": "m", "value": {"raw_bytes": b"old"}},
                    {"key": "n", "value": {"integer": 2}},
                ]
            }
        },
        VECTOR_REGISTRY["EventWrapper"],
        VECTOR_REGISTRY,
    )
    assert decode_vector_log(legacy) == {"m": "old", "n": 2}
    # non-log wrapper → None (a metric event on a log decode path)
    metric = encode_message(
        {"metric": {"name": "c", "kind": 1, "counter": {"value": 2.0}}},
        VECTOR_REGISTRY["EventWrapper"],
        VECTOR_REGISTRY,
    )
    assert decode_vector_log(metric) is None


def test_otlp_logs_roundtrip():
    recs = [
        {
            "time_unix_nano": 1700000000123456789,
            "severity_number": 9,
            "severity_text": "INFO",
            "body": "boot complete",
            "attributes": {"k": "v", "n": 5, "deep": {"x": [1, 2]}},
        },
        {"severity_text": "ERROR", "body": {"structured": True}},
    ]
    out = decode_otlp_logs(encode_otlp_logs(recs, {"service.name": "svc"}))
    assert len(out) == 2
    assert out[0]["time_unix_nano"] == 1700000000123456789
    assert out[0]["body"] == "boot complete"
    assert out[0]["attributes"] == {"k": "v", "n": 5, "deep": {"x": [1, 2]}}
    assert out[0]["resource"] == {"service.name": "svc"}
    assert out[1]["body"] == {"structured": True}
    # registry self-check: LogRecord field numbers match logs.proto v1
    assert OTLP_REGISTRY["LogRecord"][1][0] == "time_unix_nano"
    assert OTLP_REGISTRY["LogRecord"][9][0] == "trace_id"


def test_spark_native_proto_roundtrip_exact(spark, events):
    """Arrow-batched encode -> decode over the events table is an exact
    identity, timestamps to the microsecond."""
    from vector_spark.functions.codecs import (
        decode_native_proto_json,
        encode_native_proto,
    )

    ev = events.limit(200)
    enc = ev.select(
        encode_native_proto(
            F.struct("event_id", "user_id", "event_type", "value", "ts")
        ).alias("payload")
    )
    dec = enc.select(
        F.from_json(
            decode_native_proto_json(F.col("payload")),
            "event_id long, user_id long, event_type string, value double, ts long",
        ).alias("d")
    ).select(
        "d.event_id", "d.user_id", "d.event_type", "d.value",
        F.timestamp_micros(F.col("d.ts")).alias("ts"),
    )
    orig = ev.select("event_id", "user_id", "event_type", "value", "ts")
    assert dec.exceptAll(orig).count() == 0
    assert orig.exceptAll(dec).count() == 0


def test_grpc_framing_otlp_roundtrip(spark):
    """gRPC message framing (flag + 4-byte BE length) around OTLP
    protobuf payloads: frame -> concatenate -> deframe -> decode, all
    but the payload decode pure Column."""
    from vector_spark.functions.framing import frame_grpc, grpc_message_frames

    p1 = encode_otlp_logs([{"body": "one", "severity_text": "INFO"}])
    p2 = encode_otlp_logs([{"body": "two"}, {"body": "three"}])
    df = spark.createDataFrame([(p1,), (p2,)], "payload binary")
    framed = df.select(frame_grpc(F.col("payload")).alias("f"))
    blob = b"".join(r.f for r in framed.collect())
    assert blob[0] == 0 and int.from_bytes(blob[1:5], "big") == len(p1)
    df2 = spark.createDataFrame([(blob,)], "stream binary")
    [row] = df2.select(grpc_message_frames(F.col("stream")).alias("msgs")).collect()
    assert [bytes(m) for m in row.msgs] == [p1, p2]
    bodies = [r["body"] for m in row.msgs for r in decode_otlp_logs(bytes(m))]
    assert bodies == ["one", "two", "three"]
    # a compressed frame (flag 1) stops the walk — opaque by contract
    df3 = spark.createDataFrame(
        [(b"\x01" + len(p1).to_bytes(4, "big") + p1,)], "stream binary"
    )
    [row3] = df3.select(grpc_message_frames(F.col("stream")).alias("m")).collect()
    assert row3.m == []


def test_vector_event_array_batch():
    """EventArray(logs) batch form — the vector-to-vector protocol's
    payload (proto/vector/vector.proto PushEventsRequest)."""
    from vector_spark.functions.protowire import (
        decode_vector_log_array,
        encode_vector_log_array,
    )

    events = [
        {"message": "a", "n": 1},
        {"message": "b", "nested": {"x": [1, "two"]}},
    ]
    assert decode_vector_log_array(encode_vector_log_array(events)) == events


def test_descriptor_set_reader_and_vrl_proto(spark, tmp_path):
    """FileDescriptorSet → registry → parse/encode roundtrip, and the
    VRL parse_proto/encode_proto surface (formerly env-gated on the
    protobuf library). The descriptor bytes are produced by this codec's
    own encoder against the public descriptor.proto schema — the same
    bytes `protoc --descriptor_set_out` emits for this file."""
    from vector_spark.functions.protowire import (
        DESCRIPTOR_REGISTRY,
        encode_proto_with_descriptor,
        parse_proto_with_descriptor,
        registry_from_descriptor_set,
    )

    # syntax = proto3; package demo;
    # message Point { sint32 x=1; sint32 y=2; }
    # message Track { string name=1; repeated Point points=2; double w=3; }
    desc = encode_message(
        {
            "file": [
                {
                    "name": "demo.proto",
                    "package": "demo",
                    "message_type": [
                        {
                            "name": "Point",
                            "field": [
                                {"name": "x", "number": 1, "label": 1, "type": 17},
                                {"name": "y", "number": 2, "label": 1, "type": 17},
                            ],
                        },
                        {
                            "name": "Track",
                            "field": [
                                {"name": "name", "number": 1, "label": 1, "type": 9},
                                {"name": "points", "number": 2, "label": 3,
                                 "type": 11, "type_name": ".demo.Point"},
                                {"name": "w", "number": 3, "label": 1, "type": 1},
                            ],
                        },
                    ],
                }
            ]
        },
        DESCRIPTOR_REGISTRY["FileDescriptorSet"],
        DESCRIPTOR_REGISTRY,
    )
    reg = registry_from_descriptor_set(desc)
    assert set(reg) == {"demo.Point", "demo.Track"}
    obj = {"name": "t1", "points": [{"x": -3, "y": 4}, {"x": 10, "y": -20}], "w": 2.5}
    wire = encode_proto_with_descriptor(obj, desc, "demo.Track")
    assert parse_proto_with_descriptor(wire, desc, "demo.Track") == obj

    # VRL surface over a binary column
    from vector_spark.functions.vrl_compiler import vrl_remap

    desc_path = tmp_path / "demo.desc"
    desc_path.write_bytes(desc)
    df = spark.createDataFrame([(wire,)], "payload binary")
    out = vrl_remap(
        df,
        f'.t = parse_proto(.payload, "{desc_path}", "demo.Track")\n'
        ".nm = .t.name\n",
    )[""].collect()[0]
    assert out.nm == "t1"
    import json as _json

    assert _json.loads(out.t)["points"][0] == {"x": -3, "y": 4}


def test_row_values_encode_as_maps_not_arrays():
    # ADVICE r4 (medium): pyspark Row subclasses tuple, so a nested struct
    # column used to fall into the array branch and silently drop field
    # names. A Row must travel as a map Value and decode back as a dict.
    from pyspark.sql import Row

    ev = {"message": "m", "parts": Row(host="h", port=80)}
    out = decode_vector_log(encode_vector_log(ev))
    assert out == {"message": "m", "parts": {"host": "h", "port": 80}}
