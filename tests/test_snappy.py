"""Pure-Python snappy codec (functions/snappy.py) + the prometheus
remote_write endpoint that rides on it."""

from __future__ import annotations

from vector_spark.functions.snappy import compress, decompress


def test_literal_roundtrip_and_spec_bytes():
    for data in (b"", b"x", b"hello world", b"A" * 100_000):
        assert decompress(compress(data)) == data
    # spec worked shape: uvarint(5) + literal tag (len-1=4)<<2 + bytes
    assert compress(b"abcde")[:2] == b"\x05\x10"


def test_copy_elements_decode():
    # hand-built stream exercising all three copy forms + overlap RLE
    out = bytearray()
    out += b"\x1a"  # uncompressed length 26
    out += bytes([(8 - 1) << 2]) + b"abcdefgh"        # literal "abcdefgh"
    # 1-byte-offset copy: len=4, offset=8 -> "abcd"
    out += bytes([1 | ((4 - 4) << 2) | ((8 >> 8) << 5), 8])
    # 2-byte-offset copy: len=6, offset=4 -> "efgh" + overlap... offset 4
    # from pos 12: copies "abcd" then continues into its own output
    out += bytes([2 | ((6 - 1) << 2)]) + (4).to_bytes(2, "little")
    # overlapping RLE: offset=1 len=8 repeats last byte
    out += bytes([2 | ((8 - 1) << 2)]) + (1).to_bytes(2, "little")
    got = decompress(bytes(out))
    assert got[:8] == b"abcdefgh"
    assert got[8:12] == b"abcd"
    assert got[12:18] == b"abcdab"  # overlapping copy wraps its output
    assert got[18:] == got[17:18] * 8


def test_vrl_snappy_roundtrip(spark):
    from pyspark.sql import functions as F

    from vector_spark.functions.vrl import VRL_FUNCTIONS

    df = spark.createDataFrame([("squeeze me please",)], "t string")
    out = df.select(
        VRL_FUNCTIONS["decode_snappy"](
            VRL_FUNCTIONS["encode_snappy"](F.col("t"))
        ).alias("rt")
    ).collect()[0]
    assert bytes(out.rt) == b"squeeze me please"


def test_prometheus_remote_write_endpoint(spark, tmp_path):
    """snappy(WriteRequest protobuf) POSTed to an http_server endpoint
    -> one event per sample with labels flattened (src/sources/
    prometheus/remote_write.rs)."""
    import http.client
    import json as _json
    import socket
    import time
    import uuid

    from vector_spark.config.loader import load_topology, start_streaming_sinks
    from vector_spark.functions.protowire import encode_message
    from vector_spark.functions.snappy import compress as scompress

    PROMPB = {
        "WriteRequest": {1: ("timeseries", "repeated msg:TimeSeries")},
        "TimeSeries": {
            1: ("labels", "repeated msg:Label"),
            2: ("samples", "repeated msg:Sample"),
        },
        "Label": {1: ("name", "string"), 2: ("value", "string")},
        "Sample": {1: ("value", "double"), 2: ("timestamp", "int64")},
    }
    req = {
        "timeseries": [
            {
                "labels": [
                    {"name": "__name__", "value": "http_requests_total"},
                    {"name": "job", "value": "api"},
                ],
                "samples": [
                    {"value": 1027.0, "timestamp": 1700000000000},
                    {"value": 1033.0, "timestamp": 1700000015000},
                ],
            }
        ]
    }
    body = scompress(
        encode_message(req, PROMPB["WriteRequest"], PROMPB)
    )

    def _free_port():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    port = _free_port()
    name = f"rw_{uuid.uuid4().hex[:8]}"
    topo = load_topology(
        spark,
        f"""
sources:
  ingest:
    type: http_server
    port: {port}
    endpoints:
      /api/v1/write: prometheus_remote_write
sinks:
  out: {{type: memory, inputs: [ingest], query_name: {name}}}
""",
    )
    queries = start_streaming_sinks(topo)
    try:
        deadline = time.time() + 30
        posted = False
        while time.time() < deadline and not posted:
            try:
                c = http.client.HTTPConnection("127.0.0.1", port, timeout=2)
                c.request(
                    "POST", "/api/v1/write", body=body,
                    headers={"Content-Type": "application/x-protobuf",
                             "Content-Encoding": "snappy"},
                )
                assert c.getresponse().status == 200
                posted = True
            except OSError:
                time.sleep(0.5)
        assert posted
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql(f"SELECT count(*) c FROM {name}").collect()[0].c
            if n >= 2:
                break
            time.sleep(1)
        assert n == 2
        rows = spark.sql(f"SELECT event FROM {name}").collect()
        evs = sorted(
            (_json.loads(r.event) for r in rows),
            key=lambda e: e["timestamp_ms"],
        )
        assert evs[0]["name"] == "http_requests_total"
        assert evs[0]["tags"] == {"job": "api"}
        assert evs[0]["value"] == 1027.0
        assert evs[1]["timestamp_ms"] == 1700000015000
    finally:
        for q in queries.values():
            q.stop()


def test_real_snappy_interop_via_pyarrow():
    """r11: compress() emits real copy elements. pyarrow bundles the
    reference C++ snappy — pin BOTH directions against it, the same
    two-way stance as the zstd/lz4 CLI pins."""
    import random

    import pyarrow as pa

    rng = random.Random(1)
    for t in range(40):
        n = rng.randrange(0, 200000)
        k = t % 4
        if k == 0:
            d = bytes(rng.randrange(256) for _ in range(min(n, 10000)))
        elif k == 1:
            d = bytes(rng.randrange(6) for _ in range(n))
        elif k == 2:
            d = b"".join(b"row %d field %d\n" % (j, j % 9)
                         for j in range(n // 12))
        else:
            u = bytes(rng.randrange(256)
                      for _ in range(rng.randint(1, 40)))
            d = (u * (n // max(len(u), 1) + 1))[:n]
        got = pa.decompress(compress(d), decompressed_size=len(d),
                            codec="snappy", asbytes=True)
        assert got == d, (t, k, n)
        assert decompress(pa.compress(d, codec="snappy",
                                      asbytes=True)) == d, (t, k, n)
    # and the ratio is real now, not 1.0
    logs = b"".join(b"metric{job=\"api\",i=\"%d\"} %d\n" % (i % 40, i)
                    for i in range(4000))
    assert len(compress(logs)) < len(logs) // 4
