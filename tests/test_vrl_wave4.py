"""Wave-4 VRL stdlib: value-level checks against independently computed
expectations (Python stdlib reimplementations or hand-computed vectors)."""

from __future__ import annotations

import gzip
import hashlib
import math
import zlib

import pytest
from pyspark.sql import functions as F

from vector_spark.functions.vrl import VRL_FUNCTIONS as V
from vector_spark.functions.vrl_wave4 import EnvGatedError


def one(spark, col):
    return spark.range(1).select(col.alias("v")).head()[0]


def test_casing(spark):
    assert one(spark, V["kebabcase"](F.lit("fooBar baz_qux"))) == "foo-bar-baz-qux"
    assert one(spark, V["pascalcase"](F.lit("foo_bar-baz"))) == "FooBarBaz"
    assert (
        one(spark, V["screamingsnakecase"](F.lit("fooBar baz"))) == "FOO_BAR_BAZ"
    )


def test_shannon_entropy(spark):
    # H("aabb") = 1.0 bit; H("abcd") = 2.0 bits; independent formula below
    def h(s):
        n = len(s)
        return -sum(
            (s.count(c) / n) * math.log2(s.count(c) / n) for c in set(s)
        )

    for text in ("aabb", "abcd", "mississippi"):
        got = one(spark, V["shannon_entropy"](F.lit(text)))
        assert got == pytest.approx(h(text), rel=1e-9), text


def test_sieve_and_contains_all(spark):
    # the VRL doc example, default replacements
    got = one(spark, V["sieve"](F.lit("test123%456.فوائد.net."), r"[a-z.0-9]"))
    assert got == "test123_456._.net."
    # explicit replacements: single char dropped, runs collapsed to one dash
    got2 = one(
        spark,
        V["sieve"](F.lit("test123%456.فوائد.net."), r"[a-z.0-9]", "", "-"),
    )
    assert got2 == "test123456.-.net."
    assert one(spark, V["contains_all"](F.lit("a b c"), ["a", "c"])) is True
    assert one(spark, V["contains_all"](F.lit("a b c"), ["a", "z"])) is False


def test_format_int(spark):
    assert one(spark, V["format_int"](F.lit(255), 16)) == "ff"
    assert one(spark, V["format_int"](F.lit(5), 2)) == "101"


def test_encode_logfmt_sorted(spark):
    m = F.create_map(
        F.lit("lvl"), F.lit("info"), F.lit("app"), F.lit("api")
    )
    assert one(spark, V["encode_logfmt"](m)) == "app=api lvl=info"


def test_community_id_known_vector(spark):
    """Spec test vector (community-id-spec repo, baseline tcp):
    1.2.3.4:1122 -> 5.6.7.8:3344 proto 6 => 1:wCb3OG7yAFWelaUydu0D+125CLM="""
    got = one(
        spark,
        V["community_id"](
            F.lit("1.2.3.4"), F.lit("5.6.7.8"), F.lit(1122), F.lit(3344),
            F.lit(6),
        ),
    )
    import base64
    import struct

    payload = (
        struct.pack("!H", 0)
        + bytes([1, 2, 3, 4])
        + bytes([5, 6, 7, 8])
        + bytes([6, 0])
        + struct.pack("!H", 1122)
        + struct.pack("!H", 3344)
    )
    want = "1:" + base64.b64encode(hashlib.sha1(payload).digest()).decode()
    assert got == want
    # direction-invariant: reversed endpoints hash identically
    rev = one(
        spark,
        V["community_id"](
            F.lit("5.6.7.8"), F.lit("1.2.3.4"), F.lit(3344), F.lit(1122),
            F.lit(6),
        ),
    )
    assert rev == got


def test_ip_pton_ntop_roundtrip(spark):
    assert one(spark, V["ip_ntop"](V["ip_pton"](F.lit("10.1.255.3")))) == (
        "10.1.255.3"
    )


def test_parse_klog(spark):
    line = "I0919 12:00:00.000000   12345 main.go:123] hello world"
    row = one(spark, V["parse_klog"](F.lit(line)))
    assert row["level"] == "info"
    assert row["file"] == "main.go"
    assert row["line"] == 123
    assert row["id"] == 12345
    assert row["message"] == "hello world"


def test_parse_influxdb(spark):
    line = "cpu,host=a,region=us usage=0.5,idle=99i 1556813561098000000"
    row = one(spark, V["parse_influxdb"](F.lit(line)))
    assert row["measurement"] == "cpu"
    assert row["tags"] == {"host": "a", "region": "us"}
    assert row["fields"]["usage"] == "0.5"
    assert row["fields"]["idle"] == "99"
    assert row["timestamp"] == 1556813561098000000


def test_parse_aws_alb_log(spark):
    line = (
        'http 2018-11-30T22:23:00.186641Z app/my-lb/50dc6c495c0c9188 '
        '192.168.131.39:2817 10.0.0.1:80 0.000 0.001 0.000 200 200 34 366 '
        '"GET http://www.example.com:80/ HTTP/1.1" "curl/7.46.0" - - '
    )
    row = one(spark, V["parse_aws_alb_log"](F.lit(line)))
    assert row["type"] == "http"
    assert row["elb"] == "app/my-lb/50dc6c495c0c9188"
    assert row["client_host"] == "192.168.131.39:2817"
    assert row["client_port"] == 2817
    assert row["elb_status_code"] == "200"  # reference keeps codes as strings
    assert row["request_method"] == "GET"
    assert row["user_agent"] == "curl/7.46.0"


def test_parse_regex_all(spark):
    got = one(
        spark,
        V["parse_regex_all"](
            F.lit("first group and second group"),
            r"(?P<number>\w+) group",
        ),
    )
    assert [r["number"] for r in got] == ["first", "second"]


def test_parse_etld(spark):
    assert one(spark, V["parse_etld"](F.lit("sub.example.co.uk"))) == "co.uk"
    assert one(spark, V["parse_etld"](F.lit("example.com"))) == "com"
    assert (
        one(spark, V["parse_etld"](F.lit("sub.example.co.uk"), plus_parts=1))
        == "example.co.uk"
    )


def test_gzip_zlib_roundtrip(spark):
    data = b"the quick brown fox jumps over the lazy dog" * 10
    got = one(spark, V["decode_gzip"](V["encode_gzip"](F.lit(data))))
    assert bytes(got) == data
    # cross-check against python gzip (mtime=0 makes output deterministic)
    enc = one(spark, V["encode_gzip"](F.lit(data)))
    assert gzip.decompress(bytes(enc)) == data
    z = one(spark, V["decode_zlib"](V["encode_zlib"](F.lit(data))))
    assert bytes(z) == data
    assert zlib.decompress(bytes(one(spark, V["encode_zlib"](F.lit(data))))) == data


def test_punycode(spark):
    assert one(spark, V["encode_punycode"](F.lit("www.café.com"))) == (
        "www.xn--caf-dma.com"
    )
    assert one(spark, V["decode_punycode"](F.lit("www.xn--caf-dma.com"))) == (
        "www.café.com"
    )


def test_decode_mime_q(spark):
    assert one(
        spark, V["decode_mime_q"](F.lit("=?utf-8?b?SGVsbG8sIFdvcmxkIQ==?="))
    ) == "Hello, World!"


def test_sha3(spark):
    assert one(spark, V["sha3"](F.lit("abc"), "SHA3-256")) == hashlib.sha3_256(
        b"abc"
    ).hexdigest()
    assert one(spark, V["sha3"](F.lit("abc"))) == hashlib.sha3_512(
        b"abc"
    ).hexdigest()


def test_charset_roundtrip(spark):
    got = one(
        spark,
        V["decode_charset"](V["encode_charset"](F.lit("héllo"), "latin-1"), "latin-1"),
    )
    assert got == "héllo"


def test_parse_ruby_hash(spark):
    import json

    got = one(
        spark,
        V["parse_ruby_hash"](F.lit('{ "test" => "value", :sym => nil, "n" => 3 }')),
    )
    assert json.loads(got) == {"test": "value", "sym": None, "n": 3}


def test_parse_xml(spark):
    import json

    got = one(
        spark,
        V["parse_xml"](F.lit('<note id="1"><to>a</to><to>b</to><body>hi</body></note>')),
    )
    doc = json.loads(got)
    assert doc["note"]["@id"] == "1"
    assert doc["note"]["to"] == ["a", "b"]
    assert doc["note"]["body"] == "hi"


def test_unflatten(spark):
    import json

    m = F.create_map(
        F.lit("a.b"), F.lit("1"), F.lit("a.c"), F.lit("2"), F.lit("d"), F.lit("3")
    )
    got = json.loads(one(spark, V["unflatten"](m)))
    assert got == {"a": {"b": "1", "c": "2"}, "d": "3"}


def test_uuid_from_friendly_id(spark):
    # base62("f") = 41 → uuid ...0029? hand-compute: 'f' index = 41
    got = one(spark, V["uuid_from_friendly_id"](F.lit("f")))
    assert got == "00000000-0000-0000-0000-000000000029"


def test_env_gates_raise():
    # zstd/lz4/encrypt all un-gated in r10 (pure codecs; cryptography
    # ships with pyspark) — the network opt-in is the remaining gate
    with pytest.raises(EnvGatedError):
        V["dns_lookup"](F.lit("example.com"))


def test_zstd_roundtrip(spark):
    got = one(
        spark,
        V["decode_zstd"](V["encode_zstd"](F.lit("store-mode ok")))
        .cast("string"),
    )
    assert got == "store-mode ok"


def test_zstd_store_mode_interop():
    """Our frames are valid Zstandard (the real CLI decodes them) and
    real Raw/RLE frames decode here; entropy-coded blocks raise."""
    import shutil
    import subprocess

    from vector_spark.functions import zstd as z

    data = b"payload \x00\x01" * 1000
    frame = z.compress(data)
    assert z.decompress(frame) == data
    # hand-built RLE block frame: 'A' * 20
    rle = (b"\x28\xb5\x2f\xfd" + bytes([0x20, 20])
           + (1 | (1 << 1) | (20 << 3)).to_bytes(3, "little") + b"A")
    assert z.decompress(rle) == b"A" * 20
    if shutil.which("zstd"):
        p = subprocess.run(["zstd", "-d", "-c"], input=frame,
                           capture_output=True)
        assert p.returncode == 0 and p.stdout == data


@pytest.mark.parametrize("alg,klen,ivlen", [
    ("AES-128-CBC-PKCS7", 16, 16),
    ("AES-256-CBC-PKCS7", 32, 16),
    ("AES-256-CTR", 32, 16),
    ("AES-256-CFB", 32, 16),
    ("AES-256-OFB", 32, 16),
    ("AES-256-GCM", 32, 12),
    ("AES-256-CTR-LE", 32, 16),
    ("AES-256-CBC-ANSIX923", 32, 16),
    ("AES-256-CBC-ISO7816", 32, 16),
    ("AES-256-CBC-ISO10126", 32, 16),
    ("CHACHA20-POLY1305", 32, 12),
    ("XCHACHA20-POLY1305", 32, 24),
])
def test_encrypt_decrypt_roundtrip(spark, alg, klen, ivlen):
    key = bytes(range(klen))
    iv = bytes(range(100, 100 + ivlen))
    got = one(
        spark,
        V["decrypt"](
            V["encrypt"](F.lit("vrl crypto"), alg, key, iv),
            alg, key, iv,
        ).cast("string"),
    )
    assert got == "vrl crypto"


def test_encrypt_validates_driver_side():
    with pytest.raises(ValueError, match="32-byte key"):
        V["encrypt"](F.lit("x"), "AES-256-GCM", b"short", b"0" * 12)
    with pytest.raises(ValueError, match="unsupported"):
        V["encrypt"](F.lit("x"), "XSALSA20-POLY1305", b"k" * 32, b"0" * 24)


def test_hchacha20_rfc_vector():
    """HChaCha20 subkey derivation against the draft-irtf-cfrg-xchacha
    §2.2.1 test vector (the XChaCha20-Poly1305 key-derivation seam)."""
    from vector_spark.functions.vrl_wave4 import _hchacha20

    import struct

    from cryptography.hazmat.primitives.ciphers import (
        Cipher, algorithms,
    )

    key = bytes(range(32))
    nonce = bytes.fromhex("000000090000004a0000000031415927")
    want = bytes.fromhex(
        "82413b4227b27bfed30e42508a877d73"
        "a0f9e4d58a74a853c12ec41326d3ecdc")
    assert _hchacha20(key, nonce) == want
    # independent cross-derivation: ChaCha20 keystream block 0 equals
    # state-after-rounds PLUS initial state, so subtracting the
    # initial words recovers the HChaCha20 output — a second
    # implementation path confirming the pinned constant
    enc = Cipher(algorithms.ChaCha20(key, nonce), mode=None).encryptor()
    ks = struct.unpack("<16I", enc.update(bytes(64)))
    init = (list(struct.unpack("<4I", b"expand 32-byte k"))
            + list(struct.unpack("<8I", key))
            + list(struct.unpack("<4I", nonce)))
    after = [(k - i) & 0xFFFFFFFF for k, i in zip(ks, init)]
    assert struct.pack("<8I", *(after[0:4] + after[12:16])) == want


def test_ctr_le_differs_from_ctr_be(spark):
    """CTR-LE increments the block counter little-endian — on a
    multi-block input the second block's keystream must differ from
    big-endian CTR (first block identical: same initial counter)."""
    key, iv = b"k" * 32, b"\x01" + bytes(15)
    data = F.lit(b"A" * 48)
    le = one(spark, V["encrypt"](data, "AES-256-CTR-LE", key, iv))
    be = one(spark, V["encrypt"](data, "AES-256-CTR", key, iv))
    assert bytes(le[:16]) == bytes(be[:16])
    assert bytes(le[16:32]) != bytes(be[16:32])


def test_decrypt_bad_tag_is_fallible_null(spark):
    key, iv = b"k" * 32, b"n" * 12
    ct = V["encrypt"](F.lit("x"), "AES-256-GCM", key, iv)
    got = one(spark, V["decrypt"](ct, "AES-256-GCM", b"w" * 32, iv))
    assert got is None


def test_secrets_compile(spark):
    """get_secret/set_secret/remove_secret through the remap compiler over
    the `_secrets` map column convention."""
    from vector_spark.functions.vrl_compiler import vrl_remap

    df = spark.createDataFrame(
        [("a", {"token": "t0"})], "id string, _secrets map<string,string>"
    )
    out = vrl_remap(
        df,
        '.tok = get_secret("token")\n'
        'set_secret("other", "v2")\n'
        'remove_secret("token")',
    )[""]
    row = out.head()
    assert row["tok"] == "t0"
    assert row["_secrets"] == {"other": "v2"}


def test_tally_value(spark):
    arr = F.array(F.lit("a"), F.lit("b"), F.lit("a"))
    assert one(spark, V["tally_value"](arr, "a")) == 2


def test_vrl_enrichment_table_lookup(spark):
    """get_enrichment_table_record resolves through a broadcast join; the
    fallible form errors (original forwarded) when no row matches."""
    from vector_spark.functions.vrl_compiler import vrl_remap

    events = spark.createDataFrame(
        [(1, "us"), (2, "de"), (3, "xx")], "id long, cc string"
    )
    geo = spark.createDataFrame(
        [("us", "United States", "NA"), ("de", "Germany", "EU")],
        "code string, country string, region string",
    )
    out = vrl_remap(
        events,
        '.geo = get_enrichment_table_record!("geo", {"code": .cc})\n'
        ".country = .geo.country",
        enrichment_tables={"geo": geo},
        reroute_dropped=True,
    )
    ok = {r["id"]: r for r in out[""].collect()}
    assert ok[1]["country"] == "United States"
    assert ok[2]["geo"]["region"] == "EU"
    dropped = out["dropped"].collect()
    assert [r["id"] for r in dropped] == [3]  # no match -> errored


def test_vrl_enrichment_multi_and_case(spark):
    from pyspark.sql import functions as F

    from vector_spark.functions.vrl_compiler import vrl_remap

    events = spark.createDataFrame([("A",)], "k string")
    t = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, v int"
    )
    out = vrl_remap(
        events,
        '.hits = find_enrichment_table_records("tbl", {"k": .k}, '
        "case_sensitive: false)\n"
        ".first_v = .hits[0].v",
        enrichment_tables={"tbl": t},
    )[""]
    row = out.head()
    assert sorted(h["v"] for h in row["hits"]) == [1, 2]
    assert row["first_v"] in (1, 2)


def test_vrl_enrichment_plan_is_broadcast(spark):
    from vector_spark.functions.vrl_compiler import vrl_remap

    events = spark.createDataFrame([(1, "us")], "id long, cc string")
    geo = spark.createDataFrame([("us", "US")], "code string, name string")
    df = vrl_remap(
        events,
        '.geo = get_enrichment_table_record!("geo", {"code": .cc})',
        enrichment_tables={"geo": geo},
    )[""]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan


def test_match_datadog_query(spark):
    from vector_spark.functions.vrl_compiler import vrl_remap

    df = spark.createDataFrame(
        [("error", 500), ("info", 200)], "status string, code int"
    )
    out = vrl_remap(df, '.is_err = match_datadog_query("status:error")')[""]
    got = {r["code"]: r["is_err"] for r in out.collect()}
    assert got[500] is True and got[200] is False


def test_parse_cbor(spark):
    """Minimal CBOR decoder vs hand-encoded RFC 8949 bytes."""
    import json

    # {"a": 1, "b": [true, null, -5], "s": "hi", "f": 1.5} hand-encoded:
    # map(4); "a"->uint 1; "b"->array(3) true/null/neg(4); "s"->"hi";
    # "f"->float64 1.5 (0x3FF8000000000000 big-endian)
    cbor = bytes(
        [0xA4,
         0x61, ord("a"), 0x01,
         0x61, ord("b"), 0x83, 0xF5, 0xF6, 0x24,
         0x61, ord("s"), 0x62, ord("h"), ord("i"),
         0x61, ord("f"), 0xFB, 0x3F, 0xF8, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00]
    )
    got = (
        spark.range(1)
        .select(V["parse_cbor"](F.lit(cbor)).alias("v"))
        .head()["v"]
    )
    assert json.loads(got) == {"a": 1, "b": [True, None, -5], "s": "hi", "f": 1.5}
    # garbage bytes → null, not an error
    bad = (
        spark.range(1)
        .select(V["parse_cbor"](F.lit(b"\xff\xff\xff")).alias("v"))
        .head()["v"]
    )
    assert bad is None


def test_parse_msgpack(spark):
    """Hand-encoded MessagePack (the fluent forward payload shape:
    [tag, time, record-map])."""
    import json

    # ["app.log", 1700000000, {"msg": "hi", "n": -3, "ok": true}]
    tag = b"\xa7app.log"                  # fixstr 7
    t = b"\xce" + (1700000000).to_bytes(4, "big")  # uint32
    rec = (b"\x83"                        # fixmap 3
           + b"\xa3msg" + b"\xa2hi"
           + b"\xa1n" + b"\xfd"           # negative fixint -3
           + b"\xa2ok" + b"\xc3")
    payload = b"\x93" + tag + t + rec     # fixarray 3
    got = (
        spark.range(1)
        .select(V["parse_msgpack"](F.lit(payload)).alias("v"))
        .head()["v"]
    )
    assert json.loads(got) == [
        "app.log", 1700000000, {"msg": "hi", "n": -3, "ok": True}
    ]
    # floats, str8, array16
    p2 = b"\xcb" + __import__("struct").pack(">d", 2.5)
    assert json.loads(
        spark.range(1).select(V["parse_msgpack"](F.lit(p2)).alias("v")).head()["v"]
    ) == 2.5


def test_parse_msgpack_ext_eventtime(spark):
    """fluentd EventTime (ext type 0, fixext8: 4B sec + 4B nsec) decodes
    to a float epoch; unknown ext types surface as a tagged object
    (ADVICE r2: subsecond fluent payloads previously decoded to null)."""
    import base64
    import json

    # ["tag", EventTime(1700000000.5), {"m": "x"}]
    et = b"\xd7\x00" + (1700000000).to_bytes(4, "big") + (500000000).to_bytes(4, "big")
    payload = b"\x93" + b"\xa3tag" + et + b"\x81\xa1m\xa1x"
    got = json.loads(
        spark.range(1)
        .select(V["parse_msgpack"](F.lit(payload)).alias("v"))
        .head()["v"]
    )
    assert got == ["tag", 1700000000.5, {"m": "x"}]
    # ext8-framed EventTime (fluentd emits either form)
    et8 = b"\xc7\x08\x00" + (1700000001).to_bytes(4, "big") + b"\x00" * 4
    got8 = json.loads(
        spark.range(1).select(V["parse_msgpack"](F.lit(et8)).alias("v")).head()["v"]
    )
    assert got8 == 1700000001.0
    # unknown ext type tagged, not dropped
    unk = b"\xd4\x2a\x07"  # fixext1 type 42 body 0x07
    gotu = json.loads(
        spark.range(1).select(V["parse_msgpack"](F.lit(unk)).alias("v")).head()["v"]
    )
    assert gotu == {
        "__ext_type": 42,
        "__ext_data": base64.b64encode(b"\x07").decode(),
    }


def test_parse_etld_short_domain_clamped(spark):
    """A domain with fewer labels than suffix+plus_parts must not throw
    (slice start would be <= 0) — returns the whole domain (ADVICE r2)."""
    assert one(spark, V["parse_etld"](F.lit("com"), plus_parts=1)) == "com"
    assert one(spark, V["parse_etld"](F.lit("co.uk"), plus_parts=1)) == "co.uk"


# ---- r3 honest-delta closures: merge right-wins/deep, real uuid_v7 ----

def test_merge_right_wins_on_duplicate_keys(spark):
    a = F.create_map(F.lit("x"), F.lit("1"), F.lit("y"), F.lit("2"))
    b = F.create_map(F.lit("y"), F.lit("9"), F.lit("z"), F.lit("3"))
    out = one(spark, V["merge"](a, b))
    assert dict(out) == {"x": "1", "y": "9", "z": "3"}


def test_merge_deep_merges_nested_maps(spark):
    inner_a = F.create_map(F.lit("p"), F.lit("1"), F.lit("q"), F.lit("2"))
    inner_b = F.create_map(F.lit("q"), F.lit("9"), F.lit("r"), F.lit("3"))
    a = F.create_map(F.lit("n"), inner_a, F.lit("only_a"), inner_a)
    b = F.create_map(F.lit("n"), inner_b, F.lit("only_b"), inner_b)
    out = one(spark, V["merge"](a, b, deep=True))
    got = {k: dict(v) for k, v in out.items()}
    # collided nested map merges right-wins instead of being replaced
    assert got["n"] == {"p": "1", "q": "9", "r": "3"}
    assert got["only_a"] == {"p": "1", "q": "2"}
    assert got["only_b"] == {"q": "9", "r": "3"}


def test_uuid_v7_layout_and_time_order(spark):
    import re

    df = spark.createDataFrame(
        [("2024-03-05 06:07:08.123",), ("2024-03-05 06:07:09.456",)],
        "ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    rows = df.select(V["uuid_v7"](F.col("ts")).alias("u"), "ts_s").collect()
    pat = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    )
    by_ts = {r.ts_s: r.u for r in rows}
    for u in by_ts.values():
        assert pat.match(u), u
    # time-ordered: ms-timestamp prefix sorts with the timestamp
    assert by_ts["2024-03-05 06:07:08.123"][:13] < by_ts["2024-03-05 06:07:09.456"][:13]
    # 48-bit prefix is the unix ms of the input
    ms = int(by_ts["2024-03-05 06:07:08.123"][:8] + by_ts["2024-03-05 06:07:08.123"][9:13], 16)
    import datetime
    expect = int(datetime.datetime(2024, 3, 5, 6, 7, 8, 123000,
                                   tzinfo=datetime.timezone.utc).timestamp() * 1000)
    assert ms == expect


def test_lz4_roundtrip(spark):
    got = one(
        spark,
        V["decode_lz4"](V["encode_lz4"](F.lit("lz4 store-mode")))
        .cast("string"),
    )
    assert got == "lz4 store-mode"


def test_lz4_frame_interop():
    """Our stored-block frames decode with the real lz4 CLI, and real
    lz4 output (compressed blocks) decodes with the pure-Python block
    decoder — full two-way interop, unlike the zstd store-mode-only
    stance."""
    import shutil
    import subprocess

    from vector_spark.functions import lz4 as z

    data = b"repetitive payload " * 2000 + bytes(range(256))
    frame = z.compress(data)
    assert z.decompress(frame) == data
    if shutil.which("lz4"):
        p = subprocess.run(["lz4", "-d", "-c"], input=frame,
                           capture_output=True)
        assert p.returncode == 0 and p.stdout == data
        q = subprocess.run(["lz4", "-c"], input=data,
                           capture_output=True)
        assert z.decompress(q.stdout) == data


def test_lz4_xxh32_spec_vectors():
    """xxHash-32 against the published spec vectors (the HC stamp in
    the frame descriptor derives from it)."""
    from vector_spark.functions.lz4 import _xxh32

    assert _xxh32(b"") == 0x02CC5D05
    assert _xxh32(b"", seed=0x9E3779B1) == 0x36B78AE7
    assert _xxh32(b"Hello World") == 0xB1FD16EE


def test_zstd_truncated_frames_raise():
    """A torn frame must raise, not hang: the empty block-header slice
    used to decode as last=0/Raw/size-0 and loop forever."""
    from vector_spark.functions import zstd as z

    # incompressible payload: r11's real compressor would shrink
    # b"x"*1000 below the 50-byte truncation slice used here
    import hashlib

    blob = b"".join(hashlib.sha256(bytes([i])).digest()
                    for i in range(32))
    whole = z.compress(blob)
    assert len(whole) > 60
    for bad in (whole[:-3], whole[:-50],
                b"\x28\xb5\x2f\xfd\x20\x05",  # header, no block
                b"\x28\xb5\x2f\xfd"):
        with pytest.raises(ValueError):
            z.decompress(bad)


def test_lz4_real_compression_ratio_and_fuzz():
    """r11: lz4.compress emits really-compressed blocks (greedy
    hash-table matcher). Compressible data must shrink hard, stored
    fallback keeps incompressible data near 1.0, and the CLI decodes
    every frame byte-identically."""
    import random
    import shutil
    import subprocess

    from vector_spark.functions import lz4 as z

    logs = b"".join(b"2026-08-16 INFO request %d handled in %dms\n"
                    % (i, i % 40) for i in range(4000))
    assert len(z.compress(logs)) < len(logs) // 4
    rng = random.Random(5)
    noise = bytes(rng.randrange(256) for _ in range(30000))
    assert len(z.compress(noise)) <= len(noise) + 32  # stored fallback
    cli = shutil.which("lz4")
    for i in range(30):
        n = rng.randrange(0, 60000)
        kind = rng.randrange(4)
        if kind == 0:
            d = bytes(rng.randrange(256) for _ in range(min(n, 10000)))
        elif kind == 1:
            d = bytes(rng.randrange(6) for _ in range(n))
        elif kind == 2:
            unit = bytes(rng.randrange(256)
                         for _ in range(rng.randint(1, 50)))
            d = (unit * (n // max(len(unit), 1) + 1))[:n]
        else:
            d = b"".join(b"k%d=v%d;" % (j % 90, j % 11)
                         for j in range(n // 8))
        frame = z.compress(d)
        assert z.decompress(frame) == d, (i, kind, n)
        if cli:
            p = subprocess.run([cli, "-d", "-c"], input=frame,
                               capture_output=True)
            assert p.returncode == 0 and p.stdout == d, (i, kind, n)
