"""Wave-5 VRL stdlib (the pinned vrl-main additions): value-level checks
against independently computed expectations, plus the two syntax items
from the same release window (`\\u{HEX}` escapes, `else` on a new line)
and the `find` → null-on-miss semantics change."""

from __future__ import annotations

import json
import math
import zlib

import pytest
from pyspark.sql import functions as F

import vector_spark.functions.vrl_wave5 as w5
from vector_spark.functions.vrl import VRL_FUNCTIONS as V
from vector_spark.functions.vrl_compiler import (
    VrlCompileError,
    _unescape_str,
    compile_vrl,
)


def one(spark, col):
    return spark.range(1).select(col.alias("v")).head()[0]


# ---- path functions -----------------------------------------------------

@pytest.mark.parametrize(
    "path,base,dirn",
    [
        ("/var/log/app.log", "app.log", "/var/log"),
        ("/var/log/", "log", "/var"),
        ("app.log", "app.log", "."),
        ("/", "/", "/"),
        ("//", "/", "/"),
        ("/app.log", "app.log", "/"),
        ("", "", "."),
        ("a//b", "b", "a"),
    ],
)
def test_basename_dirname(spark, path, base, dirn):
    assert one(spark, V["basename"](F.lit(path))) == base
    assert one(spark, V["dirname"](F.lit(path))) == dirn


def test_basename_suffix(spark):
    assert one(spark, V["basename"](F.lit("/a/x.txt"), ".txt")) == "x"
    # a non-proper suffix is NOT stripped (basename(1) rule)
    assert one(spark, V["basename"](F.lit("/a/.txt"), ".txt")) == ".txt"


def test_split_path(spark):
    assert one(spark, V["split_path"](F.lit("/var//log/app.log/"))) == [
        "var", "log", "app.log",
    ]
    assert one(spark, V["split_path"](F.lit("rel/p"))) == ["rel", "p"]


# ---- encode_csv ---------------------------------------------------------

def test_encode_csv(spark):
    arr = F.array(F.lit("plain"), F.lit("a,b"), F.lit('q"uote'), F.lit("nl\nx"))
    got = one(spark, V["encode_csv"](arr))
    # independent expectation from the csv module
    import csv as _csv
    import io

    buf = io.StringIO()
    _csv.writer(buf, lineterminator="\r\n").writerow(
        ["plain", "a,b", 'q"uote', "nl\nx"])
    assert got == buf.getvalue()[:-2]
    # nulls encode as empty fields
    got2 = one(spark, V["encode_csv"](F.array(F.lit(None), F.lit("b"))))
    assert got2 == ",b"


# ---- entries / pop ------------------------------------------------------

def test_entries_roundtrip(spark):
    m = F.create_map(F.lit("a"), F.lit("1"), F.lit("b"), F.lit("2"))
    ents = one(spark, V["to_entries"](m))
    assert [(e["key"], e["value"]) for e in ents] == [("a", "1"), ("b", "2")]
    back = one(spark, V["from_entries"](V["to_entries"](m)))
    assert back == {"a": "1", "b": "2"}


def test_pop(spark):
    assert one(spark, V["pop"](F.array(F.lit(1), F.lit(2), F.lit(3)))) == [1, 2]
    assert one(spark, V["pop"](F.array().cast("array<int>"))) == []


# ---- haversine ----------------------------------------------------------

def test_haversine(spark):
    # Paris → London with an independent reimplementation
    lat1, lon1, lat2, lon2 = 48.8566, 2.3522, 51.5074, -0.1278
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    dist_km = 2 * 6371.0 * math.asin(math.sqrt(a))
    bearing = math.degrees(
        math.atan2(
            math.sin(dl) * math.cos(p2),
            math.cos(p1) * math.sin(p2)
            - math.sin(p1) * math.cos(p2) * math.cos(dl),
        )
    ) % 360

    got = one(
        spark,
        V["haversine"](F.lit(lat1), F.lit(lon1), F.lit(lat2), F.lit(lon2)),
    )
    assert got["distance"] == pytest.approx(dist_km, rel=1e-12)
    assert got["bearing"] == pytest.approx(bearing, rel=1e-12)
    mi = one(
        spark,
        V["haversine"](
            F.lit(lat1), F.lit(lon1), F.lit(lat2), F.lit(lon2), "miles"
        ),
    )
    assert mi["distance"] == pytest.approx(dist_km / 6371.0 * 3958.8, rel=1e-12)


# ---- set / remove -------------------------------------------------------

def test_set_remove_struct(spark):
    base = F.struct(
        F.lit(1).alias("a"),
        F.struct(F.lit(2).alias("x"), F.lit(3).alias("y")).alias("b"),
    )
    got = one(spark, V["set"](base, ["b", "x"], F.lit(9)))
    assert got["b"]["x"] == 9 and got["b"]["y"] == 3
    removed = one(spark, V["remove"](base, ["b", "x"]))
    assert "x" not in removed["b"].asDict() and removed["b"]["y"] == 3


def test_set_remove_map(spark):
    from vector_spark.functions.vrl import _tag_dtype

    m = _tag_dtype(
        "map<string,string>", F.create_map(F.lit("k"), F.lit("v"))
    )
    got = one(spark, V["set"](m, ["k2"], F.lit("v2")))
    assert got == {"k": "v", "k2": "v2"}
    # replace keeps one entry per key
    rep = one(spark, V["set"](m, ["k"], F.lit("new")))
    assert rep == {"k": "new"}
    gone = one(spark, V["remove"](m, ["k"]))
    assert gone == {}


# ---- parse_groks --------------------------------------------------------

def test_parse_groks_first_match_wins(spark):
    pats = [
        "%{IPV4:ip} %{WORD:action}",
        "%{WORD:action} only",
    ]
    r1 = one(spark, V["parse_groks"](F.lit("10.0.0.1 allow"), pats))
    assert (r1["ip"], r1["action"]) == ("10.0.0.1", "allow")
    r2 = one(spark, V["parse_groks"](F.lit("deny only"), pats))
    assert r2["ip"] is None and r2["action"] == "deny"


# ---- xxhash / crc / base62 ----------------------------------------------

def test_xxhash_spec_vectors(spark):
    # spec vectors: XXH32("", 0) = 0x02CC5D05; XXH64("", 0) = 0xEF46DB3751D8E999
    assert one(spark, V["xxhash"](F.lit(""), "xxh32")) == str(0x02CC5D05)
    assert one(spark, V["xxhash"](F.lit(""))) == str(0xEF46DB3751D8E999)


def test_crc_against_zlib(spark):
    for text in ("hello", "123456789", ""):
        assert one(spark, V["crc"](F.lit(text))) == str(
            zlib.crc32(text.encode())
        )
    # a non-default algorithm, catalog check value
    assert one(spark, V["crc"](F.lit("123456789"), "CRC-16/MODBUS")) == str(0x4B37)


def test_crc_catalog_checks():
    for name, (*_params, check) in w5.CRC_CATALOG.items():
        assert w5.crc_bytes(b"123456789", name) == check, name


def test_crc_aliases_and_unknown():
    assert w5.crc_bytes(b"123456789", "CRC-32") == 0xCBF43926
    assert w5.crc_bytes(b"123456789", "CRC_32_ISO_HDLC") == 0xCBF43926
    assert w5.crc_bytes(b"123456789", "CRC-32C") == 0xE3069283
    with pytest.raises(ValueError, match="unknown algorithm"):
        w5.crc_bytes(b"x", "CRC-99/NOPE")


def test_base62_roundtrip(spark):
    for text in ("hello", "", "a", "\x00lead", "The quick brown fox"):
        assert w5.b62_decode(w5.b62_encode(text.encode())) == text.encode()
    got = one(spark, V["decode_base62"](V["encode_base62"](F.lit("hello"))))
    assert got == "hello"
    # alphabet check: integer 61 → 'z', 62 → '10'
    assert w5.b62_encode(bytes([61])) == "z"
    assert w5.b62_encode(bytes([62])) == "10"


# ---- parse_yaml ---------------------------------------------------------

def test_parse_yaml(spark):
    got = one(spark, V["parse_yaml"](F.lit("a: 1\nb:\n  - x\n  - y")))
    assert json.loads(got) == {"a": 1, "b": ["x", "y"]}
    # invalid YAML → null (fallibility signal, parse_json stance)
    assert one(spark, V["parse_yaml"](F.lit("a: [unclosed"))) is None
    # typed form
    typed = one(
        spark,
        V["parse_yaml"](F.lit("a: 7"), "struct<a:int>"),
    )
    assert typed["a"] == 7


# ---- http_request gating ------------------------------------------------

def test_http_request_gated():
    with pytest.raises(NotImplementedError, match="allow_network"):
        V["http_request"](F.lit("http://example.com"))


def test_http_request_live(spark):
    # against a local loopback server — no external network
    import http.server
    import threading

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = b'{"ok": true}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/x"
        got = one(
            spark, V["http_request"](F.lit(url), allow_network=True)
        )
        parsed = json.loads(got)
        assert parsed["status"] == 200
        assert json.loads(parsed["body"]) == {"ok": True}
    finally:
        srv.shutdown()


# ---- encrypt_ip / decrypt_ip -------------------------------------------

def test_ipcrypt_roundtrip_and_determinism(spark):
    key = "0123456789abcdef0123456789abcdef"
    for ip in ("192.168.1.10", "10.0.0.1", "2001:db8::1"):
        token = one(spark, V["encrypt_ip"](F.lit(ip), key))
        assert ":" in token  # ciphertext renders as an IPv6 address
        back = one(spark, V["decrypt_ip"](F.lit(token), key))
        assert back == ip
        # deterministic: same ip+key → same token
        assert one(spark, V["encrypt_ip"](F.lit(ip), key)) == token


def test_ipcrypt_is_aes_block(spark):
    # the spec IS "AES-128 of the 16-byte form": verify against the
    # cryptography primitive directly (independent of the UDF path)
    from cryptography.hazmat.primitives.ciphers import (
        Cipher, algorithms, modes)

    key = bytes(range(16))
    block = w5._ip_to_16("192.168.1.10")
    expect = Cipher(algorithms.AES(key), modes.ECB()).encryptor().update(block)
    got = one(spark, V["encrypt_ip"](F.lit("192.168.1.10"), key))
    import ipaddress

    assert ipaddress.IPv6Address(got).packed == expect


def test_ipcrypt_bad_key():
    with pytest.raises(ValueError, match="16 bytes"):
        w5._ipcrypt_key("short")


# ---- find → null on miss (pinned vrl main semantics) --------------------

def test_find_null_on_miss(spark):
    assert one(spark, V["find"](F.lit("abcdef"), "cd")) == 2
    assert one(spark, V["find"](F.lit("abcdef"), "zz")) is None


# ---- syntax: \u{HEX} escapes -------------------------------------------

def test_unicode_escape_decode():
    assert _unescape_str(r"hello\u{1F30E}world") == "hello\U0001f30eworld"
    assert _unescape_str(r"\u{48}\u{69}") == "Hi"
    assert _unescape_str(r"a\nb\tc") == "a\nb\tc"
    # existing escapes unchanged
    assert _unescape_str(r"q\"q") == 'q"q'
    assert _unescape_str(r"b\\s") == "b\\s"
    # unknown escapes preserved verbatim (config regex strings ride through)
    assert _unescape_str(r"\d+") == r"\d+"


@pytest.mark.parametrize(
    "bad", [r"\u{}", r"\u{zz}", r"\u{D800}", r"\u{110000}"]
)
def test_unicode_escape_invalid_is_compile_error(bad):
    with pytest.raises(VrlCompileError):
        _unescape_str(bad)


def test_unicode_escape_through_compiler(spark, events):
    assigns = compile_vrl('.tag = "ok\\u{2713}"')
    df = events.limit(1)
    for a in assigns:
        df = df.withColumn(a.out, a.expr)
    assert df.head()["tag"] == "ok✓"


# ---- syntax: else on a new line after `}` -------------------------------

def test_else_on_new_line(spark, events):
    src = '.lvl = if .value > 0.5 {\n  "high"\n}\nelse {\n  "low"\n}'
    assigns = compile_vrl(src)
    df = events.limit(5)
    for a in assigns:
        df = df.withColumn(a.out, a.expr)
    rows = df.select("value", "lvl").collect()
    for r in rows:
        assert r["lvl"] == ("high" if r["value"] > 0.5 else "low")


# ---- end-to-end through the VRL compiler --------------------------------

def test_wave5_through_compiler(spark, events):
    src = (
        '.dir = dirname("/var/log/app.log")\n'
        '.base = basename("/var/log/app.log")\n'
        '.hash = crc(.event_type)\n'
        '.enc = encode_base62(.event_type)'
    )
    assigns = compile_vrl(src)
    df = events.limit(3)
    for a in assigns:
        df = df.withColumn(a.out, a.expr)
    r = df.head()
    assert r["dir"] == "/var/log" and r["base"] == "app.log"
    assert r["hash"] == str(zlib.crc32(r["event_type"].encode()))
    assert w5.b62_decode(r["enc"]).decode() == r["event_type"]


# ---- replace_with (closure regex replace) -------------------------------

def test_replace_with_through_compiler(spark):
    from vector_spark.functions.vrl_compiler import vrl_remap

    df = spark.createDataFrame(
        [("a1 b22 c333",), ("nothing here",), ("x9",)], ["msg"])
    outs = vrl_remap(
        df,
        r""".redone = replace_with(.msg, r'([a-z])(\d+)') -> |m| """
        r"""{ upcase(m.captures[0]) + "#" }""",
    )
    got = {r["msg"]: r["redone"] for r in outs[""].collect()}
    assert got == {
        "a1 b22 c333": "A# B# C#",
        "nothing here": "nothing here",
        "x9": "X#",
    }


def test_replace_with_count_and_string_field(spark):
    from vector_spark.functions.vrl_compiler import vrl_remap

    df = spark.createDataFrame([("one 1 two 2 three 3",)], ["msg"])
    outs = vrl_remap(
        df,
        r""".r = replace_with(.msg, r'\d', 2) -> |m| { "[" + m.string + "]" }""",
    )
    assert outs[""].head()["r"] == "one [1] two [2] three 3"


def test_replace_with_requires_closure():
    with pytest.raises(ValueError, match="closure"):
        w5.replace_with(F.lit("x"), r"\d")


# ---- validate_json_schema -----------------------------------------------

def test_validate_json_schema(spark, tmp_path):
    schema = {
        "type": "object",
        "required": ["name", "age"],
        "properties": {
            "name": {"type": "string", "minLength": 1},
            "age": {"type": "integer", "minimum": 0, "maximum": 150},
            "email": {"type": "string", "format": "email"},
            "tags": {
                "type": "array", "items": {"type": "string"},
                "uniqueItems": True,
            },
            "kind": {"enum": ["a", "b"]},
        },
        "additionalProperties": False,
    }
    p = tmp_path / "s.json"
    p.write_text(json.dumps(schema))

    def check(doc):
        return one(
            spark,
            V["validate_json_schema"](F.lit(json.dumps(doc)), str(p)),
        )

    assert check({"name": "x", "age": 30}) is True
    assert check({"name": "x", "age": 30, "email": "a@b.co",
                  "tags": ["p", "q"], "kind": "a"}) is True
    assert check({"name": "x"}) is None                      # missing age
    assert check({"name": "x", "age": -1}) is None           # minimum
    assert check({"name": "x", "age": 30, "email": "bad"}) is None
    assert check({"name": "x", "age": 30, "tags": ["p", "p"]}) is None
    assert check({"name": "x", "age": 30, "kind": "z"}) is None
    assert check({"name": "x", "age": 30, "extra": 1}) is None  # addl=False
    # not JSON at all → null (fallibility)
    assert one(
        spark, V["validate_json_schema"](F.lit("{nope"), str(p))
    ) is None


def test_validate_json_schema_ref_and_combinators(spark, tmp_path):
    schema = {
        "$defs": {"pos": {"type": "number", "exclusiveMinimum": 0}},
        "type": "object",
        "properties": {
            "w": {"$ref": "#/$defs/pos"},
            "v": {"oneOf": [{"type": "string"}, {"type": "integer"}]},
            "n": {"not": {"type": "null"}},
        },
    }
    p = tmp_path / "s2.json"
    p.write_text(json.dumps(schema))

    def check(doc):
        return one(
            spark,
            V["validate_json_schema"](F.lit(json.dumps(doc)), str(p)),
        )

    assert check({"w": 1.5, "v": "s", "n": 1}) is True
    assert check({"w": 0}) is None          # exclusiveMinimum via $ref
    assert check({"v": 1.5}) is None        # oneOf: neither branch
    assert check({"n": None}) is None       # not null


def test_js_valid_unit():
    # pure evaluator edge cases, no Spark
    assert w5._js_valid(3, {"type": "number"}, {}, False)
    assert w5._js_valid(3.0, {"type": "integer"}, {}, False)  # 3.0 ≡ 3
    assert not w5._js_valid(3.5, {"type": "integer"}, {}, False)
    assert w5._js_valid("x", True, {}, False)
    assert not w5._js_valid("x", False, {}, False)
    assert w5._js_valid(9, {"multipleOf": 3}, {}, False)
    assert not w5._js_valid(10, {"multipleOf": 3}, {}, False)
    # unknown format: fails strict, passes with ignore_unknown_formats
    assert not w5._js_valid("z", {"format": "zzz"}, {}, False)
    assert w5._js_valid("z", {"format": "zzz"}, {}, True)


# ---- for_each (accumulation form) ---------------------------------------

def test_for_each_object_accumulation(spark):
    from vector_spark.functions.vrl_compiler import vrl_remap

    df = spark.createDataFrame([("a=1 b=2 c=3",), ("x=10",)], ["msg"])
    prog = (
        "tags = parse_key_value(.msg)\n"
        "count = 0\n"
        "total = 0\n"
        "for_each(tags) -> |k, v| { count = count + 1 }\n"
        "for_each(tags) -> |k, v| { total = total + to_int(v) ?? 0 }\n"
        ".n = count\n"
        ".sum = total"
    )
    got = {r["msg"]: (r["n"], r["sum"])
           for r in vrl_remap(df, prog)[""].collect()}
    assert got == {"a=1 b=2 c=3": (3, 6), "x=10": (1, 10)}


def test_for_each_array_index_value(spark):
    from vector_spark.functions.vrl_compiler import vrl_remap

    df = spark.createDataFrame([([10, 20, 30],)], ["arr"])
    prog = (
        "s = 0\n"
        "wi = 0\n"
        "for_each(.arr) -> |i, v| { s = s + v }\n"
        "for_each(.arr) -> |i, v| { wi = wi + i * v }\n"
        ".sum = s\n.weighted = wi"
    )
    r = vrl_remap(df, prog)[""].head()
    assert r["sum"] == 60
    assert r["weighted"] == 0 * 10 + 1 * 20 + 2 * 30


def test_for_each_requires_existing_accumulator(spark):
    from vector_spark.functions.vrl_compiler import (
        VrlCompileError, compile_vrl)

    with pytest.raises(VrlCompileError, match="existing program variable"):
        compile_vrl(
            'for_each(.tags) -> |k, v| { fresh = 1 }'
        )


# ---- enrichment: date-range conditions + wildcard -----------------------

def test_enrichment_date_range_conditions(spark):
    import datetime as dt

    from vector_spark.functions.vrl_compiler import vrl_remap

    table = spark.createDataFrame(
        [("alice", "gold", dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 30)),
         ("alice", "plat", dt.datetime(2024, 7, 1), dt.datetime(2024, 12, 31)),
         ("bob", "free", dt.datetime(2024, 1, 1), dt.datetime(2024, 12, 31))],
        ["user", "plan", "valid_from", "valid_to"])
    ev = spark.createDataFrame(
        [("alice", dt.datetime(2024, 3, 15)),
         ("alice", dt.datetime(2024, 8, 1)),
         ("alice", dt.datetime(2024, 6, 30)),   # boundary: inclusive
         ("bob", dt.datetime(2024, 5, 5)),
         ("carol", dt.datetime(2024, 5, 5))],
        ["user", "ts"])
    prog = (
        'r = get_enrichment_table_record!("plans", {"user": .user, '
        '"valid_from": {"to": .ts}, "valid_to": {"from": .ts}})\n'
        ".plan = r.plan"
    )
    out = vrl_remap(ev, prog, enrichment_tables={"plans": table})
    got = {(r["user"], str(r["ts"])): r["plan"] for r in out[""].collect()}
    assert got[("alice", "2024-03-15 00:00:00")] == "gold"
    assert got[("alice", "2024-08-01 00:00:00")] == "plat"
    assert got[("alice", "2024-06-30 00:00:00")] == "gold"  # <= to: inclusive
    assert got[("bob", "2024-05-05 00:00:00")] == "free"
    assert got[("carol", "2024-05-05 00:00:00")] is None


def test_enrichment_find_with_date_range(spark):
    import datetime as dt

    from vector_spark.functions.vrl_compiler import vrl_remap

    table = spark.createDataFrame(
        [("p", "r1", dt.datetime(2024, 1, 1)),
         ("p", "r2", dt.datetime(2024, 2, 1)),
         ("p", "r3", dt.datetime(2024, 9, 1))],
        ["k", "val", "d"])
    ev = spark.createDataFrame([("p", dt.datetime(2024, 6, 1))], ["k", "ts"])
    prog = (
        '.rs = find_enrichment_table_records!("t", {"k": .k, '
        '"d": {"to": .ts}})'
    )
    out = vrl_remap(ev, prog, enrichment_tables={"t": table})
    rows = out[""].head()["rs"]
    assert [r["val"] for r in rows] == ["r1", "r2"]  # at or before ts


def test_enrichment_wildcard_row_fallback(spark):
    from vector_spark.functions.vrl_compiler import vrl_remap

    wtab = spark.createDataFrame(
        [("alice", "A"), ("*", "DEFAULT")], ["user", "grade"])
    ev = spark.createDataFrame(
        [("alice",), ("bob",), ("carol",)], ["user"])
    prog = (
        'r = get_enrichment_table_record("users", {"user": .user}, '
        'wildcard: "*")\n'
        ".grade = r.grade"
    )
    out = vrl_remap(ev, prog, enrichment_tables={"users": wtab})
    got = {r["user"]: r["grade"] for r in out[""].collect()}
    assert got == {"alice": "A", "bob": "DEFAULT", "carol": "DEFAULT"}


def test_enrich_operator_bounds_and_wildcard(spark):
    import datetime as dt

    from vector_spark.operators.enrich import enrich

    t = spark.createDataFrame(
        [("x", dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 30), "in"),
         ("*", dt.datetime(2024, 1, 1), dt.datetime(2024, 12, 31), "any")],
        ["k", "f", "to", "v"])
    ev = spark.createDataFrame(
        [("x", dt.datetime(2024, 6, 30)), ("y", dt.datetime(2024, 3, 1))],
        ["k", "ts"])
    # BetweenDates is inclusive both ends (file.rs:349-353)
    out = enrich(ev, t, on=[("k", "k")], date_between=("ts", "f", "to"),
                 wildcard="*")
    got = sorted((r["k"], r["v"]) for r in out.collect())
    assert ("x", "in") in got       # boundary day matched (inclusive)
    assert ("y", "any") in got      # wildcard row matched the unknown key
