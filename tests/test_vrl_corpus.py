"""Reference behavior corpus → vrl_transform.

Programs adapted from vector's own behavior suite
(`tests/behavior/transforms/remap.yaml` — test names cited per case) run
through the VRL→Column compiler (`vrl_remap`), asserting the corpus's
expected outputs. Documented deltas from the reference noted inline.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.functions.vrl_compiler import VrlCompileError, vrl_remap


@pytest.fixture(scope="module")
def one(spark):
    """Single-row frame covering the corpus inputs."""
    return spark.createDataFrame(
        [
            (
                "FOO",            # up_a
                "foo",            # low_a
                "foobar",         # foobar
                "foo",            # foo
                "bar",            # bar
                10.0, 2.0, 5.0, 4.0,   # a b c d
                "42",             # int_str
                "3.7",            # float_str
                "true",           # bool_str
                "192.168.10.23",  # ip
                "2.234",          # num (precision cases)
                "100ms",          # dur
                "one \"two three\" [four five]",  # tokens
                "http://example.com/p?q=1",       # url
                '2019-05-23T13:42:50Z INFO rest of the message',  # grokmsg
                [1, 2, 3],        # arr
                "x=1 y=2",        # kv
            )
        ],
        "up_a string, low_a string, foobar string, foo string, bar string, "
        "a double, b double, c double, d double, int_str string, "
        "float_str string, bool_str string, ip string, num string, "
        "dur string, tokens string, url string, grokmsg string, "
        "arr array<int>, kv string",
    )


def run(df, src, **kw):
    return vrl_remap(df, src, **kw)[""].collect()[0]


# remap.yaml `remap_source`
def test_simple_assignment(one):
    assert run(one, '.message = "foo"').message == "foo"


# remap.yaml `remap_nested` — nested targets are real struct mutation
# (round-2 close of the flat-envelope delta): a fresh root materializes
# a struct, an existing struct root mutates in place via withField
def test_nested_assignment_builds_structs(one):
    # fresh roots (the fixture's scalar `.a` keeps its flat escape hatch)
    row = run(one, ".n1.b = 123\n.n2.y = 456")
    assert row["n1"]["b"] == 123 and row["n2"]["y"] == 456


def test_nested_del_drops_struct_field(one):
    row = run(one, ".n.b = 1\n.n.keep = 2\ndel(.n.b)")
    assert "b" not in row["n"].asDict() and row["n"]["keep"] == 2


# remap.yaml `remap_arithmetic`
def test_arithmetic_err_form(one):
    row = run(
        one,
        ".result_a, err = .a * .b + .c - .d\n"
        ".result_b, err = .a * (.b + .c) - .d\n"
        ".result_c, err = .a + .b * .c / .d\n"
        ".result_d, err = (.a + .b) * (.c / .d)\n",
    )
    assert row.result_a == 10 * 2 + 5 - 4
    assert row.result_b == 10 * (2 + 5) - 4
    assert row.result_c == 10 + 2 * 5 / 4
    assert row.result_d == (10 + 2) * (5 / 4)


# remap.yaml `remap_boolean_arithmetic`
def test_boolean_arithmetic(one):
    row = run(
        one,
        ".ra, err = .a + .b > 9\n.rb, err = .a * .b < 20\n.rc, err = 1 >= .a / .b",
    )
    assert row.ra is True and row.rb is False and row.rc is False


# remap.yaml `remap_coercion`
def test_coercions(one):
    row = run(
        one,
        ".i2 = to_int!(.int_str)\n.f2 = to_float!(.float_str)\n"
        ".b2 = to_bool!(.bool_str)\n.s2 = to_string(.a)",
    )
    assert row.i2 == 42 and row.f2 == 3.7 and row.b2 is True and row.s2 == "10.0"


# remap.yaml `remap_error_coalesce_operator` (to_int stand-in for
# parse_json: ?? catches the handled error → fallback value)
def test_error_coalesce(one):
    row = run(one, '.val1 = to_string(to_int(.foo) ?? 0)\n.val2 = to_int(.int_str) ?? 0')
    assert row.val1 == "0" and row.val2 == 42


# remap.yaml `remap_abort` — abort discards ALL changes, event forwards
def test_abort_forwards_unchanged(one):
    outs = vrl_remap(one, ".foo = false\nabort\n.bar = false", drop_on_abort=False)
    row = outs[""].collect()[0]
    assert row.foo == "foo" and row.bar == "bar"


# remap.yaml `remap_abort_drop_on_abort`
def test_abort_drops(one):
    outs = vrl_remap(one, ".foo = false\nabort", drop_on_abort=True)
    assert outs[""].count() == 0


# remap.yaml `remap_function_upcase` (if-expression over a call)
def test_upcase_with_if(one):
    row = run(
        one,
        '.u = upcase(string!(.low_a))\n'
        '.f = if upcase(string!(.foo)) == "FOO" { "ff" } else { .foo }',
    )
    assert row.u == "FOO" and row.f == "ff"


# remap.yaml `remap_function_md5` / `remap_function_sha1`
def test_md5_sha1(one):
    row = run(one, ".h1 = md5(string!(.bar))\n.h2 = sha1(string!(.bar))")
    assert row.h1 == "37b51d194a7513e45b56f6524f2d51f2"
    assert row.h2 == "62cdb7020ff920e5aa642c3d4066950dd1f01f4d"


# remap.yaml `remap_function_contains` (case_sensitive named arg)
def test_contains_case_sensitivity(one):
    row = run(
        one,
        '.r1 = contains(string!(.bar), substring: "BAR", case_sensitive: true)\n'
        '.r2 = contains(string!(.bar), substring: "BAR", case_sensitive: false)\n'
        '.r3 = contains(string!(.foobar), substring: "oba")',
    )
    assert row.r1 is False and row.r2 is True and row.r3 is True


# remap.yaml `remap_function_starts_with` / `remap_function_ends_with`
def test_starts_ends_with(one):
    row = run(
        one,
        '.a1 = starts_with(string!(.foobar), substring: "foo")\n'
        '.a2 = starts_with(string!(.foobar), substring: "FOO", case_sensitive: false)\n'
        '.a3 = ends_with!(.foobar, substring: "bar")\n'
        '.a4 = ends_with!(.foobar, substring: "BAR", case_sensitive: true)',
    )
    assert row.a1 is True and row.a2 is True and row.a3 is True and row.a4 is False


# remap.yaml `remap_function_slice` (negative indices)
def test_slice(one):
    row = run(
        one,
        ".s1 = slice!(string!(.foo) + string!(.bar), 1)\n"
        ".s2 = slice!(string!(.foo) + string!(.bar), 0, 1)\n"
        ".s3 = slice!(string!(.foo) + string!(.bar), start: -2)\n"
        ".s4 = slice!(string!(.foo) + string!(.bar), start: 1, end: -1)",
    )
    assert row.s1 == "oobar" and row.s2 == "f" and row.s3 == "ar" and row.s4 == "ooba"


# remap.yaml `remap_function_truncate`
def test_truncate_suffix(one):
    row = run(
        one,
        '.t1 = truncate("foobar", limit: 3)\n'
        '.t2 = truncate("foobar", limit: 4, suffix: "...")\n'
        '.t3 = truncate("foo", limit: 5, suffix: "...")',
    )
    assert row.t1 == "foo" and row.t2 == "foob..." and row.t3 == "foo"


# remap.yaml `remap_function_split_string` / `remap_function_split_regex`
def test_split_limit_and_regex(one):
    row = run(
        one,
        '.p = split!("foo bar baz qux", " ", 3)\n'
        ".r = split!(\"fooAxBbar\", r'(?i)a.b', 2)",
    )
    assert row.p == ["foo", "bar", "baz qux"]
    assert row.r == ["foo", "bar"]


# remap.yaml `remap_function_parse_duration`
def test_parse_duration_units(one):
    row = run(
        one,
        '.ms = parse_duration!(.dur, "ms")\n.s = parse_duration!("100ms", unit: "s")',
    )
    assert row.ms == 100.0 and row.s == pytest.approx(0.1)


# remap.yaml `remap_function_round` / `_ceil` / `_floor` (precision:)
def test_round_ceil_floor_precision(one):
    row = run(
        one,
        ".r = round!(to_float!(.num), precision: 2)\n"
        ".c = ceil!(to_float!(.num), precision: 2)\n"
        ".f = floor!(to_float!(.num), precision: 2)",
    )
    assert row.r == 2.23 and row.c == 2.24 and row.f == 2.23


# remap.yaml `remap_function_format_number`
def test_format_number(one):
    row = run(
        one,
        '.n = format_number!(1234567.89, scale: 2, decimal_separator: ",", '
        'grouping_separator: ".")',
    )
    assert row.n == "1.234.567,89"


# remap.yaml `remap_function_ip_subnet`
def test_ip_subnet(one):
    row = run(
        one,
        '.m16 = ip_subnet!(.ip, "255.255.0.0")\n.m8 = ip_subnet!(.ip, "/8")',
    )
    assert row.m16 == "192.168.0.0" and row.m8 == "192.0.0.0"


# remap.yaml `remap_function_ip_cidr_contains`
def test_ip_cidr_contains(one):
    row = run(
        one,
        '.yes = ip_cidr_contains!(cidr: "192.168.0.0/16", value: .ip)\n'
        '.no = ip_cidr_contains!("10.0.0.0/8", .ip)',
    )
    assert row.yes is True and row.no is False


def test_ipv6_column_paths_vs_stdlib(spark):
    """IPv6 two-long Column form (parse -> shifts -> render) pinned
    against the stdlib ipaddress module on 60 random + edge addresses."""
    import ipaddress
    import random

    from vector_spark.functions.vrl import ip_cidr_contains, ip_subnet

    rng = random.Random(7)
    addrs = [str(ipaddress.IPv6Address(rng.getrandbits(128))) for _ in range(60)]
    addrs += [
        "::", "::1", "ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff",
        "::ffff:192.168.1.7", "2404:6800:4003:c02::64",
        "1:0:0:1:0:0:0:1", "2001:db8:0:0:1:0:0:1",
    ]
    df = spark.createDataFrame([(a,) for a in addrs], "ip string")
    for cidr in ["2404:6800:4003:c02::/64", "::/0", "ff00::/8",
                 "::ffff:192.168.0.0/112", "2404::/15", "abcd::/128"]:
        got = {
            r.ip: r.c
            for r in df.select(
                "ip", ip_cidr_contains(cidr, F.col("ip")).alias("c")
            ).collect()
        }
        net = ipaddress.ip_network(cidr)
        for a in addrs:
            assert got[a] == (ipaddress.ip_address(a) in net), (cidr, a)
    for mask in ["/64", "/0", "/128", "/37", "ffff:ffff::"]:
        got = {
            r.ip: r.s
            for r in df.select(
                "ip", ip_subnet(F.col("ip"), mask).alias("s")
            ).collect()
        }
        bits = (
            mask.lstrip("/")
            if mask.startswith("/")
            else bin(int(ipaddress.IPv6Address(mask))).count("1")
        )
        for a in addrs:
            want = str(
                ipaddress.ip_interface(f"{a}/{bits}").network.network_address
            )
            assert got[a] == want, (mask, a, got[a], want)
    # mixed families: false, never an error
    df3 = spark.createDataFrame([("10.1.2.3",), ("2404::1",)], "ip string")
    got = [
        (r.c4, r.c6)
        for r in df3.select(
            ip_cidr_contains("10.0.0.0/8", F.col("ip")).alias("c4"),
            ip_cidr_contains("2404::/16", F.col("ip")).alias("c6"),
        ).collect()
    ]
    assert got == [(True, False), (False, True)]


# remap.yaml `remap_function_ip_to_ipv6` / `remap_function_ipv6_to_ipv4`
def test_ip_v6_mapping(one):
    row = run(
        one,
        '.v6 = ip_to_ipv6!(.ip)\n.v4 = ipv6_to_ipv4!("::ffff:192.168.10.2")',
    )
    assert row.v6 == "::ffff:192.168.10.23" and row.v4 == "192.168.10.2"


# remap.yaml `remap_function_exists` (array-index paths)
def test_exists_with_index(one):
    row = run(one, ".e1 = exists(.arr[2])\n.e2 = exists(.arr[3])")
    assert row.e1 is True and row.e2 is False


# remap.yaml `remap_function_parse_grok`
def test_parse_grok(one):
    row = run(
        one,
        '.g = parse_grok!(.grokmsg, '
        '"%{TIMESTAMP_ISO8601:timestamp} %{LOGLEVEL:level} %{GREEDYDATA:message}")',
    )
    assert row.g.level == "INFO" and row.g.message == "rest of the message"
    assert row.g.timestamp.startswith("2019-05-23")


# remap.yaml `remap_function_parse_tokens`
def test_parse_tokens(one):
    # reference token forms (remap_function_parse_tokens): quoted and
    # bracketed groups keep their content, delimiters STRIPPED
    row = run(one, ".tk = parse_tokens(.tokens)")
    assert row.tk == ["one", "two three", "four five"]


# remap.yaml `remap_function_parse_url`
def test_parse_url_struct(one):
    row = run(one, ".parts = parse_url!(.url)")
    assert row.parts.host == "example.com" and row.parts.path == "/p"
    assert row.parts.query == {"q": "1"}  # reference: query is an object
    assert row.parts.username == "" and row.parts.port is None


# remap.yaml `remap_function_assert_pass` / `_fail`
def test_assert(one):
    ok = vrl_remap(one, '.c = "checked"\nassert!(.a > 5, message: "nope")',
                   drop_on_error=True)[""]
    assert ok.count() == 1
    bad = vrl_remap(one, 'assert!(.a > 100, message: "nope")\n.c = "x"',
                    drop_on_error=True)[""]
    assert bad.count() == 0


# remap.yaml `remap_function_uuid_v4`
def test_uuid_v4(one):
    row = run(one, ".u = uuid_v4()")
    assert len(row.u) == 36 and row.u.count("-") == 4


# remap.yaml `remap_function_merge` — DELTA: shallow map merge (deep: is
# accepted for maps of scalars only)
def test_merge_maps(one):
    row = run(
        one,
        '.m = merge(parse_key_value(.kv), parse_key_value("z=3"))',
    )
    assert dict(row.m) == {"x": "1", "y": "2", "z": "3"}


# VERDICT ask: closures via Spark higher-order functions
def test_map_each_closure(one):
    row = run(one, ".doubled = map_each(.arr) -> |v| { v * 2 }")
    assert row.doubled == [2, 4, 6]


def test_filter_closure(one):
    row = run(one, ".big = filter(.arr) -> |v| { v >= 2 }")
    assert row.big == [2, 3]


# VERDICT ask: metadata paths (%... → _meta_* envelope columns)
def test_metadata_paths(one):
    row = run(one, '%source_type = "corpus"\n.st = %source_type')
    assert row._meta_source_type == "corpus" and row.st == "corpus"


# VERDICT ask: program variables + array/object literals
def test_variables_and_literals(one):
    row = run(
        one,
        'threshold = 5\n'
        '.flag = .a > threshold\n'
        '.obj = { "name": .foo, "n": 1 }\n'
        '.list = [1, 2, 3]',
    )
    assert row.flag is True and row.obj.name == "foo" and row.list == [1, 2, 3]


def test_undefined_variable_is_compile_error(one):
    with pytest.raises(VrlCompileError, match="undefined variable"):
        vrl_remap(one, ".x = nope + 1")


def test_unknown_function_is_compile_error(one):
    with pytest.raises(VrlCompileError, match="unknown function"):
        vrl_remap(one, ".x = definitely_not_a_function(.a)")


# wave-2 stdlib (vrl stdlib categories Codec/Parse/String/Map)
def test_wave2_stdlib(one, spark):
    df = spark.createDataFrame(
        [(
            '1.2.3.4 - alice [05/Mar/2024:06:07:08 +0000] "GET /x HTTP/1.1" '
            '200 512 "-" "curl/8"',
            "2 123456789010 eni-1235b8ca 172.31.16.139 172.31.16.21 20641 22 "
            "6 20 4249 1418530010 1418530070 ACCEPT OK",
            "CEF:0|Sec|threatmanager|1.0|100|worm stopped|10|src=10.0.0.1",
            "1.5KiB",
        )],
        "nginx string, vpc string, cef string, sz string",
    )
    row = run(
        df,
        '.ng = parse_nginx_log!(.nginx)\n'
        '.flow = parse_aws_vpc_flow_log!(.vpc)\n'
        '.cf = parse_cef!(.cef)\n'
        '.kb = parse_bytes!(.sz, unit: "kB")\n'
        '.sev = to_syslog_severity!("error")\n'
        '.hx = encode_hex("abc")\n'
        '.rt = decode_hex(encode_hex("roundtrip"))\n'
        '.tly = tally(split("a,b,a,a", ","))\n'
        '.fnd = find("abc", "bc")',
    )
    assert row.ng.method == "GET" and row.ng.status == 200
    assert row.flow.dstport == 22 and row.flow.action == "ACCEPT"
    assert row.cf.device_vendor == "Sec" and row.cf.severity == "10"
    assert row.kb == pytest.approx(1.536)
    assert row.sev == 3 and row.hx == "616263" and row.rt == "roundtrip"
    assert dict(row.tly) == {"a": 3, "b": 1} and row.fnd == 1
