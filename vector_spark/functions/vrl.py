"""VRL stdlib subset → Spark Column expressions.

VRL (Vector Remap Language, crate v0.34.0) is the reference's per-event
expression language (vector `src/transforms/remap.rs`,
`website/cue/reference/remap/functions.cue:30-53` lists 22 categories).
We compile the commonly-used surface to native Catalyst expressions —
JVM-side, codegen'd, pushdown-friendly. Row-at-a-time interpretation is
deliberately NOT replicated (SURVEY §1.6 row-vs-column note).

Fallibility: VRL's `!` functions abort on error; the `, err` form captures
it. Spark analog: expressions return NULL on failure; ``fallible`` wraps a
column to also emit an `_error` flag so remap's drop_on_error /
reroute_dropped semantics (`remap.rs:121-155`) can split the stream.
"""

from __future__ import annotations

from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql import Column
from pyspark.sql import functions as F


def fallible(col: Column, source: Column) -> tuple[Column, Column]:
    """Return (value, error_flag): error when source was non-null but the
    expression produced null (the VRL `, err` convention)."""
    return col, source.isNotNull() & col.isNull()


# ---- Parse ------------------------------------------------------------
def parse_json(c: Column, schema: str | None = None) -> Column:
    """VRL parse_json!: with a schema -> typed struct. Schema-less: the
    JSON text passes through VALIDATED (invalid JSON -> null, the
    fallibility signal — corpus remap_bang_function pins this); nested
    access into a schema-less result needs get_json_object / a schema,
    documented delta."""
    if schema:
        return F.from_json(c, schema)
    return F.when(F.try_parse_json(c).isNotNull(), c)


def parse_key_value(
    c: Column,
    pair_sep: str = " ",
    kv_sep: str = "=",
    key_value_delimiter: str | None = None,
    field_delimiter: str | None = None,
) -> Column:
    """VRL parse_key_value (logfmt): string -> map<string,string>.
    Accepts the VRL named-arg forms (key_value_delimiter /
    field_delimiter); double-quoted values are unwrapped (the VRL
    parser's quoting contract — a quoted value may contain the field
    delimiter)."""
    kv = key_value_delimiter or kv_sep
    fs = field_delimiter or pair_sep
    import re as _re

    # tokenize pairs with quote-awareness: value = quoted string or a
    # run without the field delimiter; then build the map from the
    # extracted key/value arrays — all Column-side
    pat = (
        _re.escape(kv).join(
            [r"([^" + _re.escape(fs + kv) + r"]+)",
             r'("(?:[^"\\]|\\.)*"|[^' + _re.escape(fs) + r"]*)"]
        )
    )
    pairs = F.regexp_extract_all(c, F.lit(f"(?:{pat})"), 0)
    keys = F.transform(
        pairs, lambda p: F.regexp_extract(p, f"^(.*?){_re.escape(kv)}", 1)
    )
    vals = F.transform(
        pairs,
        lambda p: F.regexp_replace(
            F.regexp_extract(p, f"{_re.escape(kv)}(.*)$", 1),
            r'^"(.*)"$',
            "$1",
        ),
    )
    return F.map_from_arrays(keys, vals)


def parse_regex(c: Column, pattern: str, group: int = 1, **kw) -> Column:
    """VRL parse_regex: with (?P<name>...) groups → struct of named
    captures (the VRL object result); otherwise one indexed group."""
    import re as _re

    names = _re.findall(r"\(\?P<(\w+)>", str(pattern))
    if not names:
        return F.regexp_extract(c, pattern, group)
    java = _re.sub(r"\(\?P<\w+>", "(", str(pattern))
    fields = [
        F.regexp_extract(c, java, i + 1).alias(n)
        for i, n in enumerate(names)
    ]
    if kw.get("numeric_groups"):
        # VRL numeric_groups: true adds the positional captures; "0" is
        # the full match
        fields = [F.regexp_extract(c, java, 0).alias("0")] + fields + [
            F.regexp_extract(c, java, i + 1).alias(str(i + 1))
            for i in range(len(names))
        ]
    # VRL parse_regex ERRORS on no-match (it doesn't hand back empty
    # captures) — null result feeds the compiler's input-present/
    # result-null fallibility flag. rlike is an unanchored find, the
    # same match semantics regexp_extract uses.
    return F.when(c.rlike(java), F.struct(*fields))


# Default zone for timestamp conversions whose input has no explicit
# zone — the global/remap `timezone` option (global_options.rs:100-109,
# remap.rs:105-114). Set at COMPILE time (Columns are built driver-side,
# so the zone bakes into the expression); None = session default (UTC).
_DEFAULT_TZ: str | None = None

_TZ_DIRECTIVES = ("%z", "%:z", "%::z", "%:::z", "%#z", "%Z", "%+", "%s")


@contextmanager
def default_timezone(tz: str | None):
    """Scope a default zone over VRL compilation (the loader wraps
    remap compiles in this when `timezone:` is configured)."""
    global _DEFAULT_TZ
    prev = _DEFAULT_TZ
    _DEFAULT_TZ = tz
    try:
        yield
    finally:
        _DEFAULT_TZ = prev


def parse_timestamp(c: Column, fmt: str) -> Column:
    """VRL parse_timestamp: chrono strftime format, FALLIBLE — bad input
    yields null (the `, err` machinery's error state), never a thrown
    ANSI DateTimeException mid-job.

    When a default `timezone` is in scope (global or remap-level option)
    and the format carries NO zone directive, the naive wall time is
    interpreted in that zone and converted to UTC — the reference's
    TimeZone behavior (all timestamps represented in UTC,
    global_options.rs:100-109)."""
    if fmt == "%s":  # chrono: unix epoch seconds
        return F.timestamp_seconds(c.cast("long"))
    if fmt == "%+":  # RFC3339, offset/fraction variants
        # dispatch on the fraction LENGTH instead of coalescing through
        # failing parses (a failing try_to_timestamp pays Spark's
        # exception path): each row attempts 1 format, 2 worst-case.
        # Spark's S-run parses UP TO that many fraction digits (".00"
        # parses with SSS, ".12345" needs SSSSSS — probed empirically),
        # so the buckets are 1-3 and 4-6 digits. Same accepted inputs
        # as the former 6-format chain (XXX parses a literal Z; the
        # 'Z'-literal forms stay as each bucket's fallback arm).
        frac_len = F.length(F.regexp_extract(c, r"\.(\d+)", 1))
        return (
            F.when(frac_len == 0, F.coalesce(
                F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
                F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
            ))
            .when(frac_len <= 3, F.coalesce(
                F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
                F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")),
            ))
            .otherwise(F.coalesce(
                F.try_to_timestamp(
                    c, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
                F.try_to_timestamp(
                    c, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")),
            ))
        )
    parsed = F.try_to_timestamp(c, F.lit(_strf(fmt)))
    if _DEFAULT_TZ and not any(d in fmt for d in _TZ_DIRECTIVES):
        return F.to_utc_timestamp(parsed, _DEFAULT_TZ)
    return parsed


_DUR_UNIT_MS = {"ns": 1e-6, "us": 1e-3, "ms": 1.0, "s": 1e3, "m": 60e3, "h": 3600e3}


def parse_duration_ms(c: Column, unit: str = "ms") -> Column:
    """VRL parse_duration(value, unit:) for '<num><unit>' strings — result
    expressed in the requested output unit (corpus:
    parse_duration!("100ms", unit: "s") == 0.1)."""
    num = F.regexp_extract(c, r"^([0-9.]+)", 1).cast("double")
    u = F.regexp_extract(c, r"([a-z]+)$", 1)
    factor = (
        F.when(u == "ns", 1e-6)
        .when(u == "us", 1e-3)
        .when(u == "ms", 1.0)
        .when(u == "s", 1e3)
        .when(u == "m", 60e3)
        .when(u == "h", 3600e3)
        .otherwise(F.lit(None))
    )
    if unit not in _DUR_UNIT_MS:
        raise ValueError(f"parse_duration: unknown unit {unit!r}")
    return num * factor / F.lit(_DUR_UNIT_MS[unit])


# Apache common log: host ident user [ts] "method path proto" status size
APACHE_COMMON_RE = r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) (\S+)" (\d+) (\d+)'
# RFC3164-ish syslog: <pri>Mon dd hh:mm:ss host tag: msg
SYSLOG_RE = r"^<(\d+)>(\w{3}\s+\d+\s[\d:]+)\s(\S+)\s([^:\[]+)(?:\[(\d+)\])?:\s*(.*)$"


def parse_apache_log(c: Column) -> Column:
    """VRL parse_apache_log('common') → struct of typed fields."""
    return F.struct(
        F.regexp_extract(c, APACHE_COMMON_RE, 1).alias("host"),
        F.regexp_extract(c, APACHE_COMMON_RE, 5).alias("method"),
        F.regexp_extract(c, APACHE_COMMON_RE, 6).alias("path"),
        F.regexp_extract(c, APACHE_COMMON_RE, 8).cast("int").alias("status"),
        F.regexp_extract(c, APACHE_COMMON_RE, 9).cast("long").alias("size"),
    )


# RFC5424: <pri>VERSION TIMESTAMP HOST APP PROCID MSGID SD MSG
SYSLOG5424_RE = (
    r"^<(\d+)>\d+\s(\S+)\s(\S+)\s(\S+)\s(\S+)\s(\S+)\s"
    r"(?:(?:\[.*?\])+|-)\s*(.*)$"
)
_SYSLOG_FACILITY_NAMES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]
_SYSLOG_SEVERITY_NAMES = [
    "emerg", "alert", "crit", "err", "warning", "notice", "info", "debug",
]


def parse_syslog(c: Column) -> Column:
    """VRL parse_syslog → struct with NAME-coded facility/severity (the
    reference contract, corpus remap_function_parse_syslog), RFC5424 and
    RFC3164 auto-detected; 5424 carries a typed timestamp, procid, and
    msgid; appname is the APP-NAME token verbatim."""
    is5 = c.rlike(r"^<\d+>\d+\s")
    g5 = lambda i: F.regexp_extract(c, SYSLOG5424_RE, i)  # noqa: E731
    g3 = lambda i: F.regexp_extract(c, SYSLOG_RE, i)  # noqa: E731
    pri = F.when(is5, g5(1)).otherwise(g3(1)).cast("int")
    facility = F.try_element_at(
        F.array(*[F.lit(n) for n in _SYSLOG_FACILITY_NAMES]),
        (F.floor(pri / 8) + 1).cast("int"),
    )
    severity = F.try_element_at(
        F.array(*[F.lit(n) for n in _SYSLOG_SEVERITY_NAMES]),
        (F.pmod(pri, F.lit(8)) + 1).cast("int"),
    )
    # dispatch on the fraction dot instead of coalescing over a failing
    # parse: a FAILING try_to_timestamp pays Spark's exception path
    # (~2.3x a succeeding one), and fraction-less 5424 stamps would pay
    # it on every row
    ts5 = F.when(
        g5(2).contains("."),
        F.try_to_timestamp(g5(2), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
    ).otherwise(
        F.try_to_timestamp(g5(2), F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
    )
    procid_raw = F.when(is5, g5(5)).otherwise(g3(5))
    return F.struct(
        facility.alias("facility"),
        severity.alias("severity"),
        F.when(is5, ts5).alias("timestamp"),
        F.when(is5, g5(3)).otherwise(g3(3)).alias("hostname"),
        F.when(is5, g5(4)).otherwise(F.trim(g3(4))).alias("appname"),
        # "" (pid-less 3164 line) must not take the failing-cast path
        F.when(procid_raw != "", procid_raw.try_cast("long"))
        .alias("procid"),
        F.when(is5, F.nullif(g5(6), F.lit("-"))).alias("msgid"),
        F.when(is5, g5(7)).otherwise(g3(6)).alias("message"),
    )


# ---- additions prioritized by the reference's own behavior corpus ------
# (tests/behavior/transforms/remap.yaml, benches/remap.rs:111-175)

def _ci(c: Column, case_sensitive: bool) -> Column:
    return c if case_sensitive else F.lower(c)


def _contains(c: Column, substring, case_sensitive: bool = True) -> Column:
    sub = substring if isinstance(substring, Column) else F.lit(substring)
    return _ci(c, case_sensitive).contains(_ci(sub, case_sensitive))


def _starts_with(c: Column, substring, case_sensitive: bool = True) -> Column:
    sub = substring if isinstance(substring, Column) else F.lit(substring)
    return _ci(c, case_sensitive).startswith(_ci(sub, case_sensitive))


def _ends_with(c: Column, substring, case_sensitive: bool = True) -> Column:
    sub = substring if isinstance(substring, Column) else F.lit(substring)
    return _ci(c, case_sensitive).endswith(_ci(sub, case_sensitive))


def _slice(c: Column, start: int = 0, end: int | None = None) -> Column:
    """VRL slice with negative-index support (python-style), on strings."""
    s = c.cast("string")
    n = F.length(s)
    st = F.lit(start) if start >= 0 else F.greatest(n + start, F.lit(0))
    en = n if end is None else (F.lit(end) if end >= 0 else n + end)
    return F.substring(s, (st + 1).cast("int"), (en - st).cast("int"))


def _truncate(c: Column, limit: int, suffix: str | None = None) -> Column:
    """VRL truncate(limit, suffix:) — suffix appended only when cut."""
    cut = F.substring(c, 1, limit)
    if suffix is None:
        return cut
    return F.when(F.length(c) > limit, F.concat(cut, F.lit(suffix))).otherwise(c)


def _split(c: Column, pattern, limit: int = -1) -> Column:
    pat = pattern if isinstance(pattern, str) else pattern
    return F.split(c, pat, limit)


def _round_p(c: Column, precision: int = 0) -> Column:
    return F.round(c, precision)


def _ceil_p(c: Column, precision: int = 0) -> Column:
    if precision == 0:
        return F.ceil(c)
    k = 10**precision
    return F.ceil(c * k) / k


def _vrl_merge(a: Column, b: Column, deep: bool = False) -> Column:
    """VRL `merge(to, from, deep:)` (src/stdlib merge.rs): right side wins
    on key collisions. deep=true merges one nested level via map_zip_with
    (collided values that are both maps merge right-wins instead of being
    replaced) — valid on map<., map<.,.>> columns, which is where `deep`
    is meaningful; VRL's unbounded recursion flattens to the one nesting
    level the columnar event model carries."""
    if not deep:
        return F.map_concat(a, b)
    return F.map_zip_with(
        a,
        b,
        lambda k, va, vb: F.when(va.isNull(), vb)
        .when(vb.isNull(), va)
        .otherwise(F.map_concat(va, vb)),
    )


def _uuid_v7(ts: Column | None = None) -> Column:
    """Real UUIDv7 (RFC 9562 layout): 48-bit unix-ms timestamp,
    version 7 nibble, variant 10 bits, 74 random bits — time-ordered
    unlike the uuid_v4 alias it replaces (r2 honest-delta list)."""
    ms = F.unix_millis(F.current_timestamp() if ts is None else ts)
    th = F.lpad(F.lower(F.hex(ms)), 12, "0")

    def rhex(n: int) -> Column:
        return F.lpad(
            F.lower(F.hex((F.rand() * F.lit(float(16**n))).cast("long"))),
            n, "0",
        )

    variant = F.element_at(
        F.array(F.lit("8"), F.lit("9"), F.lit("a"), F.lit("b")),
        (F.rand() * 4).cast("int") + 1,
    )
    return F.concat_ws(
        "-",
        F.substring(th, 1, 8),
        F.substring(th, 9, 4),
        F.concat(F.lit("7"), rhex(3)),
        F.concat(variant, rhex(3)),
        rhex(12),
    )


def _floor_p(c: Column, precision: int = 0) -> Column:
    if precision == 0:
        return F.floor(c)
    k = 10**precision
    return F.floor(c * k) / k


def _format_number(
    c: Column,
    scale: int = 2,
    decimal_separator: str = ".",
    grouping_separator: str = ",",
) -> Column:
    """VRL format_number: en-US format_number then separator translate
    (two-step so ',' and '.' can swap without colliding). VRL TRUNCATES
    toward zero at `scale` (1234.567 @2 → 1234.56) where Spark's
    format_number would round half-up — truncate first."""
    d = c.cast("double")
    if scale == 0:
        base = F.format_number(d.cast("long"), 0)
    else:
        # truncate WITHOUT float multiply (1234567.89 * 100 is
        # ...88.999…): format one digit past scale (rounds at scale+1,
        # recovering the decimal the double represents) and cut it
        plus = F.format_number(d, scale + 1)
        base = plus.substr(F.lit(1), F.length(plus) - 1)
    return F.translate(base, ",.", grouping_separator + decimal_separator)


# glog: I0101 12:00:00.000000 1 file.cc:123] message — the date may be
# MMdd (classic, no year) or yyyyMMdd (corpus remap_function_parse_glog)
GLOG_RE = r"^([IWEF])(\d{4}|\d{8}) ([\d:.]+)\s+(\d+)\s+([^:]+):(\d+)\]\s*(.*)$"


def parse_glog(c: Column) -> Column:
    """VRL parse_glog → struct (level name, typed timestamp when the line
    carries a full yyyyMMdd date, id, file, line, message)."""
    level = F.regexp_extract(c, GLOG_RE, 1)
    date = F.regexp_extract(c, GLOG_RE, 2)
    time = F.regexp_extract(c, GLOG_RE, 3)
    ts = F.when(
        F.length(date) == 8,
        F.coalesce(
            F.try_to_timestamp(
                F.concat(date, F.lit(" "), time),
                F.lit("yyyyMMdd HH:mm:ss.SSSSSS"),
            ),
            F.try_to_timestamp(
                F.concat(date, F.lit(" "), time),
                F.lit("yyyyMMdd HH:mm:ss"),
            ),
        ),
    )
    return F.struct(
        F.when(level == "I", "info")
        .when(level == "W", "warning")
        .when(level == "E", "error")
        .when(level == "F", "fatal")
        .alias("level"),
        ts.alias("timestamp"),
        F.regexp_extract(c, GLOG_RE, 4).cast("long").alias("id"),
        F.regexp_extract(c, GLOG_RE, 5).alias("file"),
        F.regexp_extract(c, GLOG_RE, 6).cast("long").alias("line"),
        F.regexp_extract(c, GLOG_RE, 7).alias("message"),
    )


def parse_common_log(c: Column, timestamp_format: str | None = None) -> Column:
    """VRL parse_common_log — the full apache 'common' struct (corpus
    remap_function_parse_common_log pins every field): host, identity,
    user, timestamp (typed), message, method, path, protocol, status,
    size. '-' fields become null like the reference."""
    dash_null = lambda col: F.when(col == "-", F.lit(None)).otherwise(col)  # noqa: E731
    g = lambda i: F.regexp_extract(c, APACHE_COMMON_RE, i)  # noqa: E731
    ts = F.try_to_timestamp(g(4), F.lit("dd/MMM/yyyy:HH:mm:ss Z"))
    return F.struct(
        g(1).alias("host"),
        dash_null(g(2)).alias("identity"),
        dash_null(g(3)).alias("user"),
        ts.alias("timestamp"),
        F.concat_ws(" ", g(5), g(6), g(7)).alias("message"),
        g(5).alias("method"),
        g(6).alias("path"),
        g(7).alias("protocol"),
        g(8).cast("long").alias("status"),
        g(9).cast("long").alias("size"),
    )


def parse_tokens(c: Column) -> Column:
    """VRL parse_tokens: split into whitespace tokens; "quoted" and
    [bracketed] runs stay single tokens WITH the delimiters stripped, and
    a bare '-' token is null (the reference's token forms — corpus
    remap_function_parse_tokens)."""
    raw = F.regexp_extract_all(c, F.lit(r'("[^"]*"|\[[^\]]*\]|\S+)'), 1)
    return F.transform(
        raw,
        lambda t: F.when(t == "-", F.lit(None))
        .when(
            t.startswith('"') & t.endswith('"'),
            t.substr(F.lit(2), F.length(t) - 2),
        )
        .when(
            t.startswith("[") & t.endswith("]"),
            t.substr(F.lit(2), F.length(t) - 2),
        )
        .otherwise(t),
    )


def json_text_transform(c: Column, op: str) -> Column:
    """VRL compact/flatten over schema-less parse_json output (validated
    JSON TEXT): the value's shape is per-row dynamic, so the transform
    runs as an Arrow-batched JSON rewrite and the result stays TEXT for
    the JSON-path bridge. This is the documented slow-path escape hatch
    for VRL's dynamic typing — typed arrays/maps use the Column forms."""
    from pyspark.sql.functions import pandas_udf

    def tx(s):
        import json as _json

        import pandas as pd

        def _empty(x):
            return x is None or x == "" or x == [] or x == {}

        def _compact(v):
            if isinstance(v, dict):
                out = {k: _compact(x) for k, x in v.items()}
                return {k: x for k, x in out.items() if not _empty(x)}
            if isinstance(v, list):
                out = [_compact(x) for x in v]
                return [x for x in out if not _empty(x)]
            return v

        def _flatten(v):
            if isinstance(v, list):
                out = []

                def rec(a):
                    for x in a:
                        rec(x) if isinstance(x, list) else out.append(x)

                rec(v)
                return out
            if isinstance(v, dict):
                out = {}

                def recm(d, prefix):
                    for k, x in d.items():
                        kk = f"{prefix}.{k}" if prefix else k
                        if isinstance(x, dict):
                            recm(x, kk)
                        else:
                            out[kk] = x

                recm(v, "")
                return out
            return v

        fn = _compact if op == "compact" else _flatten

        def one(t):
            if t is None:
                return None
            try:
                return _json.dumps(fn(_json.loads(t)))
            except (ValueError, TypeError):
                return None

        return pd.Series([one(t) for t in s])

    return pandas_udf(tx, "string")(c.cast("string"))


def _ip_mask_bits(mask: str) -> int:
    """'/8' or dotted-quad '255.255.0.0' → prefix bits (IPv4)."""
    if mask.startswith("/"):
        return int(mask[1:])
    n = sum(int(o) << (8 * (3 - i)) for i, o in enumerate(mask.split(".")))
    return bin(n).count("1")


def _ip_ntoa(n: Column) -> Column:
    return F.concat_ws(
        ".",
        (n / 16777216).cast("long") % 256,
        (n / 65536).cast("long") % 256,
        (n / 256).cast("long") % 256,
        n.cast("long") % 256,
    )


# ---- IPv6 two-long form ------------------------------------------------
# A 128-bit address rides as two signed 64-bit longs (hi, lo). All parsing
# and masking is pure Column (array ops + conv + shifts — shifts neither
# overflow-check under ANSI mode nor lose the sign bit), so CIDR filters
# stay inside whole-stage codegen and push into scans at 100 TB.

_MASK64 = (1 << 64) - 1


def _signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def _let(col: Column, f) -> Column:
    """Let-binding for Column trees: bind `col` ONCE as a single-element
    higher-order-function lambda variable and build `f(var)` against the
    variable. Columns compose by TREE SUBSTITUTION, so an expression
    referencing a big subtree N times carries N copies of it — the
    r11-shape IPv6 render duplicated its parse tree ~35× per reference
    level for an expression of ~10^5 nodes, costing tens of SECONDS of
    Catalyst analysis per query and pushing codegen past the JIT method
    limit. With `_let`, each subtree appears once; references are cheap
    lambda-variable reads. Same values row-for-row: the variable binds a
    deterministic expression, and nulls propagate identically."""
    return F.transform(F.array(col), f)[0]


def _ipv6_longs_struct(c: Column) -> Column:
    """Parse an IPv6 string Column (incl. '::' compression and a
    v4-mapped dotted tail) into a struct<hi:long, lo:long> of signed
    longs. Invalid input yields nulls (the fallibility contract's error
    state). Every multiply-referenced subexpression is `_let`-bound, so
    the parse tree appears exactly once in the plan."""
    def parse(s):
        # rewrite a trailing dotted-quad (::ffff:a.b.c.d) as two hex groups
        def after_v4(v4):
            v4n = (
                F.split(v4, r"\.")[0].cast("long") * 16777216
                + F.split(v4, r"\.")[1].cast("long") * 65536
                + F.split(v4, r"\.")[2].cast("long") * 256
                + F.split(v4, r"\.")[3].cast("long")
            )
            v4grp = _let(
                v4n,
                lambda n: F.concat(
                    F.lower(F.hex(F.shiftrightunsigned(n, 16))),
                    F.lit(":"),
                    F.lower(F.hex(n.bitwiseAND(F.lit(0xFFFF)))),
                ),
            )
            return F.when(
                v4 != "",
                F.concat(
                    F.regexp_replace(s, r"(\d{1,3}\.){3}\d{1,3}$", ""), v4grp
                ),
            ).otherwise(s)

        s2 = _let(
            F.regexp_extract(s, r"((?:\d{1,3}\.){3}\d{1,3})$", 1), after_v4
        )

        def with_halves(halves):
            nonempty = lambda x: x != ""  # noqa: E731
            left = F.filter(F.split(F.element_at(halves, 1), ":"), nonempty)
            right = F.when(
                F.size(halves) > 1,
                F.filter(F.split(F.element_at(halves, 2), ":"), nonempty),
            ).otherwise(F.array().cast("array<string>"))

            def with_lr(lr):
                mid = F.array_repeat(
                    F.lit("0"),
                    F.lit(8) - F.size(lr["l"]) - F.size(lr["r"]),
                )
                return F.concat(lr["l"], mid, lr["r"])

            return _let(
                F.struct(left.alias("l"), right.alias("r")), with_lr
            )

        groups = _let(F.split(s2, "::"), with_halves)
        nums = F.transform(groups, lambda g: F.conv(g, 16, 10).cast("long"))

        def hilo(ns):
            fold = lambda sl: F.aggregate(  # noqa: E731
                sl,
                F.lit(0).cast("long"),
                lambda acc, x: F.shiftleft(acc, 16).bitwiseOR(x),
            )
            ok = F.size(ns) == 8
            return F.struct(
                F.when(ok, fold(F.slice(ns, 1, 4))).alias("hi"),
                F.when(ok, fold(F.slice(ns, 5, 4))).alias("lo"),
            )

        return _let(nums, hilo)

    return _let(F.lower(F.trim(c)), parse)


def _ipv6_longs(c: Column) -> tuple[Column, Column]:
    """(hi, lo) pair view of :func:`_ipv6_longs_struct`. NOTE each
    returned Column carries its own copy of the (now once-let-bound)
    struct tree; callers needing BOTH should `_let` the struct instead."""
    st = _ipv6_longs_struct(c)
    return st["hi"], st["lo"]


def _ipv6_ntoa(hi: Column, lo: Column) -> Column:
    """(hi, lo) longs → RFC 5952-ish compressed string: lowercase hex, no
    leading zeros, first longest run of >=2 zero groups becomes '::'.
    The canonical string and its padded form are `_let`-bound: the
    compression when-chain references them ~5× per level × 7 levels,
    which is exactly the duplication that made this render ~10^5 plan
    nodes in the r11 shape."""
    def render(hl):
        gs = [
            F.lower(
                F.hex(
                    F.shiftrightunsigned(hl[f], sh).bitwiseAND(F.lit(0xFFFF))
                )
            )
            for f in ("h", "l")
            for sh in (48, 32, 16, 0)
        ]
        canon = F.concat_ws(":", *gs)

        def compress(cn):
            def run(p):
                out = cn
                for n in range(2, 9):  # when-chain longest-run-first
                    pat = ":" + "0:" * n
                    pos = F.locate(pat, p)
                    before = F.substring(p, F.lit(2), pos - 2)
                    after_full = F.substring(
                        p, pos + F.lit(len(pat)), F.lit(10**6)
                    )
                    after = F.substring(
                        after_full, F.lit(1), F.length(after_full) - 1
                    )
                    out = F.when(
                        pos > 0, F.concat(before, F.lit("::"), after)
                    ).otherwise(out)
                return out

            return _let(F.concat(F.lit(":"), cn, F.lit(":")), run)

        return _let(canon, compress)

    return _let(F.struct(hi.alias("h"), lo.alias("l")), render)


def _ipv6_mask(hi: Column, lo: Column, bits: int) -> tuple[Column, Column]:
    z = F.lit(0).cast("long")
    if bits <= 0:
        return z, z
    if bits < 64:
        return F.shiftleft(F.shiftrightunsigned(hi, 64 - bits), 64 - bits), z
    if bits == 64:
        return hi, z
    if bits < 128:
        return hi, F.shiftleft(F.shiftrightunsigned(lo, 128 - bits), 128 - bits)
    return hi, lo


def ip_subnet(c: Column | str, mask: str) -> Column:
    """VRL ip_subnet: apply a /prefix, dotted-quad, or IPv6 hex mask to an
    address (both families). Literal addresses resolve at compile time via
    the stdlib ipaddress module; Column addresses stay pure Column."""
    import ipaddress

    def _v6_mask_bits(m: str) -> int:
        # IPv6Interface rejects hex netmask strings; a contiguous
        # netmask's prefix length is its popcount
        return bin(int(ipaddress.IPv6Address(m))).count("1")

    if isinstance(c, str):
        if mask.startswith("/"):
            itf = ipaddress.ip_interface(f"{c}{mask}")
        elif ":" in mask:
            itf = ipaddress.ip_interface(f"{c}/{_v6_mask_bits(mask)}")
        else:
            itf = ipaddress.ip_interface((c, mask))
        return F.lit(str(itf.network.network_address))

    def _v6_subnet(bits: int) -> Column:
        # one copy of the parse tree: bind the struct, mask the bound
        # fields (masking references each field once or twice — cheap
        # lambda-variable reads), render via the let-bound ntoa
        return _let(
            _ipv6_longs_struct(c),
            lambda hl: _ipv6_ntoa(
                *_ipv6_mask(hl["hi"], hl["lo"], bits)
            ),
        )

    if ":" in mask:
        return _v6_subnet(_v6_mask_bits(mask))
    bits = _ip_mask_bits(mask)
    v4_bits = min(bits, 32)
    m = ((1 << v4_bits) - 1) << (32 - v4_bits) if v4_bits else 0
    aton = VRL_FUNCTIONS["ip_aton"]
    v4_out = _ip_ntoa(aton(c).bitwiseAND(F.lit(m)))
    if "." in mask:
        return v4_out
    v6_out = _v6_subnet(bits)
    return F.when(c.contains(":"), v6_out).otherwise(
        v4_out if bits <= 32 else F.lit(None).cast("string")
    )


def ip_cidr_contains_col(cidr, value: Column | str | None = None) -> Column:
    """VRL ip_cidr_contains(cidr:, value:) — v4 and v6, pure Column."""
    return ip_cidr_contains(cidr, value)


def ip_to_ipv6(c: Column) -> Column:
    """VRL ip_to_ipv6: v4 → '::ffff:a.b.c.d' mapped form."""
    return F.when(c.contains(":"), c).otherwise(F.concat(F.lit("::ffff:"), c))


def ipv6_to_ipv4(c: Column) -> Column:
    """VRL ipv6_to_ipv4: strip the ::ffff: mapping when present."""
    return F.when(
        F.lower(c).startswith("::ffff:"), F.substring(c, 8, 2147483647)
    ).otherwise(c)


_TS_UNIT_FACTOR = {"seconds": 1, "milliseconds": 10**3, "microseconds": 10**6,
                   "nanoseconds": 10**9}


def _to_unix_ts(c: Column, unit: str = "seconds") -> Column:
    """VRL to_unix_timestamp(ts, unit:) — integer in the requested unit."""
    if unit not in _TS_UNIT_FACTOR:
        raise ValueError(f"to_unix_timestamp: unknown unit {unit!r}")
    return (F.unix_micros(c) * 1000 / F.lit(10**9 // _TS_UNIT_FACTOR[unit])).cast(
        "long"
    )


def _from_unix_ts(c: Column, unit: str = "seconds") -> Column:
    """VRL from_unix_timestamp(n, unit:) — integer back to a timestamp."""
    if unit not in _TS_UNIT_FACTOR:
        raise ValueError(f"from_unix_timestamp: unknown unit {unit!r}")
    micros = c.cast("long") * F.lit(10**6) / F.lit(_TS_UNIT_FACTOR[unit])
    return F.timestamp_micros(micros.cast("long"))


def _camelcase(c: Column) -> Column:
    pascal = F.regexp_replace(F.initcap(F.regexp_replace(c, "[-_]", " ")), " ", "")
    return F.concat(
        F.lower(F.substring(pascal, 1, 1)), F.substring(pascal, 2, 2147483647)
    )


def _compact(c: Column) -> Column:
    """VRL compact: drop null elements from an array (map form: drop
    null-valued keys via map_filter)."""
    return F.filter(c, lambda x: x.isNotNull())


def _tag_types_externally(c) -> Column:
    """VRL tag_types_externally — wraps a value as {"<type>": value}; we
    surface the type name (the useful analyzable part in a typed engine)."""
    col = c if isinstance(c, Column) else F.lit(c)
    return F.typeof(col)


# ---- registry: VRL name -> Column builder ------------------------------
# Coerce/Convert/Type, String, Timestamp, Array/Map, Codec, Crypto, Number
# categories map ~1:1 onto pyspark.sql.functions; this table is the single
# source of truth used by the remap compiler and the YAML loader.

def _vrl_replace(c, *args, **kw):
    """VRL replace(value, pattern, with, count): pattern may be named,
    replacement arrives as `with:` (a Python keyword, hence **kw).
    count >= 0 (replace first N) is approximated for count=1 via
    regexp_replace of the first match only."""
    rest = list(args)
    pat = kw["pattern"] if "pattern" in kw else rest.pop(0)
    rep = kw["with"] if "with" in kw else (rest.pop(0) if rest else "")
    count = kw["count"] if "count" in kw else (rest.pop(0) if rest else -1)
    pat_s = str(pat)
    if isinstance(count, int) and count == 1:
        # anchor to first occurrence: capture prefix up to first match
        return F.regexp_replace(c, "^((?s:.*?))" + "(" + pat_s + ")", "$1" + str(rep))
    return F.regexp_replace(c, pat_s, str(rep))


# Named redact filters. `us_social_security_number` is the reference's
# documented name (website/cue/reference/examples.cue); the others are
# the common PII classes a redaction pass needs — patterns chosen to be
# Java-regex AND RE2 compatible so the DuckDB oracles replay them.
REDACT_FILTERS: dict[str, str] = {
    "us_social_security_number": r"\b\d{3}-\d{2}-\d{4}\b",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "credit_card": r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b",
    "phone_number": r"\+?\d{1,2}[ .-]?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}",
}


def _vrl_redact(c, *args, **kw):
    filters = kw.get("filters", args[0] if args else [])
    if isinstance(filters, Column):
        # Column.__getattr__ would turn a plain getattr into field access
        filters = filters.__dict__.get("_vs_literal_list")
        if filters is None:
            raise ValueError("redact: filters must be literal patterns")
    if not isinstance(filters, (list, tuple)):
        filters = [filters]
    out = c
    for pat in filters:
        out = F.regexp_replace(
            out, REDACT_FILTERS.get(str(pat), str(pat)), "[REDACTED]"
        )
    return out


def _to_unix_timestamp(c, unit="seconds", **kw):
    unit = kw.get("unit", unit)
    secs = F.unix_timestamp(c)
    if unit == "seconds":
        return secs
    frac = F.date_format(c, "SSS").cast("long")
    if unit == "milliseconds":
        return secs * 1000 + frac
    if unit == "nanoseconds":
        return (secs * 1000 + frac) * 1000000
    raise ValueError(f"to_unix_timestamp: unknown unit {unit!r}")



def _sha2(c: Column, variant=None) -> Column:
    """VRL sha2: DEFAULT variant is SHA-512/256 (corpus
    remap_function_sha2 digest set) — no JVM expression exists for it, so
    the default goes through an Arrow-batched pandas UDF; explicit
    224/256/384/512 stay native F.sha2."""
    if variant is not None:
        return F.sha2(c, int(variant))
    from pyspark.sql.functions import pandas_udf

    def batch(s):
        import hashlib

        import pandas as pd

        return pd.Series(
            [
                None
                if v is None
                else hashlib.new("sha512_256", str(v).encode()).hexdigest()
                for v in s
            ]
        )

    return pandas_udf(batch, "string")(c.cast("string"))



# What could plausibly cast to a numeric/boolean/timestamp: leading
# optional sign + digit (covers ints, floats, exponents, timestamps),
# or an exact boolean/infinity/nan word. try_cast on a FAILING string
# takes Spark's exception-driven path (~11x a succeeding cast at
# 100k rows, measured on local[32]); strings that cannot possibly cast
# short-circuit to null at regex cost instead. Over-matching is safe —
# try_cast stays the decider for anything that matches.
_CAST_PLAUSIBLE = (
    r"(?i)^\s*(?:[+-]?\.?[0-9]"
    r"|(?:true|false|t|f|yes|no|y|n|on|off|infinity|inf|nan)\s*$)"
)


def _format_timestamp(c: Column, fmt, timezone=None) -> Column:
    """VRL format_timestamp(ts, format[, timezone]): the optional
    timezone renders the UTC instant as wall time in that zone (VRL
    stdlib format_timestamp's `timezone` argument; names validated
    like the global option — `local` resolves the host zone)."""
    if timezone is not None:
        tz = timezone if isinstance(timezone, str) else None
        if tz is None:
            raise ValueError(
                "format_timestamp: timezone must be a string literal")
        from vector_spark.config.globals import resolve_timezone

        c = F.from_utc_timestamp(c, resolve_timezone(tz))
    return F.date_format(c, fmt)


def _guarded_try_cast(value: Column, dtype: str) -> Column:
    """``try_cast`` that skips the per-row exception machinery for
    strings no cast could accept. Result-identical to a bare
    ``value.try_cast(dtype)`` for every input type (numerics render as
    digit-leading strings, so non-string columns always pass the
    guard)."""
    return F.when(
        value.cast("string").rlike(_CAST_PLAUSIBLE), value.try_cast(dtype)
    )


def _vrl_length(c: Column) -> Column:
    """VRL length: arrays → element count, objects → key count, strings →
    char count. Composes with schema-less parse_json (which passes
    validated JSON text through): JSON array/object TEXT counts its
    elements/keys via json_array_length / json_object_keys."""
    s = c.cast("string")
    t = F.trim(s)
    # coalesce: a plain string that merely STARTS with '[' or '{' but is
    # not valid JSON makes the json_* branch null — fall back to char count
    return (
        F.when(t.startswith("["), F.coalesce(F.json_array_length(t), F.length(s)))
        .when(t.startswith("{"), F.coalesce(F.size(F.json_object_keys(t)), F.length(s)))
        .otherwise(F.length(s))
        .cast("long")
    )



def parse_aws_cloudwatch_log_subscription_message(c: Column) -> Column:
    """VRL parse_aws_cloudwatch_log_subscription_message: the documented
    CloudWatch Logs subscription JSON → snake_case struct; log-event
    timestamps are epoch-millis → timestamp."""
    p = F.from_json(
        c,
        "messageType string, owner string, logGroup string, "
        "logStream string, subscriptionFilters array<string>, "
        "logEvents array<struct<id:string, timestamp:bigint, "
        "message:string>>",
    )
    return F.struct(
        p["owner"].alias("owner"),
        p["messageType"].alias("message_type"),
        p["logGroup"].alias("log_group"),
        p["logStream"].alias("log_stream"),
        p["subscriptionFilters"].alias("subscription_filters"),
        F.transform(
            p["logEvents"],
            lambda e: F.struct(
                e["id"].alias("id"),
                F.timestamp_millis(e["timestamp"]).alias("timestamp"),
                e["message"].alias("message"),
            ),
        ).alias("log_events"),
    )


def _tag_dtype(dtype: str, col: Column) -> Column:
    """annotate a function-result Column with its known simpleString
    dtype so the compiler can propagate it to assigned event fields
    (enables e.g. order-insensitive object equality on `.parts.query`)."""
    col._vs_dtype = dtype
    return col


VRL_FUNCTIONS: dict[str, Callable[..., Column]] = {
    # Parse
    "parse_json": parse_json,
    "parse_key_value": lambda *a, **k: _tag_dtype(
        "map<string,string>", parse_key_value(*a, **k)
    ),
    "parse_regex": parse_regex,
    "parse_timestamp": parse_timestamp,
    "parse_duration": parse_duration_ms,
    "parse_apache_log": parse_apache_log,
    "parse_syslog": parse_syslog,
    "parse_csv": lambda c, schema: F.from_csv(c, F.lit(schema)),
    # no part → the corpus's struct-of-parts form (`.parts = parse_url!(.url)`)
    # with the reference's full field set (VRL stdlib parse_url): scheme,
    # username/password ('' when absent), host, port (null when absent),
    # path, query as a map ({} when absent), fragment — field ORDER matches
    # the reference so JSON-canonical struct comparison lines up.
    "parse_url": lambda c, part=None: (
        F.parse_url(c, F.lit(part))
        if part is not None
        else _tag_dtype(
            "struct<scheme:string,username:string,password:string,"
            "host:string,port:bigint,path:string,"
            "query:map<string,string>,fragment:string>",
            F.struct(
            F.parse_url(c, F.lit("PROTOCOL")).alias("scheme"),
            F.coalesce(
                F.split(F.parse_url(c, F.lit("USERINFO")), ":")[0], F.lit("")
            ).alias("username"),
            F.coalesce(
                F.split(F.parse_url(c, F.lit("USERINFO")), ":")[1], F.lit("")
            ).alias("password"),
            F.parse_url(c, F.lit("HOST")).alias("host"),
            F.regexp_extract(
                F.parse_url(c, F.lit("AUTHORITY")), r":(\d+)$", 1
            )
            .try_cast("long")
            .alias("port"),
            F.parse_url(c, F.lit("PATH")).alias("path"),
            F.coalesce(
                F.str_to_map(
                    F.parse_url(c, F.lit("QUERY")), F.lit("&"), F.lit("=")
                ),
                F.create_map().cast("map<string,string>"),
            ).alias("query"),
            F.parse_url(c, F.lit("REF")).alias("fragment"),
            )
        )
    ),
    "parse_int": lambda c: _guarded_try_cast(c, "long"),
    "parse_float": lambda c: _guarded_try_cast(c, "double"),
    # Event / Path
    "exists": lambda c: c.isNotNull(),
    "is_null": lambda c: c.isNull(),
    "is_empty": lambda c: F.length(c.cast("string")) == 0,
    # Coerce / Convert / Type — try_cast, not cast: Spark 4 defaults to
    # ANSI mode where a failed cast THROWS; VRL's `to_int!` error contract
    # is "capture the failure", which try_cast's null-on-failure gives us
    # (combined with functions.vrl.fallible to raise the _error flag).
    # _guarded_try_cast short-circuits the exception-driven failure path
    # (11x on non-numeric columns, measured) without changing results.
    "to_int": lambda value: _guarded_try_cast(value, "long"),
    "to_float": lambda value: _guarded_try_cast(value, "double"),
    "to_bool": lambda value: _guarded_try_cast(value, "boolean"),
    "to_string": lambda value: F.coalesce(value.cast("string"), F.lit("")),
    # VRL type-assertion coercions (string!/int!/... error when the value
    # isn't of the type; with static schemas a cast covers the dynamic part
    # — documented delta: no runtime type tag to check)
    "string": lambda value: value.cast("string"),
    "int": lambda value: _guarded_try_cast(value, "long"),
    "float": lambda value: _guarded_try_cast(value, "double"),
    "bool": lambda value: _guarded_try_cast(value, "boolean"),
    "timestamp": lambda value: _guarded_try_cast(value, "timestamp"),
    "is_nullish": lambda c: (
        c.isNull()
        | c.cast("string").rlike(r"^\s*$")
        | (c.cast("string") == "-")
    ),
    # String
    "upcase": F.upper,
    "downcase": F.lower,
    "strip_whitespace": F.trim,
    "split": _split,
    "replace": _vrl_replace,
    "starts_with": _starts_with,
    "ends_with": _ends_with,
    "contains": _contains,
    "match": lambda c, pat: c.rlike(pat),
    "slice": _slice,
    "truncate": _truncate,
    "length": lambda c: _vrl_length(c),
    "strlen": F.length,
    "join": lambda c, sep="": F.array_join(c, sep),
    "strip_ansi_escape_codes": lambda c: F.regexp_replace(
        c, r"\x1b\[[0-9;]*[A-Za-z]", ""
    ),
    "camelcase": lambda c: _camelcase(c),
    "snakecase": lambda c: F.lower(
        F.regexp_replace(
            F.regexp_replace(c, "([a-z0-9])([A-Z])", r"$1_$2"), "[- ]", "_"
        )
    ),
    # Timestamp
    "now": F.current_timestamp,
    "format_timestamp": lambda c, fmt, timezone=None: _format_timestamp(
        c, fmt, timezone),
    "to_unix_timestamp": _to_unix_timestamp,
    "from_unix_timestamp": lambda c: F.to_timestamp(F.from_unixtime(c)),
    # Array / Map / Object
    "push": lambda arr, x: F.concat(arr, F.array(x)),
    "flatten": F.flatten,
    "unique": F.array_distinct,
    "merge": _vrl_merge,
    "keys": F.map_keys,
    "values": F.map_values,
    "includes": lambda arr, x: F.array_contains(arr, x),
    # Codec
    "encode_base64": F.base64,
    "decode_base64": lambda c: F.unbase64(c).cast("string"),
    "encode_json": F.to_json,
    # Cryptography / Checksum
    "md5": F.md5,
    "sha1": F.sha1,
    "sha2": lambda c, variant=None: _sha2(c, variant),
    "crc32": F.crc32,
    "seahash": F.xxhash64,  # stand-in 64-bit fast hash (same role as seahash)
    # Number / Random
    "round": lambda c, precision=0: F.round(c, precision),
    "floor": _floor_p,
    "ceil": _ceil_p,
    "abs": F.abs,
    "mod": lambda a, b: a % b,
    "format_number": _format_number,
    "random_int": lambda lo, hi: (F.rand() * (hi - lo) + lo).cast("long"),
    "uuid_v4": F.uuid,
    "uuid_v7": _uuid_v7,
    # IP (no native Spark support; pure-Column arithmetic for v4)
    "ip_aton": lambda c: (
        F.split(c, r"\.")[0].cast("long") * 16777216
        + F.split(c, r"\.")[1].cast("long") * 65536
        + F.split(c, r"\.")[2].cast("long") * 256
        + F.split(c, r"\.")[3].cast("long")
    ),
}

# Second wave — corpus-driven additions (defined below the first table so
# helpers that look functions up in VRL_FUNCTIONS keep working).
VRL_FUNCTIONS.update(
    {
        # Parse
        "parse_glog": parse_glog,
        "parse_common_log": parse_common_log,
        "parse_tokens": parse_tokens,
        "parse_grok": lambda c, pattern: parse_grok(c, pattern),
        "parse_query_string": lambda c: _tag_dtype(
            "map<string,string>",
            F.str_to_map(
                F.regexp_replace(c, r"^\?", ""), F.lit("&"), F.lit("=")
            ),
        ),
        "parse_user_agent": lambda c: F.struct(
            F.regexp_extract(c, r"^([^/ ]+)", 1).alias("family"),
            F.regexp_extract(c, r"^[^/ ]+/([\d.]+)", 1).alias("version"),
        ),
        # IP
        "ip_subnet": ip_subnet,
        "ip_cidr_contains": ip_cidr_contains_col,
        "ip_to_ipv6": ip_to_ipv6,
        "ipv6_to_ipv4": ipv6_to_ipv4,
        "ip_ntoa": _ip_ntoa,
        # Array / Map / Object (closure-free forms)
        "compact": _compact,
        "append": lambda arr, items: F.concat(arr, items),
        "get": lambda c, path: c.getItem(path),
        "array_first": lambda arr: F.element_at(arr, 1),
        "array_last": lambda arr: F.element_at(arr, -1),
        "chunks": lambda arr, n: _chunks(arr, n),
        "zip": lambda a, b: F.arrays_zip(a, b),
        "tag_types_externally": _tag_types_externally,
        # Type reflection
        "type_def": lambda c: F.typeof(c),
        "is_string": lambda c: F.typeof(c) == F.lit("string"),
        "is_integer": lambda c: F.typeof(c).isin("int", "bigint", "smallint"),
        "is_float": lambda c: F.typeof(c).isin("float", "double"),
        "is_boolean": lambda c: F.typeof(c) == F.lit("boolean"),
        "is_array": lambda c: F.typeof(c).startswith("array"),
        "is_object": lambda c: F.typeof(c).startswith("struct")
        | F.typeof(c).startswith("map"),
        "is_timestamp": lambda c: F.typeof(c) == F.lit("timestamp"),
        # System / Debug
        "get_env_var": lambda name: F.lit(__import__("os").environ.get(name)),
        "log": lambda c, level="info", rate_limit_secs=None: c,
        "assert": lambda condition, message=None: condition,
        "assert_eq": lambda left, right, message=None: left == right,
        "get_hostname": lambda: F.lit(__import__("socket").gethostname()),
        # Enumerate (closure functions: the parser passes the compiled
        # closure as a python callable Column → Column, which Spark's
        # higher-order functions accept directly — VRL's `map_each(.x) ->
        # |v| { ... }` becomes F.transform, staying JVM-side)
        "map_each": lambda arr, closure: F.transform(arr, closure),
        "filter": lambda arr, closure: F.filter(arr, closure),
        "map_values": lambda m, closure: F.transform_values(
            m, lambda k, v: closure(v)
        ),
        "map_keys": lambda m, closure: F.transform_keys(
            m, lambda k, v: closure(k)
        ),
        # Checksum extras
        "hmac": lambda c, key: F.sha2(F.concat(F.lit(key), c.cast("string")), 256),
        "xxhash64": F.xxhash64,
        # Codec wave 2
        "encode_hex": lambda c: F.lower(F.hex(c.cast("binary"))),
        "decode_hex": lambda c: F.unhex(c).cast("string"),
        "encode_percent": lambda c: F.url_encode(c),
        "decode_percent": lambda c: F.url_decode(c),
        # Parse wave 2
        "parse_logfmt": lambda c: _tag_dtype(
            "map<string,string>", F.str_to_map(c, F.lit(" "), F.lit("="))
        ),
        "parse_nginx_log": lambda c, format="combined": parse_nginx_log(c),
        "parse_aws_vpc_flow_log": lambda c, **kw: parse_aws_vpc_flow_log(c, **kw),
        "parse_aws_cloudwatch_log_subscription_message":
            parse_aws_cloudwatch_log_subscription_message,
        "parse_cef": lambda c: parse_cef(c),
        "parse_bytes": lambda c, unit="B": parse_bytes(c, unit),
        "parse_int_radix": lambda c, base=10: F.conv(c, base, 10).cast("long"),
        # String wave 2
        # find returns null (not -1) on no match since the pinned vrl main
        # (highlights-july-2026.md "Type system": "`find` now returns
        # `null` when no match is found, instead of `-1`")
        "find": lambda c, substring: F.when(
            F.instr(c, substring) > 0, F.instr(c, substring) - 1
        ),
        "redact": _vrl_redact,
        "repeat": lambda c, count: F.repeat(c, count),
        "reverse": F.reverse,
        "pad_left": lambda c, length, pad=" ": F.lpad(c, length, pad),
        "pad_right": lambda c, length, pad=" ": F.rpad(c, length, pad),
        # Type / validity
        "is_json": lambda c: F.try_parse_json(c).isNotNull(),
        "is_ipv4": lambda c: c.rlike(r"^(\d{1,3}\.){3}\d{1,3}$"),
        "is_ipv6": lambda c: c.rlike(r"^[0-9A-Fa-f:]+:[0-9A-Fa-f:.]*$"),
        # Array / Map wave 2
        "tally": lambda arr: F.map_from_arrays(
            F.array_distinct(arr),
            F.transform(
                F.array_distinct(arr),
                lambda x: F.size(F.filter(arr, lambda y: y == x)),
            ),
        ),
        "object_from_array": lambda entries: F.map_from_entries(entries),
        "sort": F.array_sort,
        # Metrics / syslog conversions
        "to_syslog_severity": lambda c: _to_syslog_severity(c),
        "to_syslog_level": lambda c: _to_syslog_level(c),
        "to_syslog_facility": lambda c: _to_syslog_facility(c),
        # Timestamp wave 2
        "get_timezone_name": lambda: F.current_timezone(),
        "to_unix_timestamp_unit": lambda c, unit="seconds": _to_unix_ts(c, unit),
        "from_unix_timestamp_unit": lambda c, unit="seconds": _from_unix_ts(c, unit),
        # Array predicates / base16
        "includes_any": lambda arr, items: F.arrays_overlap(arr, items),
        "includes_all": lambda arr, items: F.forall(
            items, lambda x: F.array_contains(arr, x)
        ),
        "match_any": lambda arr, pattern: F.exists(arr, lambda x: x.rlike(pattern)),
        "match_array": lambda arr, pattern: F.exists(
            arr, lambda x: x.rlike(pattern)
        ),
        "encode_base16": lambda c: F.lower(F.hex(c.cast("binary"))),
        "decode_base16": lambda c: F.unhex(c).cast("string"),
        "parse_linux_authorization": lambda c: parse_syslog(c),
        # Timestamp extras
        "format_timestamp": lambda c, format, timezone=None:
            _format_timestamp(c, _strf(format), timezone),
    }
)


def _chunks(arr: Column, n: int) -> Column:
    """VRL chunks: array → array of n-sized arrays."""
    return F.transform(
        F.sequence(F.lit(0), ((F.size(arr) - 1) / F.lit(n)).cast("long")),
        lambda i: F.slice(arr, (i * n + 1).cast("int"), n),
    )


def _strf(fmt: str) -> str:
    """VRL timestamp formats are chrono strftime (e.g. '%+', '%F %T');
    translate to java.time for date_format. '%+' is RFC3339."""
    if fmt == "%+":
        # chrono %+ (RFC3339) renders the offset as +00:00, not Z
        return "yyyy-MM-dd'T'HH:mm:ssxxx"
    if "%" not in fmt:
        return fmt  # already a java.time pattern (pre-corpus callers)
    from vector_spark.functions.template import strftime_to_java

    return strftime_to_java(fmt)


def ip_cidr_contains(cidr: str, ip_col: Column | str) -> Column:
    """VRL ip_cidr_contains, both families, pure Column for Column values.
    Mixed address/network families compare false (the reference's VRL
    stdlib behavior). Literal values resolve at compile time."""
    import ipaddress

    net = ipaddress.ip_network(cidr, strict=False)
    if isinstance(ip_col, str):
        try:
            return F.lit(ipaddress.ip_address(ip_col) in net)
        except (ValueError, TypeError):
            return F.lit(False)
    if net.version == 4:
        base, bits = cidr.split("/")
        bits = int(bits)
        aton = VRL_FUNCTIONS["ip_aton"]
        base_n = int(net.network_address)
        mask = ((1 << bits) - 1) << (32 - bits) if bits else 0
        return ~ip_col.contains(":") & (
            aton(ip_col).cast("long").bitwiseAND(F.lit(mask))
            == F.lit(base_n & mask)
        )
    bits = net.prefixlen
    v = int(net.network_address)
    hi_t, lo_t = (v >> 64) & _MASK64, v & _MASK64

    def check(hl):
        hi, lo = hl["hi"], hl["lo"]
        if bits == 0:
            match = F.lit(True)
        elif bits < 64:
            match = (
                F.shiftrightunsigned(hi, 64 - bits)
                == F.lit(hi_t >> (64 - bits))
            )
        elif bits == 64:
            match = hi == F.lit(_signed64(hi_t))
        elif bits < 128:
            match = (hi == F.lit(_signed64(hi_t))) & (
                F.shiftrightunsigned(lo, 128 - bits)
                == F.lit(lo_t >> (128 - bits))
            )
        else:
            match = (hi == F.lit(_signed64(hi_t))) & (
                lo == F.lit(_signed64(lo_t))
            )
        return F.coalesce(match, F.lit(False))

    # one parse-tree copy via the struct binding (hi/lo are variable reads)
    return ip_col.contains(":") & _let(_ipv6_longs_struct(ip_col), check)


# ---- Grok (VRL parse_grok) --------------------------------------------
# Common grok patterns → regex fragments (the subset vector's own examples
# exercise; the full DSL is just macro expansion over these).
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE10NUM": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "IPV4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "HOSTNAME": r"[A-Za-z0-9][A-Za-z0-9_.-]*",
    "USER": r"[A-Za-z0-9._-]+",
    "USERNAME": r"[A-Za-z0-9._-]+",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2}\s[+-]\d{4}",
    "LOGLEVEL": (
        r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE"
        r"|[Ii]nfo(?:rmation)?|INFO(?:RMATION)?|[Ww]arn(?:ing)?"
        r"|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?"
        r"|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE"
        r"|[Ee]merg(?:ency)?|EMERG(?:ENCY)?)"
    ),
    "UUID": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "EMAILLOCALPART": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+",
    "EMAILADDRESS": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+@[A-Za-z0-9][A-Za-z0-9_.-]*",
}

_GROK_REF = __import__("re").compile(r"%\{(\w+)(?::(\w+))?\}")


def grok_to_regex(pattern: str) -> tuple[str, list[tuple[str, int]]]:
    """Expand a grok pattern into (regex, [(capture_name, group_index)]).
    `%{SYNTAX:name}` becomes a capture group; bare `%{SYNTAX}` is
    non-capturing. Group indices count EVERY capturing paren in the final
    regex — raw parens the user wrote (e.g. alternation `(A|B)`) shift
    the numbering, so indices are computed by scanning the result."""
    import re as _re

    marks: list[str] = []

    def repl(m: "_re.Match[str]") -> str:
        syntax, name = m.group(1), m.group(2)
        if syntax not in GROK_PATTERNS:
            raise ValueError(f"unknown grok pattern %{{{syntax}}}")
        frag = GROK_PATTERNS[syntax]
        if name:
            marks.append(name)
            return f"(\x00{len(marks) - 1}\x00{frag})"
        return f"(?:{frag})"

    marked = _GROK_REF.sub(repl, pattern)
    # walk the marked regex: every capturing '(' gets the next index
    names: list[tuple[str, int]] = []
    idx = 0
    i = 0
    while i < len(marked):
        ch = marked[i]
        if ch == "\\":
            i += 2
            continue
        if ch == "(":
            if marked[i + 1 : i + 2] == "?":
                i += 1
                continue
            idx += 1
            m2 = _re.match("\x00(\\d+)\x00", marked[i + 1 :])
            if m2:
                names.append((marks[int(m2.group(1))], idx))
        i += 1
    clean = _re.sub("\x00\\d+\x00", "", marked)
    return clean, names


def parse_grok(c: Column, pattern: str) -> Column:
    """VRL parse_grok: returns a struct with one field per named capture.
    Compiles ONCE to a regex evaluated JVM-side (regexp_extract) — grok in
    the reference is likewise regex macro expansion, not an interpreter."""
    regex, names = grok_to_regex(pattern)
    if not names:
        raise ValueError("grok pattern has no named captures")
    # unmatched optional captures (alternation arms) are ABSENT in VRL's
    # grok result — null, so exists() sees them missing
    return F.struct(
        *[
            F.nullif(F.regexp_extract(c, regex, gi), F.lit("")).alias(name)
            for name, gi in names
        ]
    )


# ---- wave-2 parse helpers ----------------------------------------------

# nginx 'combined': remote - user [time] "req" status bytes "referer" "agent"
NGINX_COMBINED_RE = (
    r'^(\S+) - (\S+) \[([^\]]+)\] "(\S+) (\S+) (\S+)" (\d+) (\d+) "([^"]*)" "([^"]*)"'
)


def parse_nginx_log(c: Column) -> Column:
    """VRL parse_nginx_log('combined') → struct of typed fields."""
    return F.struct(
        F.regexp_extract(c, NGINX_COMBINED_RE, 1).alias("client"),
        F.regexp_extract(c, NGINX_COMBINED_RE, 2).alias("user"),
        F.regexp_extract(c, NGINX_COMBINED_RE, 4).alias("method"),
        F.regexp_extract(c, NGINX_COMBINED_RE, 5).alias("path"),
        F.regexp_extract(c, NGINX_COMBINED_RE, 7).cast("int").alias("status"),
        F.regexp_extract(c, NGINX_COMBINED_RE, 8).cast("long").alias("size"),
        F.regexp_extract(c, NGINX_COMBINED_RE, 9).alias("referer"),
        F.regexp_extract(c, NGINX_COMBINED_RE, 10).alias("agent"),
    )


# AWS VPC flow log v2: version account eni src dst sport dport proto
# packets bytes start end action status
_VPC_FIELDS = [
    ("version", "int"), ("account_id", "string"), ("interface_id", "string"),
    ("srcaddr", "string"), ("dstaddr", "string"), ("srcport", "int"),
    ("dstport", "int"), ("protocol", "int"), ("packets", "long"),
    ("bytes", "long"), ("start", "long"), ("end", "long"),
    ("action", "string"), ("log_status", "string"),
]


def parse_aws_vpc_flow_log(c: Column, format: str | None = None) -> Column:
    """VRL parse_aws_vpc_flow_log → typed struct; '-' fields (no data)
    read as null via try_cast. `format:` (a space-separated field list)
    selects custom fields — unknown names parse as strings, like the
    reference's custom-format path."""
    parts = F.split(c, " ")
    if format:
        known = dict(_VPC_FIELDS)
        fields = [(n, known.get(n, "string")) for n in format.split()]
    else:
        fields = list(_VPC_FIELDS)
    return F.struct(
        *[
            F.nullif(parts[i], F.lit("-")).try_cast(t).alias(n)
            for i, (n, t) in enumerate(fields)
        ]
    )


def parse_cef(c: Column) -> Column:
    """VRL parse_cef: the 7 pipe-delimited header fields + raw extension
    (k=v pairs parse downstream with parse_key_value)."""
    return F.struct(
        F.regexp_extract(c, r"^CEF:(\d+)\|", 1).cast("int").alias("cef_version"),
        F.split(c, r"\|")[1].alias("device_vendor"),
        F.split(c, r"\|")[2].alias("device_product"),
        F.split(c, r"\|")[3].alias("device_version"),
        F.split(c, r"\|")[4].alias("device_event_class_id"),
        F.split(c, r"\|")[5].alias("name"),
        F.split(c, r"\|")[6].alias("severity"),
        F.regexp_extract(c, r"^(?:[^|]*\|){7}(.*)$", 1).alias("extension"),
    )


_BYTES_FACTORS = {
    "B": 1.0, "KiB": 2.0**10, "MiB": 2.0**20, "GiB": 2.0**30, "TiB": 2.0**40,
    "kB": 1e3, "MB": 1e6, "GB": 1e9, "TB": 1e12,
}


def parse_bytes(c: Column, unit: str = "B") -> Column:
    """VRL parse_bytes("1.2KiB", unit:) → numeric in the requested unit."""
    num = F.regexp_extract(c, r"^([0-9.]+)", 1).cast("double")
    suffix = F.regexp_extract(c, r"([A-Za-z]+)$", 1)
    factor = F.lit(None).cast("double")
    for name, f in _BYTES_FACTORS.items():
        factor = F.when(suffix == name, f).otherwise(factor)
    if unit not in _BYTES_FACTORS:
        raise ValueError(f"parse_bytes: unknown unit {unit!r}")
    return num * factor / F.lit(_BYTES_FACTORS[unit])


# syslog conversions (VRL to_syslog_severity/level/facility)
_SYSLOG_SEV = {
    "emerg": 0, "panic": 0, "alert": 1, "crit": 2, "critical": 2,
    "err": 3, "error": 3, "warning": 4, "warn": 4, "notice": 5,
    "info": 6, "informational": 6, "debug": 7, "trace": 7,
}
_SYSLOG_LEVELS = ["emerg", "alert", "crit", "err", "warning", "notice",
                  "info", "debug"]
_SYSLOG_FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]


def _to_syslog_severity(c: Column) -> Column:
    out = F.lit(None).cast("int")
    for name, code in _SYSLOG_SEV.items():
        out = F.when(F.lower(c) == name, code).otherwise(out)
    return out


def _to_syslog_level(c: Column) -> Column:
    out = F.lit(None).cast("string")
    for code, name in enumerate(_SYSLOG_LEVELS):
        out = F.when(c.cast("int") == code, name).otherwise(out)
    return out


def _to_syslog_facility(c: Column) -> Column:
    out = F.lit(None).cast("string")
    for code, name in enumerate(_SYSLOG_FACILITIES):
        out = F.when(c.cast("int") == code, name).otherwise(out)
    return out


# Fourth wave — remaining stdlib breadth (casing, entropy, community_id,
# Python-stdlib codecs as Arrow-batched pandas UDFs, env-gated libs).
# Imported last so wave-4 helpers can reference the tables above.
from vector_spark.functions.vrl_wave4 import WAVE4 as _WAVE4  # noqa: E402

VRL_FUNCTIONS.update(_WAVE4)

# Fifth wave — post-snapshot vrl-main additions (paths, entries, csv,
# haversine, crc/base62/xxhash, parse_yaml, ipcrypt) + set/remove.
from vector_spark.functions.vrl_wave5 import WAVE5 as _WAVE5  # noqa: E402

VRL_FUNCTIONS.update(_WAVE5)

# lib/vector-vrl/metrics: internal-metrics search/aggregate functions,
# driver-resolved against the observability counters snapshot.
from vector_spark.functions.vrl_metrics import (  # noqa: E402
    VECTOR_METRICS_FNS as _VMETRICS,
)

VRL_FUNCTIONS.update(_VMETRICS)


def _match_datadog_query(query: str) -> Column:
    """VRL match_datadog_query(., "query") — the event-object first arg is
    implicit here (columns ARE the event); the Datadog search grammar
    compiles through functions/search.py to one boolean Column."""
    from vector_spark.functions.search import datadog_search

    return datadog_search(query)


VRL_FUNCTIONS["match_datadog_query"] = _match_datadog_query
