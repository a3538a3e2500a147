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

from pyspark.sql import Column
from pyspark.sql import functions as F


def fallible(col: Column, source: Column) -> tuple[Column, Column]:
    """Return (value, error_flag): error when source was non-null but the
    expression produced null (the VRL `, err` convention)."""
    return col, source.isNotNull() & col.isNull()


# ---- Parse ------------------------------------------------------------
def parse_json(c: Column, schema: str | None = None) -> Column:
    """VRL parse_json!: with a schema -> typed struct, else keep for
    get_json_object-style path access."""
    return F.from_json(c, schema) if schema else c


def parse_key_value(c: Column, pair_sep: str = " ", kv_sep: str = "=") -> Column:
    """VRL parse_key_value (logfmt): string -> map<string,string>."""
    return F.str_to_map(c, F.lit(pair_sep), F.lit(kv_sep))


def parse_regex(c: Column, pattern: str, group: int = 1) -> Column:
    return F.regexp_extract(c, pattern, group)


def parse_timestamp(c: Column, fmt: str) -> Column:
    return F.to_timestamp(c, fmt)


def parse_duration_ms(c: Column) -> Column:
    """VRL parse_duration(.., "ms") for '<num><unit>' strings."""
    num = F.regexp_extract(c, r"^([0-9.]+)", 1).cast("double")
    unit = F.regexp_extract(c, r"([a-z]+)$", 1)
    factor = (
        F.when(unit == "ns", 1e-6)
        .when(unit == "us", 1e-3)
        .when(unit == "ms", 1.0)
        .when(unit == "s", 1e3)
        .when(unit == "m", 60e3)
        .when(unit == "h", 3600e3)
        .otherwise(F.lit(None))
    )
    return num * factor


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


def parse_syslog(c: Column) -> Column:
    """VRL parse_syslog (RFC3164 subset) → struct."""
    pri = F.regexp_extract(c, SYSLOG_RE, 1).cast("int")
    return F.struct(
        (pri / 8).cast("int").alias("facility"),
        F.pmod(pri, F.lit(8)).alias("severity"),
        F.regexp_extract(c, SYSLOG_RE, 3).alias("hostname"),
        F.regexp_extract(c, SYSLOG_RE, 4).alias("appname"),
        F.regexp_extract(c, SYSLOG_RE, 6).alias("message"),
    )


# ---- registry: VRL name -> Column builder ------------------------------
# Coerce/Convert/Type, String, Timestamp, Array/Map, Codec, Crypto, Number
# categories map ~1:1 onto pyspark.sql.functions; this table is the single
# source of truth used by the remap compiler and the YAML loader.
VRL_FUNCTIONS: dict[str, Callable[..., Column]] = {
    # Parse
    "parse_json": parse_json,
    "parse_key_value": parse_key_value,
    "parse_regex": parse_regex,
    "parse_timestamp": parse_timestamp,
    "parse_duration": parse_duration_ms,
    "parse_apache_log": parse_apache_log,
    "parse_syslog": parse_syslog,
    "parse_csv": lambda c, schema: F.from_csv(c, F.lit(schema)),
    "parse_url": lambda c, part="HOST": F.parse_url(c, F.lit(part)),
    "parse_int": lambda c: c.try_cast("long"),
    "parse_float": lambda c: c.try_cast("double"),
    # Event / Path
    "exists": lambda c: c.isNotNull(),
    "is_null": lambda c: c.isNull(),
    "is_empty": lambda c: F.length(c.cast("string")) == 0,
    # Coerce / Convert / Type — try_cast, not cast: Spark 4 defaults to
    # ANSI mode where a failed cast THROWS; VRL's `to_int!` error contract
    # is "capture the failure", which try_cast's null-on-failure gives us
    # (combined with functions.vrl.fallible to raise the _error flag).
    "to_int": lambda c: c.try_cast("long"),
    "to_float": lambda c: c.try_cast("double"),
    "to_bool": lambda c: c.try_cast("boolean"),
    "to_string": lambda c: c.cast("string"),
    "is_nullish": lambda c: c.isNull() | (F.trim(c.cast("string")) == "") | (c.cast("string") == "-"),
    # String
    "upcase": F.upper,
    "downcase": F.lower,
    "strip_whitespace": F.trim,
    "split": lambda c, sep: F.split(c, sep),
    "replace": lambda c, pat, rep: F.regexp_replace(c, pat, rep),
    "starts_with": lambda c, p: c.startswith(p),
    "ends_with": lambda c, s: c.endswith(s),
    "contains": lambda c, s: c.contains(s),
    "match": lambda c, pat: c.rlike(pat),
    "slice": lambda c, a, b: F.substring(c, a + 1, b - a),
    "truncate": lambda c, n: F.substring(c, 1, n),
    "length": F.length,
    "join": lambda c, sep: F.array_join(c, sep),
    # Timestamp
    "now": F.current_timestamp,
    "format_timestamp": lambda c, fmt: F.date_format(c, fmt),
    "to_unix_timestamp": F.unix_timestamp,
    "from_unix_timestamp": lambda c: F.to_timestamp(F.from_unixtime(c)),
    # Array / Map / Object
    "push": lambda arr, x: F.concat(arr, F.array(x)),
    "flatten": F.flatten,
    "unique": F.array_distinct,
    "merge": lambda a, b: F.map_concat(a, b),
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
    "sha2": lambda c, bits=256: F.sha2(c, bits),
    "crc32": F.crc32,
    "seahash": F.xxhash64,  # stand-in 64-bit fast hash (same role as seahash)
    # Number / Random
    "round": lambda c, n=0: F.round(c, n),
    "floor": F.floor,
    "ceil": F.ceil,
    "abs": F.abs,
    "random_int": lambda lo, hi: (F.rand() * (hi - lo) + lo).cast("long"),
    # IP (no native Spark support; pure-Column arithmetic for v4)
    "ip_aton": lambda c: (
        F.split(c, r"\.")[0].cast("long") * 16777216
        + F.split(c, r"\.")[1].cast("long") * 65536
        + F.split(c, r"\.")[2].cast("long") * 256
        + F.split(c, r"\.")[3].cast("long")
    ),
}


def ip_cidr_contains(cidr: str, ip_col: Column) -> Column:
    """VRL ip_cidr_contains for IPv4 dotted-quad strings, pure Column."""
    base, bits = cidr.split("/")
    bits = int(bits)
    aton = VRL_FUNCTIONS["ip_aton"]
    base_n = sum(int(o) << (8 * (3 - i)) for i, o in enumerate(base.split(".")))
    mask = ((1 << bits) - 1) << (32 - bits) if bits else 0
    return aton(ip_col).cast("long").bitwiseAND(F.lit(mask)) == F.lit(base_n & mask)


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
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERROR|CRIT(?:ICAL)?|FATAL|SEVERE)",
    "UUID": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
}

_GROK_REF = __import__("re").compile(r"%\{(\w+)(?::(\w+))?\}")


def grok_to_regex(pattern: str) -> tuple[str, list[str]]:
    """Expand a grok pattern into (regex, capture_names). `%{SYNTAX:name}`
    becomes a capture group; bare `%{SYNTAX}` is non-capturing."""
    import re as _re

    names: list[str] = []

    def repl(m: "_re.Match[str]") -> str:
        syntax, name = m.group(1), m.group(2)
        if syntax not in GROK_PATTERNS:
            raise ValueError(f"unknown grok pattern %{{{syntax}}}")
        frag = GROK_PATTERNS[syntax]
        if name:
            names.append(name)
            return f"({frag})"
        return f"(?:{frag})"

    return _GROK_REF.sub(repl, pattern), names


def parse_grok(c: Column, pattern: str) -> Column:
    """VRL parse_grok: returns a struct with one field per named capture.
    Compiles ONCE to a regex evaluated JVM-side (regexp_extract) — grok in
    the reference is likewise regex macro expansion, not an interpreter."""
    regex, names = grok_to_regex(pattern)
    if not names:
        raise ValueError("grok pattern has no named captures")
    return F.struct(
        *[
            F.regexp_extract(c, regex, i + 1).alias(name)
            for i, name in enumerate(names)
        ]
    )
