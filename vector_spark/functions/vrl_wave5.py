"""VRL stdlib wave 5 — functions the reference's pinned VRL (git main
@ca05c29, Cargo.lock:13830) gained after the wave-4 snapshot, plus the
older iteration-RFC surface we had not yet covered.

Sources (all public, in the reference checkout):
- `website/content/en/blog/highlights-july-2026.md` new-function table:
  basename / dirname / split_path (vrl#1531-1533), encode_csv
  (vrl#1649), from_entries / to_entries (vrl#1653), haversine
  (vrl#1442), xxhash (vrl#1473), pop (vrl#1501), parse_yaml
  (vrl#1602), http_request (vrl#1360), encrypt_ip / decrypt_ip
  (vrl#1506, the public ipcrypt spec's deterministic mode).
- `website/cue/reference/releases/0.49.0.cue:303` (haversine docs).
- Cargo.lock deps pin `base62` (:2083) and `crc`/`crc-catalog` (:3176)
  — encode/decode_base62 and the parameterized `crc` function.
- `highlights/2022-07-07-0-23-0-upgrade-guide.md` (parse_groks),
  `highlights/2023-01-17-0-27-0-upgrade-guide.md` (object!/array!
  type asserts in iteration examples), the 2022-05-18 iteration RFC
  (for_each — interpreter-first, see vrl_compiler closure note).

House rules: everything Column-expressible is a Catalyst expression;
Python-stdlib-backed ops (yaml, crc, base62, xxhash-spec, ipcrypt/AES)
run as Arrow-batched pandas UDFs — never row-at-a-time Python UDFs.

Merged into `vector_spark.functions.vrl.VRL_FUNCTIONS` at import
(same pattern as vrl_wave4.WAVE4).
"""

from __future__ import annotations

import json
import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType


# ---- Path string functions (vrl#1531-1533) ------------------------------

def basename(c: Column, suffix: str | None = None) -> Column:
    """VRL basename — last path component, Unix `basename(1)` rules:
    trailing slashes are ignored, an all-slash path is "/", an empty
    path stays empty, and an optional `suffix` is stripped when it is
    a proper suffix of the result."""
    norm = F.regexp_replace(c, "/+$", "")
    last = F.element_at(F.split(norm, "/"), -1)
    base = (
        F.when(c == "", F.lit(""))
        .when(norm == "", F.lit("/"))  # "/", "//", ... → "/"
        .otherwise(last)
    )
    if suffix:
        # strip only a PROPER suffix (basename("x.txt", ".txt") → "x",
        # basename(".txt", ".txt") → ".txt" — basename(1) semantics)
        base = F.when(
            base.endswith(suffix) & (F.length(base) > len(suffix)),
            F.substring(base, 1, F.length(base) - len(suffix)),
        ).otherwise(base)
    return base


def dirname(c: Column) -> Column:
    """VRL dirname — Unix `dirname(1)`: path minus its last component;
    "." when there is no slash, "/" when the parent is the root."""
    norm = F.regexp_replace(c, "/+$", "")
    parent = F.regexp_replace(norm, "/+[^/]*$", "")
    return (
        F.when(~norm.contains("/"), F.when(c.startswith("/"), F.lit("/")).otherwise(F.lit(".")))
        .when(parent == "", F.lit("/"))
        .otherwise(parent)
    )


def split_path(c: Column) -> Column:
    """VRL split_path — path components as an array, empty segments
    (leading slash, doubled slashes, trailing slash) dropped."""
    return F.filter(F.split(c, "/"), lambda x: x != "")


# ---- encode_csv (vrl#1649) ----------------------------------------------

def encode_csv(arr: Column, delimiter: str = ",") -> Column:
    """VRL encode_csv — one RFC 4180 record from an array of fields:
    fields containing the delimiter, a double quote, CR, or LF are
    quoted with internal quotes doubled; nulls encode as empty."""
    d = delimiter

    def _field(x: Column) -> Column:
        s = F.coalesce(x.cast("string"), F.lit(""))
        needs = (
            s.contains(d) | s.contains('"') | s.contains("\n") | s.contains("\r")
        )
        return F.when(
            needs, F.concat(F.lit('"'), F.regexp_replace(s, '"', '""'), F.lit('"'))
        ).otherwise(s)

    return F.array_join(F.transform(arr, _field), d)


# ---- Map <-> entries (vrl#1653), pop (vrl#1501) -------------------------

def from_entries(arr: Column) -> Column:
    """VRL from_entries — array of {key, value} objects → object."""
    return F.map_from_entries(arr)


def to_entries(m: Column) -> Column:
    """VRL to_entries — object → array of {key, value} objects."""
    return F.map_entries(m)


def pop(arr: Column) -> Column:
    """VRL pop — the array without its last element (empty stays empty)."""
    return F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0)))


# ---- haversine (vrl#1442, release cue 0.49.0:303) -----------------------

_EARTH_KM = 6371.0
_EARTH_MI = 3958.8


def haversine(
    lat1: Column,
    lon1: Column,
    lat2: Column,
    lon2: Column,
    measurement_system: str = "kilometers",
) -> Column:
    """VRL haversine — great-circle distance and initial bearing
    between two coordinates. Returns {distance, bearing}; bearing in
    degrees clockwise from north, normalized to [0, 360). Radius
    6371.0 km / 3958.8 mi (the standard mean-Earth radius pair; the
    release cue documents distance+bearing, not the constant)."""
    r = _EARTH_MI if str(measurement_system).startswith("mile") else _EARTH_KM
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1)
    dl = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dp / 2), 2) + F.cos(p1) * F.cos(p2) * F.pow(F.sin(dl / 2), 2)
    dist = 2 * r * F.asin(F.sqrt(a))
    bearing = F.degrees(
        F.atan2(
            F.sin(dl) * F.cos(p2),
            F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dl),
        )
    )
    bearing = F.pmod(bearing + 360.0, F.lit(360.0))
    return F.struct(dist.alias("distance"), bearing.alias("bearing"))


# ---- Type asserts: array / object (0.27 upgrade-guide examples) ---------

def _identity_assert(v: Column) -> Column:
    """VRL array!/object! — runtime type asserts. Spark columns are
    statically typed, so the analyzer plays the role of the runtime
    check: a non-array value in an array position fails the plan at
    compile time. The function itself is identity (same stance as
    `string` → cast at vrl.py:1008)."""
    return v


# ---- set / remove: dynamic-path object editing --------------------------

def set_path(value: Column, path: list, data) -> Column:
    """VRL set(value, path, data) for compile-time-literal paths.

    Scope (documented): struct-typed values take arbitrary-depth name
    paths (Column.withField handles dotted nesting); map-typed values
    take single-segment string keys (replace-or-insert). Fully dynamic
    per-row paths are the interpreter's job, not the Column planner's.
    Map dispatch keys off the `_vs_dtype` tag the compiler propagates
    (vrl.py:_tag_dtype); untagged values are treated as structs."""
    if not isinstance(path, (list, tuple)) or not path:
        raise ValueError("set() path must be a non-empty literal array")
    from vector_spark.functions.vrl_compiler import _col_meta

    dcol = data if isinstance(data, Column) else F.lit(data)
    dtype = _col_meta(value, "_vs_dtype", "") or ""
    if dtype.startswith("map"):
        if len(path) != 1:
            raise ValueError("set() on a map value takes a single-key path")
        key = str(path[0])
        out = F.map_concat(
            F.map_filter(value, lambda k, _v: k != key),
            F.create_map(F.lit(key), dcol),
        )
        out._vs_dtype = dtype
        return out
    field = ".".join(str(p) for p in path)
    return value.withField(field, dcol)


def remove_path(value: Column, path: list, compact: bool = False) -> Column:
    """VRL remove(value, path, compact) for compile-time-literal paths.
    Struct values: dropFields (dotted nesting); map values: key filter.
    `compact` (remove now-empty containers) applies to the map form —
    an empty map stays `{}` vs null per the flag."""
    if not isinstance(path, (list, tuple)) or not path:
        raise ValueError("remove() path must be a non-empty literal array")
    from vector_spark.functions.vrl_compiler import _col_meta

    dtype = _col_meta(value, "_vs_dtype", "") or ""
    if dtype.startswith("map"):
        if len(path) != 1:
            raise ValueError("remove() on a map value takes a single-key path")
        key = str(path[0])
        out = F.map_filter(value, lambda k, _v: k != key)
        if compact:
            out = F.when(F.size(out) > 0, out)
        if not compact:
            out._vs_dtype = dtype
        return out
    field = ".".join(str(p) for p in path)
    return value.dropFields(field)


# ---- parse_groks (0.23 upgrade guide) -----------------------------------

def parse_groks(c: Column, patterns: list) -> Column:
    """VRL parse_groks — try each grok pattern in order, first match
    wins. Result struct is the UNION of capture names across patterns
    (non-matching patterns' fields are null/absent), so downstream
    paths resolve regardless of which arm matched."""
    from vector_spark.functions.vrl import grok_to_regex

    if not isinstance(patterns, (list, tuple)) or not patterns:
        raise ValueError("parse_groks takes a non-empty literal pattern array")
    compiled = []  # (regex, {name: group_index})
    order: list[str] = []
    for p in patterns:
        regex, names = grok_to_regex(p)
        compiled.append((regex, dict(names)))
        for name, _gi in names:
            if name not in order:
                order.append(name)
    matched = [c.rlike(regex) for regex, _ in compiled]

    def _field(name: str) -> Column:
        expr = F.lit(None).cast("string")
        # build first-match-wins in reverse so earlier patterns win
        for (regex, names), m in zip(reversed(compiled), reversed(matched)):
            if name in names:
                val = F.nullif(F.regexp_extract(c, regex, names[name]), F.lit(""))
            else:
                val = F.lit(None).cast("string")
            expr = F.when(m, val).otherwise(expr)
        return expr.alias(name)

    return F.struct(*[_field(n) for n in order])


# ---- xxhash (vrl#1473): the SPEC xxHash over the utf-8 bytes ------------

def xxhash(c: Column, variant: str = "xxh64") -> Column:
    """VRL xxhash — XXH32/XXH64 (seed 0) of the value's utf-8 bytes.
    NOTE this is the spec hash (pure-Python impls pinned to the xxHash
    spec vectors in functions/lz4.py and functions/zstd.py) — NOT
    Spark's F.xxhash64, which hashes Spark's typed representation with
    seed 42. Returned as the unsigned decimal in a string (VRL integers
    are i64; XXH64 values overflow them)."""
    v = str(variant).lower().replace("-", "").replace("_", "")
    if v in ("xxh32", "32"):
        from vector_spark.functions.lz4 import _xxh32 as _h

        @pandas_udf(StringType())
        def _xx32(s: pd.Series) -> pd.Series:
            table = {
                v: str(_h(str(v).encode("utf-8")))
                for v in s.dropna().unique()
            }
            return s.map(table)

        return _xx32(c)
    if v not in ("xxh64", "64"):
        raise ValueError(f"xxhash: unknown variant {variant!r}")
    from vector_spark.functions.zstd import xxh64 as _h64

    @pandas_udf(StringType())
    def _xx64(s: pd.Series) -> pd.Series:
        table = {
            v: str(_h64(str(v).encode("utf-8")))
            for v in s.dropna().unique()
        }
        return s.map(table)

    return _xx64(c)


# ---- crc (Cargo.lock crc/crc-catalog) -----------------------------------

# RevEng catalog parameters: (width, poly, init, refin, refout, xorout,
# check-of-"123456789"). The check value doubles as the test pin.
CRC_CATALOG: dict[str, tuple[int, int, int, bool, bool, int, int]] = {
    "CRC-8/SMBUS": (8, 0x07, 0x00, False, False, 0x00, 0xF4),
    "CRC-8/MAXIM-DOW": (8, 0x31, 0x00, True, True, 0x00, 0xA1),
    "CRC-16/ARC": (16, 0x8005, 0x0000, True, True, 0x0000, 0xBB3D),
    "CRC-16/KERMIT": (16, 0x1021, 0x0000, True, True, 0x0000, 0x2189),
    "CRC-16/IBM-3740": (16, 0x1021, 0xFFFF, False, False, 0x0000, 0x29B1),
    "CRC-16/XMODEM": (16, 0x1021, 0x0000, False, False, 0x0000, 0x31C3),
    "CRC-16/MODBUS": (16, 0x8005, 0xFFFF, True, True, 0x0000, 0x4B37),
    "CRC-16/USB": (16, 0x8005, 0xFFFF, True, True, 0xFFFF, 0xB4C8),
    "CRC-16/IBM-SDLC": (16, 0x1021, 0xFFFF, True, True, 0xFFFF, 0x906E),
    "CRC-32/ISO-HDLC": (
        32, 0x04C11DB7, 0xFFFFFFFF, True, True, 0xFFFFFFFF, 0xCBF43926),
    "CRC-32/ISCSI": (
        32, 0x1EDC6F41, 0xFFFFFFFF, True, True, 0xFFFFFFFF, 0xE3069283),
    "CRC-32/BZIP2": (
        32, 0x04C11DB7, 0xFFFFFFFF, False, False, 0xFFFFFFFF, 0xFC891918),
    "CRC-32/MPEG-2": (
        32, 0x04C11DB7, 0xFFFFFFFF, False, False, 0x00000000, 0x0376E6E7),
    "CRC-32/CKSUM": (
        32, 0x04C11DB7, 0x00000000, False, False, 0xFFFFFFFF, 0x765E7680),
    "CRC-32/JAMCRC": (
        32, 0x04C11DB7, 0xFFFFFFFF, True, True, 0x00000000, 0x340BC6D9),
    "CRC-32/AUTOSAR": (
        32, 0xF4ACFB13, 0xFFFFFFFF, True, True, 0xFFFFFFFF, 0x1697D06A),
    "CRC-32/XFER": (
        32, 0x000000AF, 0x00000000, False, False, 0x00000000, 0xBD0BE338),
    "CRC-64/ECMA-182": (
        64, 0x42F0E1EBA9EA3693, 0x0, False, False, 0x0, 0x6C40DF5F0B497347),
    "CRC-64/XZ": (
        64, 0x42F0E1EBA9EA3693, 0xFFFFFFFFFFFFFFFF, True, True,
        0xFFFFFFFFFFFFFFFF, 0x995DC9BBDF1939FA),
    "CRC-64/NVME": (
        64, 0xAD93D23594C93659, 0xFFFFFFFFFFFFFFFF, True, True,
        0xFFFFFFFFFFFFFFFF, 0xAE8B14860A799888),
}

# Aliases the crc-catalog crate / common usage accept for the same entry.
_CRC_ALIASES = {
    "CRC-32": "CRC-32/ISO-HDLC",
    "CRC-32/ADCCP": "CRC-32/ISO-HDLC",
    "CRC-32/PKZIP": "CRC-32/ISO-HDLC",
    "CRC-32C": "CRC-32/ISCSI",
    "CRC-32/CASTAGNOLI": "CRC-32/ISCSI",
    "CRC-16/CCITT": "CRC-16/KERMIT",
    "CRC-16/CCITT-FALSE": "CRC-16/IBM-3740",
    "CRC-16/X-25": "CRC-16/IBM-SDLC",
    "CRC-8": "CRC-8/SMBUS",
    "CRC-8/MAXIM": "CRC-8/MAXIM-DOW",
    "CRC-64": "CRC-64/ECMA-182",
    "CRC-64/GO-ISO": "CRC-64/XZ",
}


def _crc_normalize(name: str) -> str:
    key = str(name).upper().replace("_", "-").replace("CRC-", "CRC-", 1)
    # crc-catalog crate constant style: CRC_32_ISO_HDLC → CRC-32/ISO-HDLC
    if "/" not in key and key.count("-") >= 2:
        head, rest = key.split("-", 2)[0:2], key.split("-", 2)[2]
        key = f"{head[0]}-{head[1]}/{rest}"
    key = _CRC_ALIASES.get(key, key)
    if key not in CRC_CATALOG:
        raise ValueError(
            f"crc: unknown algorithm {name!r} (see CRC_CATALOG for the "
            f"supported RevEng names)"
        )
    return key


def _reflect(v: int, width: int) -> int:
    out = 0
    for _ in range(width):
        out = (out << 1) | (v & 1)
        v >>= 1
    return out


def _crc_table(poly: int, width: int, refin: bool) -> list[int]:
    """Standard byte-at-a-time table. Reflected algorithms use the
    reversed polynomial with right-shifts (equivalent to reflecting
    every input byte, per the RevEng model)."""
    mask = (1 << width) - 1
    table = []
    if refin:
        rpoly = _reflect(poly, width)
        for b in range(256):
            crc = b
            for _ in range(8):
                crc = (crc >> 1) ^ rpoly if crc & 1 else crc >> 1
            table.append(crc & mask)
    else:
        top = 1 << (width - 1)
        for b in range(256):
            crc = b << (width - 8) if width >= 8 else b
            for _ in range(8):
                crc = ((crc << 1) ^ poly) if crc & top else crc << 1
            table.append(crc & mask)
    return table


_CRC_TABLES: dict[str, list[int]] = {}


def crc_bytes(data: bytes, algorithm: str = "CRC-32/ISO-HDLC") -> int:
    """Compute the named catalog CRC of `data` (RevEng parameter model)."""
    key = _crc_normalize(algorithm)
    width, poly, init, refin, refout, xorout, _check = CRC_CATALOG[key]
    mask = (1 << width) - 1
    table = _CRC_TABLES.get(key)
    if table is None:
        table = _CRC_TABLES[key] = _crc_table(poly, width, refin)
    if refin:
        crc = _reflect(init, width)
        for byte in data:
            crc = (crc >> 8) ^ table[(crc ^ byte) & 0xFF]
    else:
        crc = init
        shift = width - 8
        for byte in data:
            crc = ((crc << 8) ^ table[((crc >> shift) ^ byte) & 0xFF]) & mask
    if refin != refout:
        crc = _reflect(crc, width)
    return (crc ^ xorout) & mask


def crc(c: Column, algorithm: str = "CRC-32/ISO-HDLC") -> Column:
    """VRL crc — parameterized checksum over the utf-8 bytes; the
    algorithm enum mirrors the crc-catalog crate the pinned VRL
    depends on (Cargo.lock:3176). Returned as the unsigned decimal in
    a string (CRC-64 values overflow VRL's i64)."""
    key = _crc_normalize(algorithm)

    @pandas_udf(StringType())
    def _crc(s: pd.Series) -> pd.Series:
        # low-cardinality columns (enums, tags) dominate real usage:
        # hash each distinct value once per batch, then dict-map
        table = {
            v: str(crc_bytes(str(v).encode("utf-8"), key))
            for v in s.dropna().unique()
        }
        return s.map(table)

    return _crc(c)


# ---- base62 (Cargo.lock:2083) -------------------------------------------

_B62 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
_B62_INDEX = {ch: i for i, ch in enumerate(_B62)}


def b62_encode(data: bytes) -> str:
    """Bytes → base62 (0-9A-Za-z, the base62 crate's standard alphabet)
    of the big-endian integer; leading zero bytes are preserved as one
    leading '0' digit each so decode is exact (documented convention —
    the crate encodes integers, which have no leading zeros)."""
    zeros = 0
    for byte in data:
        if byte:
            break
        zeros += 1
    n = int.from_bytes(data, "big")
    if n == 0:
        return "0" * max(zeros, 1) if data else ""
    digits = []
    while n:
        n, r = divmod(n, 62)
        digits.append(_B62[r])
    return "0" * zeros + "".join(reversed(digits))


def b62_decode(text: str) -> bytes:
    if text == "":
        return b""
    zeros = 0
    for ch in text:
        if ch != "0":
            break
        zeros += 1
    n = 0
    for ch in text[zeros:]:
        try:
            n = n * 62 + _B62_INDEX[ch]
        except KeyError:
            raise ValueError(f"decode_base62: invalid character {ch!r}")
    body = n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""
    return b"\x00" * zeros + body


def encode_base62(c: Column) -> Column:
    @pandas_udf(StringType())
    def _enc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: None if x is None else b62_encode(
                x if isinstance(x, (bytes, bytearray)) else str(x).encode("utf-8")
            )
        )

    return _enc(c)


def decode_base62(c: Column) -> Column:
    @pandas_udf(StringType())
    def _dec(s: pd.Series) -> pd.Series:
        def one(x):
            if x is None:
                return None
            try:
                return b62_decode(str(x)).decode("utf-8", errors="replace")
            except ValueError:
                return None  # fallibility signal, same stance as parse_json

        return s.map(one)

    return _dec(c)


# ---- parse_yaml (vrl#1602) ----------------------------------------------

def parse_yaml(c: Column, schema: str | None = None) -> Column:
    """VRL parse_yaml — YAML document → object. Same dynamic-object
    contract as parse_json (vrl.py:32): schema-less returns the
    equivalent JSON text validated (invalid YAML → null, the
    fallibility signal); with a schema → typed struct via from_json."""

    @pandas_udf(StringType())
    def _to_json(s: pd.Series) -> pd.Series:
        import yaml

        def one(x):
            if x is None:
                return None
            try:
                return json.dumps(yaml.safe_load(str(x)))
            except Exception:
                return None

        return s.map(one)

    as_json = _to_json(c)
    if schema:
        return F.from_json(as_json, schema)
    return as_json


# ---- http_request (vrl#1360): network opt-in, dns_lookup stance ---------

def http_request(
    url: Column,
    method: str = "GET",
    headers: dict | None = None,
    body: str | None = None,
    allow_network: bool = False,
) -> Column:
    """VRL http_request — requires allow_network=True: a per-event HTTP
    call is a live network dependency inside a transform (same opt-in
    stance as dns_lookup, vrl_wave4.py:784; prefer an enrichment
    source). With the opt-in, executes per Arrow batch via urllib and
    returns {status, body}."""
    if not allow_network:
        raise NotImplementedError(
            "VRL http_request performs live network calls; pass "
            "allow_network=True to opt in (prefer an http enrichment "
            "source for anything cacheable)."
        )

    hdrs = dict(headers or {})

    @pandas_udf(StringType())
    def _req(s: pd.Series) -> pd.Series:
        import urllib.request

        def one(u):
            if u is None:
                return None
            req = urllib.request.Request(
                str(u),
                data=body.encode() if body is not None else None,
                headers=hdrs,
                method=method,
            )
            try:
                with urllib.request.urlopen(req, timeout=10) as resp:
                    return json.dumps(
                        {"status": resp.status,
                         "body": resp.read().decode("utf-8", "replace")}
                    )
            except Exception as exc:  # fallibility signal
                return json.dumps({"status": 0, "body": str(exc)})

        return s.map(one)

    return _req(url)


# ---- encrypt_ip / decrypt_ip (vrl#1506; ipcrypt deterministic) ----------

def _ip_to_16(ip: str) -> bytes:
    import ipaddress

    addr = ipaddress.ip_address(ip)
    if addr.version == 4:
        return b"\x00" * 10 + b"\xff\xff" + addr.packed
    return addr.packed


def _ip_from_16(block: bytes) -> str:
    import ipaddress

    addr = ipaddress.IPv6Address(block)
    v4 = addr.ipv4_mapped
    return str(v4) if v4 is not None else str(addr)


def _ipcrypt_key(key) -> bytes:
    if isinstance(key, (bytes, bytearray)):
        kb = bytes(key)
    else:
        ks = str(key)
        kb = bytes.fromhex(ks) if len(ks) == 32 else ks.encode("utf-8")
    if len(kb) != 16:
        raise ValueError("encrypt_ip: key must be 16 bytes (or 32 hex chars)")
    return kb


def encrypt_ip(c: Column, key) -> Column:
    """VRL encrypt_ip — the public ipcrypt spec's DETERMINISTIC mode:
    the IP's 16-byte form (IPv4 → IPv4-mapped IPv6) is a single
    AES-128 block under the 16-byte key; the ciphertext block renders
    as an IPv6 address. Deterministic by design (same ip+key → same
    token, joinable); the spec's nd modes add a tweak and are not
    address-shaped, so the deterministic mode is the one a pipeline
    column wants."""
    kb = _ipcrypt_key(key)

    @pandas_udf(StringType())
    def _enc(s: pd.Series) -> pd.Series:
        from cryptography.hazmat.primitives.ciphers import (
            Cipher, algorithms, modes)

        enc = Cipher(algorithms.AES(kb), modes.ECB()).encryptor()

        def one(x):
            if x is None:
                return None
            try:
                block = _ip_to_16(str(x))
            except ValueError:
                return None
            return _ip_from_16(enc.update(block))

        return s.map(one)

    return _enc(c)


def decrypt_ip(c: Column, key) -> Column:
    """Inverse of encrypt_ip (AES-128 decrypt of the address block)."""
    kb = _ipcrypt_key(key)

    @pandas_udf(StringType())
    def _dec(s: pd.Series) -> pd.Series:
        from cryptography.hazmat.primitives.ciphers import (
            Cipher, algorithms, modes)

        dec = Cipher(algorithms.AES(kb), modes.ECB()).decryptor()

        def one(x):
            if x is None:
                return None
            try:
                block = _ip_to_16(str(x))
            except ValueError:
                return None
            return _ip_from_16(dec.update(block))

        return s.map(one)

    return _dec(c)


# ---- validate_json_schema (Cargo.lock pins the jsonschema crate) --------

_FORMAT_RES = {
    "date-time": r"^\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}:\d{2}(\.\d+)?"
                 r"([Zz]|[+-]\d{2}:\d{2})?$",
    "date": r"^\d{4}-\d{2}-\d{2}$",
    "time": r"^\d{2}:\d{2}:\d{2}(\.\d+)?([Zz]|[+-]\d{2}:\d{2})?$",
    "email": r"^[^@\s]+@[^@\s]+\.[^@\s]+$",
    "ipv4": r"^(\d{1,3}\.){3}\d{1,3}$",
    "ipv6": r"^[0-9a-fA-F:]+$",
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
            r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "hostname": r"^[A-Za-z0-9]([A-Za-z0-9-]*[A-Za-z0-9])?"
                r"(\.[A-Za-z0-9]([A-Za-z0-9-]*[A-Za-z0-9])?)*$",
    "uri": r"^[A-Za-z][A-Za-z0-9+.-]*:",
}


def _js_type(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    return "object"


def _js_valid(v, schema, root, ignore_unknown_formats) -> bool:
    """Clean-room JSON Schema core-keyword evaluator (draft 2020-12
    subset: the keywords the reference's jsonschema-crate usage hits —
    type/enum/const, object/array/string/number constraints, the
    combinators, local $ref). True booleans are schemas too."""
    import re as _re

    if schema is True or schema == {}:
        return True
    if schema is False:
        return False
    if "$ref" in schema:
        ref = schema["$ref"]
        if not ref.startswith("#"):
            raise ValueError(
                f"validate_json_schema: only local $ref supported ({ref!r})")
        target = root
        for seg in ref.lstrip("#/").split("/"):
            if seg:
                target = target[seg.replace("~1", "/").replace("~0", "~")]
        return _js_valid(v, target, root, ignore_unknown_formats)

    t = schema.get("type")
    if t is not None:
        allowed = t if isinstance(t, list) else [t]
        jt = _js_type(v)
        if jt == "integer" and "number" in allowed:
            pass
        elif jt == "number" and isinstance(v, float) and v.is_integer() \
                and "integer" in allowed:
            pass
        elif jt not in allowed:
            return False
    if "enum" in schema and v not in schema["enum"]:
        return False
    if "const" in schema and v != schema["const"]:
        return False

    if isinstance(v, str):
        if "minLength" in schema and len(v) < schema["minLength"]:
            return False
        if "maxLength" in schema and len(v) > schema["maxLength"]:
            return False
        if "pattern" in schema and not _re.search(schema["pattern"], v):
            return False
        if "format" in schema:
            fre = _FORMAT_RES.get(schema["format"])
            if fre is None:
                if not ignore_unknown_formats and schema["format"] not in (
                        "regex",):
                    return False
            elif not _re.match(fre, v):
                return False

    if isinstance(v, (int, float)) and not isinstance(v, bool):
        if "minimum" in schema and v < schema["minimum"]:
            return False
        if "maximum" in schema and v > schema["maximum"]:
            return False
        if "exclusiveMinimum" in schema and v <= schema["exclusiveMinimum"]:
            return False
        if "exclusiveMaximum" in schema and v >= schema["exclusiveMaximum"]:
            return False
        if "multipleOf" in schema:
            q = v / schema["multipleOf"]
            if abs(q - round(q)) > 1e-9:
                return False

    if isinstance(v, list):
        if "minItems" in schema and len(v) < schema["minItems"]:
            return False
        if "maxItems" in schema and len(v) > schema["maxItems"]:
            return False
        if schema.get("uniqueItems"):
            seen = [json.dumps(x, sort_keys=True) for x in v]
            if len(set(seen)) != len(seen):
                return False
        prefix = schema.get("prefixItems", [])
        for i, item in enumerate(v):
            sub = prefix[i] if i < len(prefix) else schema.get("items")
            if sub is not None and not _js_valid(
                    item, sub, root, ignore_unknown_formats):
                return False

    if isinstance(v, dict):
        for req in schema.get("required", []):
            if req not in v:
                return False
        if "minProperties" in schema and len(v) < schema["minProperties"]:
            return False
        if "maxProperties" in schema and len(v) > schema["maxProperties"]:
            return False
        props = schema.get("properties", {})
        pprops = schema.get("patternProperties", {})
        addl = schema.get("additionalProperties")
        for key, val in v.items():
            matched = False
            if key in props:
                matched = True
                if not _js_valid(val, props[key], root,
                                 ignore_unknown_formats):
                    return False
            for pat, sub in pprops.items():
                if _re.search(pat, key):
                    matched = True
                    if not _js_valid(val, sub, root, ignore_unknown_formats):
                        return False
            if not matched and addl is not None:
                if addl is False:
                    return False
                if addl is not True and not _js_valid(
                        val, addl, root, ignore_unknown_formats):
                    return False

    for sub in schema.get("allOf", []):
        if not _js_valid(v, sub, root, ignore_unknown_formats):
            return False
    if "anyOf" in schema:
        if not any(_js_valid(v, s, root, ignore_unknown_formats)
                   for s in schema["anyOf"]):
            return False
    if "oneOf" in schema:
        hits = sum(bool(_js_valid(v, s, root, ignore_unknown_formats))
                   for s in schema["oneOf"])
        if hits != 1:
            return False
    if "not" in schema:
        if _js_valid(v, schema["not"], root, ignore_unknown_formats):
            return False
    return True


def validate_json_schema(
    c: Column, schema_definition: str, ignore_unknown_formats: bool = False
) -> Column:
    """VRL validate_json_schema — validate a JSON document against the
    schema FILE at `schema_definition` (the VRL signature: schemas are
    compiled once, here at plan-build time on the driver, and the
    compiled form is closure-captured — executors never touch the
    file). Returns true when valid, null when invalid or not JSON
    (the fallibility signal: `validate_json_schema!` errors, `?? false`
    degrades), matching the parse_json stance at vrl.py:32."""
    with open(schema_definition, "r", encoding="utf-8") as fh:
        schema = json.load(fh)

    from pyspark.sql.types import BooleanType

    @pandas_udf(BooleanType())
    def _check(s: pd.Series) -> pd.Series:
        def one(x):
            if x is None:
                return None
            try:
                doc = json.loads(str(x))
            except ValueError:
                return None
            return (
                True
                if _js_valid(doc, schema, schema, ignore_unknown_formats)
                else None
            )

        return s.map(one)

    return _check(c)


# ---- replace_with (closure regex replace, iteration RFC family) --------

def replace_with(c: Column, pattern: str, *rest, count: int = -1) -> Column:
    """VRL replace_with — regex replace where each match is rewritten
    by the closure `|match| { ... }`; the match object carries
    `.string` (whole match) and `.captures` (capture-group array).

    Column plan (no Python in the row path): split the value on the
    pattern (the between-match pieces), extract every match and its
    groups with regexp_extract_all, rewrite matches via the closure
    INSIDE `transform` (one plan, whole-stage codegen), and stitch
    pieces and rewrites back together with `aggregate`. Zero-width
    matches are out of scope (split and extract_all disagree on them;
    loud here, same stance as the reference's regex fullmatch notes)."""
    import re as _re

    closure = None
    for r in rest:
        if callable(r):
            closure = r
        elif isinstance(r, (int, float)):
            count = int(r)
    if closure is None:
        raise ValueError("replace_with requires a closure: -> |match| { … }")
    if not isinstance(pattern, str) or pattern == "":
        raise ValueError("replace_with pattern must be a literal regex")
    try:
        ngroups = _re.compile(pattern).groups
    except _re.error:
        ngroups = 0  # Java-only syntax: assume no capture groups

    parts = F.split(c, pattern, -1)
    whole = F.regexp_extract_all(c, F.lit(pattern), 0)
    caps = [
        F.regexp_extract_all(c, F.lit(pattern), g)
        for g in range(1, ngroups + 1)
    ]

    def _one(x: Column, i: Column) -> Column:
        cap_arr = (
            F.array(*[F.element_at(cc, i + 1) for cc in caps])
            if caps
            else F.array().cast("array<string>")
        )
        rewritten = closure(
            F.struct(x.alias("string"), cap_arr.alias("captures"))
        ).cast("string")
        if count >= 0:
            return F.when(i < count, rewritten).otherwise(x)
        return rewritten

    replaced = F.transform(whole, _one)
    n = F.size(replaced)
    stitched = F.aggregate(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        F.element_at(parts, 1),
        lambda acc, i: F.concat(
            acc, F.element_at(replaced, i), F.element_at(parts, i + 1)
        ),
    )
    return F.when(n == 0, c).otherwise(stitched)


WAVE5 = {
    "replace_with": replace_with,
    "validate_json_schema": validate_json_schema,
    "basename": basename,
    "dirname": dirname,
    "split_path": split_path,
    "encode_csv": encode_csv,
    "from_entries": from_entries,
    "to_entries": to_entries,
    "pop": pop,
    "haversine": haversine,
    "array": _identity_assert,
    "object": _identity_assert,
    "set": set_path,
    "remove": remove_path,
    "parse_groks": parse_groks,
    "xxhash": xxhash,
    "crc": crc,
    "encode_base62": encode_base62,
    "decode_base62": decode_base62,
    "parse_yaml": parse_yaml,
    "http_request": http_request,
    "encrypt_ip": encrypt_ip,
    "decrypt_ip": decrypt_ip,
}
