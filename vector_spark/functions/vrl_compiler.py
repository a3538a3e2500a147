"""VRL-subset program compiler: VRL source text → remap Assignments.

The reference compiles a VRL program once per transform
(`src/transforms/remap.rs:461`, `RemapConfig::build`) and interprets it
per event. We compile ONCE to Catalyst Column expressions instead — the
program becomes part of the query plan (codegen, pushdown), with zero
per-row interpretation (SURVEY §3.3 "Spark equivalent").

Supported surface (the expression forms from
`website/cue/reference/remap/expressions/` that are straight-line):

  statements:   .path = expr        assignment
                .path = fn!(args)   fallible assignment (error → _error)
                del(.path)          field removal
  expressions:  .path               field access (nested: .a.b → col a.b)
                literals            "str" 'str' 123 4.5 true false null
                arithmetic          + - * / %
                comparison          == != < <= > >=
                logical             && || !expr
                coalesce            a ?? b
                if cond { e } else { e }   (expression form → CASE WHEN)
                fn(args) / fn!(args)       calls into VRL_FUNCTIONS
                ( expr )            grouping
                string concat       + on strings (maps to concat)

Out of scope (documented): loops/closures (VRL has none), runtime path
indexing, abort, metadata paths (%...), dynamic paths. Programs beyond
the subset raise VrlCompileError — callers fall back to a
scripted_transform (pandas) interpreter path, mirroring the reference's
"compile error at config time" behavior.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_spark.functions.vrl import VRL_FUNCTIONS
from vector_spark.operators.remap import Assignment


class VrlCompileError(ValueError):
    pass


_UNI_ESC = re.compile(r"\\u\{([^}]*)\}")


def _unescape_str(body: str) -> str:
    """Decode a VRL string-literal body: \\" \\' \\\\ plus \\n \\t \\r
    and the `\\u{HEX}` Unicode escape (highlights-july-2026.md §Syntax).
    Invalid \\u sequences (empty braces, non-hex, surrogates, above
    U+10FFFF) are COMPILE errors, matching the release note."""

    def _uni(m: re.Match) -> str:
        hexpart = m.group(1)
        if not hexpart:
            raise VrlCompileError("empty \\u{} escape in string literal")
        try:
            cp = int(hexpart, 16)
        except ValueError:
            raise VrlCompileError(
                f"invalid \\u{{{hexpart}}} escape: non-hex digits")
        if 0xD800 <= cp <= 0xDFFF:
            raise VrlCompileError(
                f"invalid \\u{{{hexpart}}} escape: surrogate codepoint")
        if cp > 0x10FFFF:
            raise VrlCompileError(
                f"invalid \\u{{{hexpart}}} escape: above U+10FFFF")
        return chr(cp)

    out = []
    i, n = 0, len(body)
    while i < n:
        ch = body[i]
        if ch != "\\" or i + 1 >= n:
            out.append(ch)
            i += 1
            continue
        nxt = body[i + 1]
        if nxt == "u" and i + 2 < n and body[i + 2] == "{":
            m = _UNI_ESC.match(body, i)
            if not m:
                raise VrlCompileError("unterminated \\u{ escape")
            out.append(_uni(m))
            i = m.end()
            continue
        mapped = {'"': '"', "'": "'", "\\": "\\", "n": "\n", "t": "\t",
                  "r": "\r", "0": "\0", "{": "{", "}": "}"}.get(nxt)
        if mapped is None:
            # unknown escape: preserve verbatim (regex-ish literals ride
            # through config strings; loud failure would break them)
            out.append(ch)
            out.append(nxt)
        else:
            out.append(mapped)
        i += 2
    return "".join(out)


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<float>\d+\.\d+)
  | (?P<int>\d+)
  | (?P<regex>r'(?:[^'\\]|\\.)*')
  | (?P<dqstr>"(?:[^"\\]|\\.)*")
  | (?P<sqstr>'(?:[^'\\]|\\.)*')
  | (?P<path>\.(?:[A-Za-z_]\w*|"(?:[^"\\]|\\.)*")
       (?:\.(?:[A-Za-z_]\w*|"(?:[^"\\]|\\.)*")|\[\d+\])*)
  | (?P<dot>\.)
  | (?P<mpath>%[A-Za-z_][\w.]*)
  | (?P<name>[A-Za-z_]\w*)
  | (?P<op>\?\?|==|!=|<=|>=|&&|\|\||->|[-+*/%<>=!(){},:\[\]|;])
    """,
    re.VERBOSE,
)

_KEYWORDS = {"if", "else", "true", "false", "null", "del", "abort"}


class RegexLiteral(str):
    """VRL `r'...'` — a pattern string, valid only as a function argument."""


def _meta_col_name(mpath_text: str) -> str:
    """Metadata path `%vector.source_type` → envelope column
    `_meta_vector_source_type` (SURVEY §1.6: vector's metadata namespace
    maps to prefixed envelope columns — flat so it stays assignable)."""
    return "_meta_" + mpath_text[1:].replace(".", "_")


_PLAIN_SEG = re.compile(r"[A-Za-z_]\w*$")


def _path_segments(text: str) -> list[str | int]:
    """`.a."b.c"[0].d` → ['a', 'b.c', 0, 'd'] — quoted segments are field
    names that may contain dots (VRL quoted-path syntax); ints are array
    indices."""
    body = text[1:] if text.startswith(".") else text
    segs: list[str | int] = []
    for m in re.finditer(r'"((?:[^"\\]|\\.)*)"|([A-Za-z_]\w*)|\[(\d+)\]', body):
        q, n, i = m.groups()
        if q is not None:
            segs.append(q.replace(r"\"", '"').replace(r"\\", "\\"))
        elif n is not None:
            segs.append(n)
        else:
            segs.append(int(i))
    return segs


def _quote_seg(s: str) -> str:
    return s if _PLAIN_SEG.match(s) else f"`{s}`"


def _path_col(text: str) -> Column:
    """`.a.b[0].c` → F.col('a.b').getItem(0).getField('c'). The dotted
    prefix stays one name (struct access resolves naturally, quoted
    segments backtick-escape); indices and post-index fields become
    getItem/getField chains."""
    segs = _path_segments(text)
    parts: list[str] = []
    i = 0
    while i < len(segs) and isinstance(segs[i], str):
        parts.append(_quote_seg(segs[i]))
        i += 1
    col = F.col(".".join(parts))
    for s in segs[i:]:
        # F.get, not getItem: ANSI mode throws on out-of-bounds index, but
        # VRL path access on a missing element is null (then `exists` etc.)
        col = F.get(col, s) if isinstance(s, int) else col.getField(s)
    return col


def _col_meta(col, name: str, default=None):
    """Read compiler-attached metadata off a Column SAFELY: pyspark's
    Column.__getattr__ resolves ANY attribute name as a field-access
    Column, so hasattr()/getattr() always 'succeed' — only attributes
    explicitly set land in __dict__."""
    d = getattr(col, "__dict__", None)
    return d.get(name, default) if isinstance(d, dict) else default


def _split_toplevel(inner: str) -> list[str]:
    """split a simpleString type list on top-level commas (depth-counted
    so nested angle brackets don't split)."""
    parts: list[str] = []
    depth = 0
    start = 0
    for i, ch in enumerate(inner + ","):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(inner[start:i])
            start = i + 1
    return parts


def _struct_fields(dtype: str) -> dict[str, str]:
    """top-level name→dtype map from a simpleString struct dtype, e.g.
    'struct<a:string,b:struct<c:int>>' → {'a':'string','b':'struct<c:int>'}."""
    if not dtype.startswith("struct<") or not dtype.endswith(">"):
        return {}
    out: dict[str, str] = {}
    for part in _split_toplevel(dtype[len("struct<"):-1]):
        if ":" in part:
            k, v = part.split(":", 1)
            out[k.strip()] = v.strip()
    return out


def _struct_field_names(dtype: str) -> list[str]:
    return list(_struct_fields(dtype))


def _canon_by_dtype(col, dtype: str | None):
    """Recursively key-sort a struct/map column per its simpleString
    dtype so to_json serialization is order-canonical at EVERY depth —
    VRL object equality is fully structural, so `.parts == {...}` must
    ignore key order in nested sub-objects too, not just at the top
    level. Arrays keep element order (VRL lists are ordered) but each
    element object is canonicalized."""
    if dtype is None:
        return col
    if dtype.startswith("map<") and dtype.endswith(">"):
        parts = _split_toplevel(dtype[len("map<"):-1])
        vt = parts[1].strip() if len(parts) == 2 else None
        entries = F.transform(
            F.map_entries(col),
            lambda e: F.struct(
                e["key"].alias("key"),
                _canon_by_dtype(e["value"], vt).alias("value"),
            ),
        )
        return F.map_from_entries(F.array_sort(entries))
    if dtype.startswith("struct<"):
        flds = _struct_fields(dtype)
        if not flds:
            return col
        return F.struct(
            *[_canon_by_dtype(col[n], flds[n]).alias(n) for n in sorted(flds)]
        )
    if dtype.startswith("array<") and dtype.endswith(">"):
        et = dtype[len("array<"):-1].strip()
        if et.startswith(("struct<", "map<", "array<")):
            return F.transform(col, lambda x: _canon_by_dtype(x, et))
    return col


def _nested_dtype(dtype: str | None, segs: list) -> str | None:
    """dtype of a path INTO a simpleString dtype: struct fields by name,
    map value type for string keys, array element for int indices.
    None whenever a hop can't be resolved."""
    for s in segs:
        if dtype is None:
            return None
        if isinstance(s, int):
            if dtype.startswith("array<") and dtype.endswith(">"):
                dtype = dtype[len("array<"):-1]
            else:
                return None
        elif dtype.startswith("struct<"):
            dtype = _struct_fields(dtype).get(s)
        elif dtype.startswith("map<") and dtype.endswith(">"):
            parts = _split_toplevel(dtype[len("map<"):-1])
            dtype = parts[1].strip() if len(parts) == 2 else None
        else:
            return None
    return dtype


@dataclass
class _Tok:
    kind: str
    text: str
    # char offsets into the program source — VRL diagnostics cite call
    # spans as (start:end) byte offsets (the reference's Span), so error
    # messages can reproduce them exactly
    pos: int = -1
    end: int = -1


def _lex(src: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise VrlCompileError(f"lex error at: {src[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append(_Tok(kind, m.group(), m.start(), m.end()))
    return toks


def _serde_json_error(s: str) -> str | None:
    """serde_json-compatible diagnostic for an invalid JSON string, or
    None when valid. VRL's parse_json error text embeds serde_json's
    message verbatim (`unable to parse json: <serde msg>`), and the
    reference's behavior corpus asserts those exact strings — this is a
    from-scratch emulator of serde_json's public Display format
    (`<code> at line L column C`; columns are 1-based bytes-into-line,
    EOF errors report bytes-consumed). Covers the common error codes;
    unusual inputs may produce a close-but-inexact message."""
    import json as _json

    try:
        _json.loads(s)
        return None
    except Exception:
        pass

    b, n = s, len(s)

    class _E(Exception):
        pass

    def at(code: str, pos: int) -> str:
        line = b.count("\n", 0, pos) + 1
        col = pos - (b.rfind("\n", 0, pos) + 1) + 1
        return f"{code} at line {line} column {col}"

    def eof(code: str) -> str:
        line = b.count("\n") + 1
        col = n - (b.rfind("\n") + 1)
        return f"{code} at line {line} column {col}"

    i = 0

    def skip_ws() -> None:
        nonlocal i
        while i < n and b[i] in " \t\n\r":
            i += 1

    def parse_str() -> None:
        nonlocal i
        i += 1  # opening quote
        while i < n:
            c = b[i]
            if c == '"':
                i += 1
                return
            if c == "\\":
                i += 2
                continue
            if ord(c) < 0x20:
                raise _E(at(
                    "control character (\\u0000-\\u001F) found while parsing a string",
                    i,
                ))
            i += 1
        raise _E(eof("EOF while parsing a string"))

    _NUM = re.compile(r"-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][+-]?\d+)?")

    def parse_value() -> None:
        nonlocal i
        skip_ws()
        if i >= n:
            raise _E(eof("EOF while parsing a value"))
        c = b[i]
        if c == "{":
            parse_object()
        elif c == "[":
            parse_array()
        elif c == '"':
            parse_str()
        elif c == "-" or c.isdigit():
            m = _NUM.match(b, i)
            if not m or m.end() == i:
                raise _E(at("invalid number", i))
            i = m.end()
        elif b.startswith("true", i):
            i += 4
        elif b.startswith("false", i):
            i += 5
        elif b.startswith("null", i):
            i += 4
        else:
            raise _E(at("expected value", i))

    def parse_object() -> None:
        nonlocal i
        i += 1  # {
        skip_ws()
        if i >= n:
            raise _E(eof("EOF while parsing an object"))
        if b[i] == "}":
            i += 1
            return
        while True:
            skip_ws()
            if i >= n:
                raise _E(eof("EOF while parsing an object"))
            if b[i] == "}":
                raise _E(at("trailing comma", i))
            if b[i] != '"':
                raise _E(at("key must be a string", i))
            parse_str()
            skip_ws()
            if i >= n:
                raise _E(eof("EOF while parsing an object"))
            if b[i] != ":":
                raise _E(at("expected `:`", i))
            i += 1
            parse_value()
            skip_ws()
            if i >= n:
                raise _E(eof("EOF while parsing an object"))
            if b[i] == ",":
                i += 1
                continue
            if b[i] == "}":
                i += 1
                return
            raise _E(at("expected `,` or `}`", i))

    def parse_array() -> None:
        nonlocal i
        i += 1  # [
        skip_ws()
        if i >= n:
            raise _E(eof("EOF while parsing a list"))
        if b[i] == "]":
            i += 1
            return
        while True:
            skip_ws()
            if i < n and b[i] == "]":
                raise _E(at("trailing comma", i))
            parse_value()
            skip_ws()
            if i >= n:
                raise _E(eof("EOF while parsing a list"))
            if b[i] == ",":
                i += 1
                continue
            if b[i] == "]":
                i += 1
                return
            raise _E(at("expected `,` or `]`", i))

    try:
        parse_value()
        skip_ws()
        if i < n:
            raise _E(at("trailing characters", i))
    except _E as e:
        return str(e)
    except RecursionError:
        # pathologically deep nesting (1000+ brackets): the emulator
        # cannot produce the exact serde message — drop the exact-detail
        # path (None ⇒ caller falls back to the generic diagnostic)
        # rather than crash the compile.
        return None
    return "expected value at line 1 column 1"


# fns whose first positional parameter is a config string/number, not the
# event-value operand (string literals stay python values for these)
_LITERAL_FIRST_ARG_FNS = {
    "get_env_var", "ip_cidr_contains", "random_int", "get_secret",
    "match_datadog_query", "tag_types_externally",
    # internal-metrics functions: every arg is driver-side config
    # (metric names / aggregation fn), never a per-row value
    "get_vector_metric", "find_vector_metrics", "aggregate_vector_metrics",
}

_TIMESTAMP_FNS = {
    "now", "parse_timestamp", "from_unix_timestamp", "to_timestamp",
}

_STRING_FNS = {
    "upcase", "downcase", "strip_whitespace", "to_string", "string",
    "truncate", "slice", "replace", "join", "format_timestamp",
    "encode_base64", "decode_base64", "encode_json", "md5", "sha1", "sha2",
    "parse_regex", "snakecase", "camelcase", "strip_ansi_escape_codes",
    "ip_subnet", "ip_to_ipv6", "ipv6_to_ipv4", "ip_ntoa", "format_number",
    "uuid_v4", "uuid_v7", "get_hostname", "hmac",
}


class _P:
    """Recursive-descent parser producing Column expressions directly."""

    def __init__(
        self,
        toks: list[_Tok],
        vars: dict[str, Column] | None = None,
        known_cols: set[str] | None = None,
        known_dtypes: dict[str, str] | None = None,
    ):
        self.toks = toks
        self.i = 0
        # None = schema-unknown (legacy callers): reads compile to F.col
        # and missing columns fail analysis. A set = VRL semantics: a
        # read of an absent field is null, not an error.
        self.known_cols = known_cols
        self.known_dtypes = known_dtypes or {}
        self.fallible_flags: list[Column] = []  # error conds from fn! calls
        # latent error conds from NON-bang calls: only consulted by the
        # `, err` handled-assignment form (VRL: unhandled fallible call
        # without ! is a compile error; with `, err` the error is captured)
        self.latent_flags: list[Column] = []
        # (flag, exact message) pairs for flags whose reference diagnostic
        # is computable at compile time (e.g. parse_json of a literal) —
        # the `, err` builder chains these ahead of the generic message
        self.flag_msgs: list[tuple[Column, str]] = []
        # VRL `, err` contract: on error the ok-target takes the DEFAULT
        # value of the expression's type (0.0 for arithmetic, corpus
        # remap_arithmetic_error) — tracked as compile-time provenance
        self._err_default = None
        self.vars: dict[str, Column] = dict(vars or {})  # program variables
        # VRL `+` is string concat when either operand is a string; Catalyst
        # can't tell us pre-analysis, so the parser tracks "known string"
        # provenance (string literals + string-returning stdlib calls)
        self._is_str = False
        self._is_ts = False  # timestamp provenance (to_string dispatch)
        self._is_jsontext = False  # schema-less parse_json provenance
        self._last_path_dtype = None  # dtype of the last bare-path read
        # enrichment-table lookups found while parsing: each becomes a
        # broadcast join added by vrl_remap BEFORE the projection, with a
        # __enrich_N placeholder column standing in for the joined row
        self.enrich_requests: list[dict] = []

    def _reset_flags(self) -> None:
        """Per-statement error-state reset (each statement's `, err` /
        `_error` observes only its own expression's failure conditions)."""
        self.fallible_flags = []
        self.latent_flags = []
        self._err_default = None
        self.flag_msgs = []
        self._last_path_dtype = None

    # -- token helpers ---------------------------------------------------
    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def at(self, text: str) -> bool:
        t = self.peek()
        return t is not None and t.text == text

    def eat(self, text: str | None = None) -> _Tok:
        t = self.peek()
        if t is None:
            raise VrlCompileError("unexpected end of program")
        if text is not None and t.text != text:
            raise VrlCompileError(f"expected {text!r}, got {t.text!r}")
        self.i += 1
        return t

    # -- expression grammar (precedence climbing) ------------------------
    def expr(self) -> Column:
        return self.coalesce()

    def coalesce(self) -> Column:
        left = self.or_()
        while self.at("??"):
            self.eat()
            right = self.or_()
            left = F.coalesce(
                left if isinstance(left, Column) else F.lit(left),
                right if isinstance(right, Column) else F.lit(right),
            )
        return left

    def or_(self) -> Column:
        left = self.and_()
        while self.at("||"):
            self.eat()
            left = left | self.and_()
        return left

    def and_(self) -> Column:
        left = self.cmp()
        while self.at("&&"):
            self.eat()
            left = left & self.cmp()
        return left

    def cmp(self) -> Column:
        left = self.add()
        while self.peek() and self.peek().text in ("==", "!=", "<", "<=", ">", ">="):
            left_pd = self._last_path_dtype
            op = self.eat().text
            right = self.add()
            # struct/map vs object-literal equality: canonicalize both
            # sides through to_json (maps aren't EqualTo-comparable in
            # Spark, and a literal's query sub-object is a struct while
            # parse_url's is a map). Serialization order = field order,
            # which matches VRL's insertion-ordered object display.
            if (
                op in ("==", "!=")
                and left_pd is not None
                and (left_pd.startswith("struct") or left_pd.startswith("map"))
                and _col_meta(right, "_vs_obj_struct", False)
            ):
                # VRL object equality is structural and key-order-insensitive
                # at every depth: canonicalize BOTH sides to recursively
                # key-sorted JSON (a query map built from a=1&b=2 must equal
                # the literal {"b":"2","a":"1"}, including nested objects)
                lc = _canon_by_dtype(left, left_pd)
                rc = _col_meta(right, "_vs_obj_sorted")
                if rc is None:
                    rc = right
                cmp = F.to_json(lc) == F.to_json(rc)
                left = cmp if op == "==" else ~cmp
                self._err_default = None
                continue
            # VRL null equality: `x == null` is TRUE for null x (Spark
            # `=` would yield null); spelled isNull/isNotNull
            if right is None and op in ("==", "!="):
                lc = left if isinstance(left, Column) else F.lit(left)
                left = lc.isNull() if op == "==" else lc.isNotNull()
                self._err_default = None
                continue
            if left is None and op in ("==", "!="):
                rc = right if isinstance(right, Column) else F.lit(right)
                left = rc.isNull() if op == "==" else rc.isNotNull()
                self._err_default = None
                continue
            left = {
                "==": lambda a, b: a == b,
                "!=": lambda a, b: a != b,
                "<": lambda a, b: a < b,
                "<=": lambda a, b: a <= b,
                ">": lambda a, b: a > b,
                ">=": lambda a, b: a >= b,
            }[op](left, right)
            # the `, err` default tracks the TOP-LEVEL type: once a
            # comparison consumes the arithmetic, the result is boolean
            # and the numeric default no longer applies
            self._err_default = None
        return left

    def add(self) -> Column:
        left = self.mul()
        left_str = self._is_str
        while self.peek() and self.peek().text in ("+", "-"):
            op = self.eat().text
            right = self.mul()
            right_str = self._is_str
            if op == "+" and (left_str or right_str):
                # VRL `+` concatenates strings; Spark's is numeric-only
                left = F.concat(left.cast("string"), right.cast("string"))
                left_str = True
            else:
                left = (left + right) if op == "+" else (left - right)
                left_str = False
        self._is_str = left_str
        return left

    def mul(self) -> Column:
        left = self.unary()
        while self.peek() and self.peek().text in ("*", "/", "%"):
            op = self.eat().text
            right = self.unary()
            if op == "*":
                left = left * right
            elif op == "/":
                # VRL `a / b` is fallible on b == 0 (returns an error, not
                # a crash); ANSI-mode Spark `/` would THROW mid-job —
                # try_divide yields null, which the `, err` machinery and
                # drop_on_error observe as the error state
                left = F.try_divide(left, right)
                self._err_default = 0.0
                self.latent_flags.append(left.isNull())
            else:
                left = left % right
        return left

    def unary(self) -> Column:
        if self.at("!"):
            self.eat()
            return ~self.unary()
        if self.at("-"):
            self.eat()
            return -self.unary()
        return self.postfix()

    def postfix(self) -> Column:
        """primary, then `."quoted"` field access chains (fields whose
        names are not identifiers, e.g. numeric_groups' "0")."""
        base = self.primary()
        while (
            self.peek() is not None
            and self.peek().kind == "dot"
            and self.i + 1 < len(self.toks)
            and self.toks[self.i + 1].kind in ("dqstr", "sqstr")
        ):
            self.eat()
            fname = self.eat().text[1:-1]
            if isinstance(base, Column):
                base = base.getField(fname)
            else:
                raise VrlCompileError("quoted field access on a literal")
        return base

    def primary(self) -> Column:
        self._is_str = False
        self._last_path_dtype = None
        t = self.peek()
        if t is None:
            raise VrlCompileError("unexpected end of expression")
        if t.text == "(":
            self.eat()
            e = self.expr()
            self.eat(")")
            return e
        if t.text == "[":  # array literal → F.array
            self.eat()
            items: list = []
            while not self.at("]"):
                t2 = self.peek()
                nxt2 = (
                    self.toks[self.i + 1].text
                    if self.i + 1 < len(self.toks)
                    else None
                )
                # simple literal elements stay PYTHON values so the
                # array can detect heterogeneity (and config args like
                # redact filters keep real patterns)
                if (
                    t2 is not None
                    and t2.kind in ("int", "float", "dqstr", "sqstr")
                    and nxt2 in (",", "]")
                ):
                    self.eat()
                    if t2.kind == "int":
                        items.append(int(t2.text))
                    elif t2.kind == "float":
                        items.append(float(t2.text))
                    else:
                        self._is_str = True
                        items.append(
                            t2.text[1:-1]
                            .replace(r"\"", '"')
                            .replace(r"\'", "'")
                            .replace("\\\\", "\\")
                        )
                elif (
                    t2 is not None
                    and t2.kind == "name"
                    and t2.text == "null"
                    and nxt2 in (",", "]")
                ):
                    self.eat()
                    items.append(None)
                else:
                    items.append(self.expr())
                if self.at(","):
                    self.eat()
            self.eat("]")
            literal_only = all(not isinstance(i, Column) for i in items)
            kinds = {type(i) for i in items if i is not None} if literal_only else set()
            if literal_only and len(kinds) > 1:
                # heterogeneous literal array: VRL arrays are untyped;
                # the typed-engine representation is array<string> (the
                # same lub array-index assignment produces, so equality
                # comparisons line up)
                col = F.array(
                    *[
                        F.lit(None if i is None else str(i))
                        for i in items
                    ]
                )
            else:
                col = F.array(
                    *[i if isinstance(i, Column) else F.lit(i) for i in items]
                )
            if literal_only:
                # literal-only arrays keep their python values: config
                # args like redact(filters: [r'..']) need the patterns,
                # not an array Column (the expression form still works)
                col._vs_literal_list = list(items)
            return col
        if t.text == "{":  # object literal → struct with field aliases
            self.eat()
            fields: list[Column] = []
            fnames: list[str] = []
            svals: list[Column] = []
            ftypes: list[str] = []
            raw_obj: dict | None = {}
            while not self.at("}"):
                k = self.eat()
                if k.kind not in ("dqstr", "sqstr"):
                    raise VrlCompileError("object literal keys must be strings")
                self.eat(":")
                vt = self.peek()
                vnxt = (
                    self.toks[self.i + 1].text
                    if self.i + 1 < len(self.toks)
                    else None
                )
                if (
                    vt is not None
                    and vt.kind in ("int", "float", "dqstr", "sqstr")
                    and vnxt in (",", "}")
                ):
                    self.eat()
                    if vt.kind == "int":
                        v = int(vt.text)
                    elif vt.kind == "float":
                        v = float(vt.text)
                    else:
                        v = vt.text[1:-1]
                    if raw_obj is not None:
                        raw_obj[k.text[1:-1]] = v
                else:
                    v = self.expr()
                    raw_obj = None  # non-literal value: no raw capture
                vc = v if isinstance(v, Column) else F.lit(v)
                fields.append(vc.alias(k.text[1:-1]))
                # canonical value for the sorted twin: a nested object
                # literal contributes its OWN (recursively) sorted twin;
                # a COMPUTED sub-value with a known map/struct dtype
                # (e.g. `.parts.query`) canonicalizes by that dtype —
                # key-order insensitivity must hold at every depth for
                # computed sub-objects too, not only literals
                sv = _col_meta(vc, "_vs_obj_sorted")
                if sv is None and isinstance(v, Column):
                    vdt = _col_meta(vc, "_vs_dtype")
                    if isinstance(vdt, str) and vdt.startswith(
                        ("map<", "struct<")
                    ):
                        sv = _canon_by_dtype(vc, vdt)
                svals.append(vc if sv is None else sv)
                if isinstance(v, Column):
                    nested = _col_meta(vc, "_vs_dtype")
                    ftypes.append(nested if isinstance(nested, str) else "string")
                elif isinstance(v, bool):
                    ftypes.append("boolean")
                elif isinstance(v, int):
                    ftypes.append("bigint")
                elif isinstance(v, float):
                    ftypes.append("double")
                else:
                    ftypes.append("string")
                fnames.append(k.text[1:-1])
                if self.at(","):
                    self.eat()
            self.eat("}")
            col = F.struct(*fields)
            col._vs_obj_struct = True  # comparisons canonicalize via JSON
            # recursively key-sorted twin for order-insensitive equality
            # (VRL object equality is structural at every depth; a=1&b=2
            # query map must == {"b":..,"a":..})
            col._vs_obj_sorted = F.struct(
                *[
                    c.alias(n)
                    for n, c in sorted(zip(fnames, svals), key=lambda p: p[0])
                ]
            )
            # dtype tag: lets an ASSIGNED literal (`.o = {...}`) resolve
            # as struct on a later read, so `.o == {...}` takes the
            # structural-equality path. Only when every key is a plain
            # identifier — exotic keys would corrupt the simpleString.
            if all(re.fullmatch(r"\w+", n) for n in fnames):
                col._vs_dtype = (
                    "struct<"
                    + ",".join(f"{n}:{t}" for n, t in zip(fnames, ftypes))
                    + ">"
                )
            if raw_obj:
                col._vs_literal_obj = raw_obj
            return col
        if t.kind == "regex":
            self.eat()
            return RegexLiteral(t.text[2:-1])
        if t.kind == "mpath":
            self.eat()
            name = _meta_col_name(t.text)
            if self.known_cols is not None and name not in self.known_cols:
                return F.lit(None)
            return F.col(name)
        if t.kind == "dot":
            # quoted field access: ."0" / ."dotted.name"
            self.eat()
            nt = self.peek()
            if nt is not None and nt.kind in ("dqstr", "sqstr"):
                self.eat()
                fname = nt.text[1:-1]
                if (
                    self.known_cols is not None
                    and fname not in self.known_cols
                ):
                    return F.lit(None)
                return F.col(f"`{fname}`")
            # bare `.` — the WHOLE event as a value (vrl_target.rs): a
            # message-only event reads as its scalar, otherwise the
            # event's fields as a struct (envelope `_`-columns excluded)
            if self.known_cols is not None:
                evcols = sorted(
                    c for c in self.known_cols if not c.startswith("_")
                )
                if evcols == ["message"]:
                    return F.col("message")
                if evcols:
                    return F.struct(*[F.col(_quote_seg(c)).alias(c) for c in evcols])
            raise VrlCompileError("bare '.' is not an expression")
        if t.kind == "op" and t.text == "%":
            # bare `%` — the whole metadata value (`_metadata` envelope)
            self.eat()
            if self.known_cols is not None and "_metadata" not in self.known_cols:
                return F.lit(None)
            return F.col("_metadata")
        if t.kind == "path":
            self.eat()
            # reset BEFORE resolving: an early return (absent field,
            # map-rooted read) or an unknown root dtype must not leak a
            # PRIOR statement's map/struct dtype into this read's `== {}`
            # canonicalization decision
            self._last_path_dtype = None
            root = _path_segments(t.text)[0]
            if self.known_cols is not None and root not in self.known_cols:
                if "_root_map" in self.known_cols:
                    # map-rooted event (`. = <map>`): top-level fields
                    # live in the _root_map column; try_element_at (not
                    # element_at — ANSI mode throws on a missing key)
                    # keeps absent-field reads null per the VRL contract
                    return F.try_element_at(
                        F.col("_root_map"), F.lit(root)
                    )
                return F.lit(None)  # absent field reads as null (VRL)
            # dtype provenance feeds to_string's timestamp rendering
            self._is_ts = self.known_dtypes.get(root, "").startswith(
                "timestamp"
            )
            m0 = re.match(r'\.(?:"(?:[^"\\]|\\.)*"|[A-Za-z_]\w*)', t.text)
            rest = t.text[m0.end():]
            if not rest:
                self._last_path_dtype = self.known_dtypes.get(root)
            elif self.known_dtypes.get(root) not in (None, "string"):
                # nested struct/map path: resolve the leaf dtype so e.g.
                # `.parts.query == {...}` knows the left side is a map and
                # canonicalizes (order-insensitive object equality)
                self._last_path_dtype = _nested_dtype(
                    self.known_dtypes.get(root), _path_segments(t.text)[1:]
                )
            if rest and self.known_dtypes.get(root) == "string":
                # nested access INTO a string column: the column holds
                # JSON text (the schema-less parse_json contract) — the
                # path becomes a get_json_object JSONPath. exists/null
                # semantics line up: missing path -> null. Quoted path
                # segments (.m."a.b") become bracket form ['a.b'].
                jpath = re.sub(
                    r'\."((?:[^"\\]|\\.)*)"', lambda m: f"['{m.group(1)}']",
                    rest,
                )
                return F.get_json_object(F.col(_quote_seg(root)), "$" + jpath)
            out = _path_col(t.text)  # .a.b[0] → struct/array access
            # carry the resolved dtype on the Column itself: an object
            # literal embedding this read (`.o = {"p": .parts.query}`)
            # needs it to type its own field and canonicalize the twin
            if isinstance(self._last_path_dtype, str):
                out._vs_dtype = self._last_path_dtype
            return out
        if t.kind == "float":
            self.eat()
            return F.lit(float(t.text))
        if t.kind == "int":
            self.eat()
            return F.lit(int(t.text))
        if t.kind in ("dqstr", "sqstr"):
            self.eat()
            self._is_str = True
            body = t.text[1:-1]
            return F.lit(_unescape_str(body))
        if t.kind == "name":
            if t.text == "true":
                self.eat()
                return F.lit(True)
            if t.text == "false":
                self.eat()
                return F.lit(False)
            if t.text == "null":
                self.eat()
                return None  # python None: == null compiles to isNull
            if t.text == "if":
                return self.if_expr()
            if t.text == "abort":
                raise VrlCompileError("abort is a top-level statement")
            nxt = self.toks[self.i + 1].text if self.i + 1 < len(self.toks) else None
            if nxt in ("(", "!"):
                result = self.call()
                # adjacent field access on a call result
                # (`get_vector_metric("m").value`): same adjacency rule
                # as variable field access — whitespace before the path
                # means a new statement starts
                nt = self.peek()
                if (
                    nt is not None
                    and nt.kind == "path"
                    and self.i > 0
                    and nt.pos == self.toks[self.i - 1].end
                    and isinstance(result, Column)
                ):
                    self.eat()
                    for s in _path_segments(nt.text):
                        result = (
                            F.get(result, s) if isinstance(s, int)
                            else result.getField(s)
                        )
                return result
            self.eat()
            if t.text in self.vars:  # program variable reference
                base = self.vars[t.text]
                nt = self.peek()
                # field access ON a variable (`match.string`,
                # `m.captures[0]`): the segments lex as one `path`
                # token right after the name — apply them as
                # getField/get chains (closure params are structs).
                # ADJACENCY required (nt.pos == t.end): with whitespace
                # between, the path starts the NEXT statement
                # (`x = 5\n.out = x\n.next = 1` must not parse
                # `x.next` — the corpus pins this)
                if (
                    nt is not None
                    and nt.kind == "path"
                    and nt.pos == t.end
                    and isinstance(base, Column)
                ):
                    self.eat()
                    for s in _path_segments(nt.text):
                        base = (
                            F.get(base, s) if isinstance(s, int)
                            else base.getField(s)
                        )
                return base
            raise VrlCompileError(f"undefined variable {t.text!r}")
        raise VrlCompileError(f"unexpected token {t.text!r}")

    def if_expr(self) -> Column:
        self.eat("if")
        cond = self.expr()
        self.eat("{")
        then = self.expr()
        self.eat("}")
        otherwise: Column = F.lit(None)
        if self.at("else"):
            self.eat()
            if self.at("if"):
                otherwise = self.if_expr()
            else:
                self.eat("{")
                otherwise = self.expr()
                self.eat("}")
        return F.when(cond, then).otherwise(otherwise)

    def call(self) -> Column:
        name_tok = self.eat()
        name = name_tok.text
        fallible = False
        if self.at("!"):
            self.eat()
            fallible = True
        if name in (
            "get_enrichment_table_record",
            "find_enrichment_table_records",
        ):
            return self._enrich_call(name, fallible)
        self.eat("(")
        args: list = []
        kwargs: dict = {}
        first_lit: str | None = None  # literal text of the first value arg
        while not self.at(")"):
            t = self.peek()
            nxt = self.toks[self.i + 1].text if self.i + 1 < len(self.toks) else None
            if t.kind == "name" and t.text not in _KEYWORDS and nxt == ":":
                # named argument `label: value` (VRL function-call form) —
                # registry impls name their params to match
                self.eat()
                self.eat(":")
                kwargs[t.text] = self.arg()
            else:
                # the FIRST positional arg is the value operand: a string
                # literal there means F.lit("..."), not a config string —
                # except for fns whose first param IS config (env var
                # names, cidr strings)
                if not args and not kwargs and t.kind in ("dqstr", "sqstr"):
                    first_lit = _unescape_str(t.text[1:-1])
                literal_ok = bool(args) or name in _LITERAL_FIRST_ARG_FNS
                args.append(self.arg(literal_ok=literal_ok))
            if self.at(","):
                self.eat()
        rparen = self.eat(")")
        # the reference's diagnostic span for a call expression:
        # (start:end) char offsets of `name(...)` in the program source
        call_span = (name_tok.pos, rparen.end)
        closure = self.maybe_closure()
        if closure is not None:
            args.append(closure)
        if name not in VRL_FUNCTIONS:
            raise VrlCompileError(f"unknown function {name!r}")
        if name == "tag_types_externally" and len(args) == 1:
            # VRL type tagging: value → {type_name: value}. Types resolve
            # at compile time (literals keep python types; Columns use
            # provenance) — the reference resolves them at runtime, same
            # observable result for typed inputs.
            def _tag(v):
                if v is None:
                    return None
                if isinstance(v, RegexLiteral):
                    return F.struct(F.lit(str(v)).alias("regex"))
                if isinstance(v, bool):
                    return F.struct(F.lit(v).alias("boolean"))
                if isinstance(v, int):
                    return F.struct(F.lit(v).alias("integer"))
                if isinstance(v, float):
                    return F.struct(F.lit(v).alias("float"))
                if isinstance(v, str):
                    return F.struct(F.lit(v).alias("string"))
                return None

            a0 = args[0]
            tagged = _tag(a0)
            if tagged is not None or a0 is None:
                self._last_path_dtype = None
                return tagged
            if isinstance(a0, Column):
                # Column.__getattr__ turns unknown attributes into field
                # accesses — consult the instance dict directly
                lst = a0.__dict__.get("_vs_literal_list")
                obj = a0.__dict__.get("_vs_literal_obj")
                self._last_path_dtype = None
                if lst is not None:
                    return F.array(*[_tag(x) for x in lst])
                if obj is not None:
                    return F.struct(
                        *[_tag(v).alias(k) for k, v in obj.items()]
                    )
                if self._is_ts:
                    return F.struct(a0.alias("timestamp"))
                if self._is_str:
                    return F.struct(a0.alias("string"))
            raise VrlCompileError(
                "tag_types_externally needs a literal or typed operand"
            )
        # VRL type assertions (string!/int!/float!/bool!/timestamp!):
        # with schema knowledge a wrong-typed operand is a CONSTANT error
        # — every event errors, exactly the reference's runtime behavior
        # on that input (corpus *_error tests drop the stream)
        _ASSERT_TYPES = {
            "string": ("string",),
            "int": ("bigint", "int", "long", "smallint", "tinyint"),
            "float": ("double", "float"),
            "bool": ("boolean",),
            "timestamp": ("timestamp",),
        }
        if (
            name in _ASSERT_TYPES
            and args
            and self._last_path_dtype is not None
        ):
            dt = self._last_path_dtype
            if not any(dt.startswith(t) for t in _ASSERT_TYPES[name]):
                (self.fallible_flags if fallible else self.latent_flags).append(
                    F.lit(True)
                )
        if (
            name in ("push", "append")
            and self._is_jsontext
            and len(args) == 2
        ):
            # array ops over schema-less parse_json TEXT: decode as
            # array<string> (the heterogeneous-array lub), concat —
            # same coercion the corpus's element comparisons apply
            self._is_jsontext = False
            self._last_path_dtype = None
            self._is_str = False
            a0 = F.from_json(args[0].cast("string"), "array<string>")
            if name == "push":
                v = args[1] if isinstance(args[1], Column) else F.lit(args[1])
                return F.concat(a0, F.array(v.cast("string")))
            return F.concat(
                a0, F.from_json(args[1].cast("string"), "array<string>")
            )
        if (
            name == "merge"
            and len(args) == 2
            and self._last_path_dtype == "string"
        ):
            # JSON-object TEXT merge (both operands are string columns
            # holding validated JSON): right wins via LAST_WIN map
            # dedup; the result stays TEXT so the JSON-path bridge
            # serves later field access
            self._last_path_dtype = None
            return F.to_json(
                F.map_concat(
                    F.from_json(args[0].cast("string"), "map<string,string>"),
                    F.from_json(args[1].cast("string"), "map<string,string>"),
                )
            )
        if (
            name in ("compact", "flatten")
            and len(args) == 1
            and (self._is_jsontext or self._last_path_dtype == "string")
        ):
            # dynamic-typed compact/flatten over JSON TEXT (schema-less
            # parse_json provenance): Arrow-batched JSON rewrite, result
            # stays TEXT so the JSON-path bridge serves later reads
            from vector_spark.functions.vrl import json_text_transform

            self._is_jsontext = True
            self._last_path_dtype = None
            self._is_str = False
            return json_text_transform(args[0], name)
        if name == "encode_json" and self._is_jsontext and args:
            # encode_json over schema-less parse_json output (validated
            # JSON TEXT): re-serialize minified through VARIANT — the
            # VRL composition contract without a typed schema
            self._is_jsontext = False
            self._is_str = True
            return F.to_json(F.try_parse_json(args[0].cast("string")))
        if name == "to_string" and self._is_ts and args:
            # VRL to_string(timestamp) renders RFC3339 with Z (corpus
            # remap_function_now); a plain string cast gives the SQL form
            self._is_ts = False
            self._is_str = True
            return F.date_format(args[0], "yyyy-MM-dd'T'HH:mm:ss'Z'")
        try:
            result = VRL_FUNCTIONS[name](*args, **kwargs)
        except TypeError as e:
            raise VrlCompileError(f"{name}: {e}") from None
        self._is_str = name in _STRING_FNS
        self._is_ts = name in _TIMESTAMP_FNS
        # functions whose result is JSON TEXT (the schema-less bridge):
        # reads into their results go through JSON paths
        self._is_jsontext = (
            name == "parse_json" and len(args) < 2
        ) or name in ("parse_dnstap", "parse_xml", "parse_ruby_hash", "parse_proto")
        self._last_path_dtype = None  # a call result is not a path
        if name == "assert":
            # assert!(cond): errors when the condition is false/null
            self.fallible_flags.append(~F.coalesce(result, F.lit(False)))
        else:
            first = args[0] if args else next(iter(kwargs.values()), None)
            if isinstance(first, Column) and isinstance(result, Column):
                # error condition: input present but result null
                flag = first.isNotNull() & result.isNull()
                (self.fallible_flags if fallible else self.latent_flags).append(flag)
                # exact reference diagnostic when computable at compile
                # time: `function call error for "fn" at (a:b): <detail>`
                # (src/transforms/remap.rs surfaces the VRL ExpressionError
                # Display; the behavior corpus asserts these verbatim)
                if name == "parse_json" and isinstance(first_lit, str):
                    detail = _serde_json_error(first_lit)
                    if detail is not None:
                        self.flag_msgs.append((
                            flag,
                            f'function call error for "{name}" at '
                            f"({call_span[0]}:{call_span[1]}): "
                            f"unable to parse json: {detail}",
                        ))
        return result

    def _enrich_call(self, name: str, fallible: bool) -> Column:
        """VRL enrichment lookups (lib/vector-vrl/enrichment/src/lib.rs:
        `get_enrichment_table_record(table, {"col": .field})` /
        `find_enrichment_table_records`): parse the condition object into
        table-column → event-expression pairs and emit a placeholder the
        remap driver resolves with a broadcast join (the same physical
        plan the enrich operator produces — SURVEY §2.2). Keys must
        reference INPUT fields (the join runs before the projection)."""
        self.eat("(")
        tname_tok = self.eat()
        if tname_tok.kind not in ("dqstr", "sqstr"):
            raise VrlCompileError(f"{name}: first arg must be a table name literal")
        self.eat(",")
        self.eat("{")
        keys: dict = {}
        while not self.at("}"):
            k = self.eat()
            if k.kind not in ("dqstr", "sqstr"):
                raise VrlCompileError(f"{name}: condition keys must be strings")
            self.eat(":")
            if self.at("{"):
                # date-range condition object (file.rs BetweenDates /
                # FromDate / ToDate): {"from": expr} / {"to": expr} /
                # both — bounds are event-side expressions, inclusive
                self.eat("{")
                bounds: dict = {}
                while not self.at("}"):
                    bk = self.eat()
                    bname = (
                        bk.text[1:-1] if bk.kind in ("dqstr", "sqstr")
                        else bk.text
                    )
                    if bname not in ("from", "to"):
                        raise VrlCompileError(
                            f"{name}: date condition takes from/to, "
                            f"got {bname!r}")
                    self.eat(":")
                    bounds[bname] = self.expr()
                    if self.at(","):
                        self.eat()
                self.eat("}")
                keys[k.text[1:-1]] = bounds
            else:
                keys[k.text[1:-1]] = self.expr()
            if self.at(","):
                self.eat()
        self.eat("}")
        case_sensitive = True
        wildcard = None
        while self.at(","):  # trailing named args, e.g. case_sensitive: false
            self.eat()
            label = self.eat().text
            self.eat(":")
            if label == "wildcard":
                # the VALUE whose presence in a table key cell means
                # "match any probe" (find_enrichment_table_records.rs:34)
                wt = self.peek()
                if wt is not None and wt.kind in ("dqstr", "sqstr"):
                    self.eat()
                    wildcard = _unescape_str(wt.text[1:-1])
                else:
                    wildcard = self.expr()
                continue
            v = self.eat().text
            if label == "case_sensitive":
                case_sensitive = v == "true"
        self.eat(")")
        idx = len(self.enrich_requests)
        placeholder = F.col(f"__enrich_{idx}")
        self.enrich_requests.append(
            {
                "table": tname_tok.text[1:-1],
                "keys": keys,
                "multi": name == "find_enrichment_table_records",
                "case_sensitive": case_sensitive,
                "wildcard": wildcard,
            }
        )
        if name == "get_enrichment_table_record":
            # errors when no row matched (find_table_row's error contract)
            (self.fallible_flags if fallible else self.latent_flags).append(
                placeholder.isNull()
            )
        return placeholder

    def maybe_closure(self):
        """`-> |v| { body }` after a call: compile the body lazily with the
        closure parameter bound — Spark's higher-order functions
        (transform/filter/…) hand us the element Column, so the closure
        compiles into the SAME plan (no Python per row)."""
        if not self.at("->"):
            return None
        self.eat("->")
        self.eat("|")
        param = self.eat().text
        self.eat("|")
        self.eat("{")
        depth, start = 1, self.i
        while depth:
            t = self.eat()
            if t.text == "{":
                depth += 1
            elif t.text == "}":
                depth -= 1
        body = self.toks[start : self.i - 1]
        outer = dict(self.vars)

        # fixed single-param signature: Spark's higher-order functions
        # inspect the callable's arity (VAR_POSITIONAL is rejected)
        def closure(x: Column) -> Column:
            inner = _P(body, vars={**outer, param: x})
            result = inner.expr()
            if inner.peek() is not None:
                raise VrlCompileError("closure body must be one expression")
            return result

        return closure

    def arg(self, literal_ok: bool = True):
        """Function args: Column exprs, or bare literals passed as Python
        values (regex patterns, format strings, counts, bools). With
        ``literal_ok=False`` (first positional arg) a string literal is the
        VALUE operand and compiles to a Column via expr()."""
        if not literal_ok:
            v = self.expr()
            return str(v) if isinstance(v, RegexLiteral) else v
        t = self.peek()
        nxt = self.toks[self.i + 1].text if self.i + 1 < len(self.toks) else None
        if (
            t is not None
            and t.text == "-"
            and self.i + 1 < len(self.toks)
            and self.toks[self.i + 1].kind in ("int", "float")
            and (self.i + 2 >= len(self.toks) or self.toks[self.i + 2].text in (",", ")"))
        ):
            self.eat()
            n = self.eat()
            return -int(n.text) if n.kind == "int" else -float(n.text)
        if t is not None and nxt in (",", ")"):
            if t.kind in ("dqstr", "sqstr"):
                self.eat()
                return t.text[1:-1]
            if t.kind == "int":
                self.eat()
                return int(t.text)
            if t.kind == "float":
                self.eat()
                return float(t.text)
            if t.kind == "regex":
                self.eat()
                return RegexLiteral(t.text[2:-1])  # str subclass: keeps
                # pattern-ness for type-tagging, still a plain pattern
            if t.kind == "name" and t.text in ("true", "false"):
                self.eat()
                return t.text == "true"
        if t is not None and t.kind == "name" and t.text == "null" and nxt in (",", ")"):
            self.eat()
            return None
        v = self.expr()
        return str(v) if isinstance(v, RegexLiteral) else v


def _target_name(tok: _Tok) -> str:
    """Assignment-target column name for a path/mpath token. Quoted
    segments (field names containing dots) render backticked; the remap
    operator's path splitter honors backticks."""
    if tok.kind == "mpath":
        return _meta_col_name(tok.text)
    segs = _path_segments(tok.text)
    if any(isinstance(s, int) for s in segs):
        raise VrlCompileError("assignment into an array index is unsupported")
    return ".".join(_quote_seg(s) for s in segs)


def compile_vrl_full(
    source: str,
    known_cols: set[str] | None = None,
    known_dtypes: dict[str, str] | None = None,
) -> tuple[list[Assignment], bool]:
    """Compile a straight-line VRL program into remap Assignments.

    Statement forms (`website/cue/reference/remap/expressions/`):
      .path = expr / %meta = expr      assignment (fn! errors → _error)
      .path, err = expr                infallible form: on error the value
                                       target is null, `err` captures the
                                       message, NO program error is raised
      var = expr                       program variable (compile-time
                                       binding — inlined into later exprs)
      del(.path)                       field removal
      abort                            discard ALL changes; forward or drop
                                       per drop_on_abort (remap.rs:142 and
                                       the behavior corpus: remap_abort
                                       expects .foo untouched)
      assert!(cond) / log(x)           bare calls (assert raises _error)

    Returns (assignments, aborted)."""
    toks = _lex(source)
    if known_dtypes is not None and known_cols is None:
        known_cols = set(known_dtypes)
    p = _P(toks, known_cols=known_cols, known_dtypes=known_dtypes)

    def _learn(name: str) -> None:
        # later statements may read what earlier ones assigned
        if p.known_cols is not None:
            root = (
                name[1 : name.index("`", 1)]
                if name.startswith("`")
                else name.split(".")[0]
            )
            p.known_cols.add(root)
    assignments: list[Assignment] = []
    deletes: list[str] = []
    noops = 0
    while p.peek() is not None:
        t = p.peek()
        if t.kind == "name" and t.text == "del":
            p.eat()
            p.eat("(")
            path = p.eat()
            if path.kind not in ("path", "mpath"):
                raise VrlCompileError("del() takes a path")
            p.eat(")")
            deletes.append(_target_name(path))
            continue
        if t.kind == "name" and t.text == "abort":
            p.eat()
            # abort discards every change: drop all assignments so far
            # (deletes too), keep only the abort mark
            return [], True, p.enrich_requests
        if t.kind == "dot":
            # `. = expr` — whole-event replacement (expressions.cue
            # assignment to the root path). Compiled when the result is a
            # STRUCT (its fields become the new event). Must be the only
            # statement: everything before it would be discarded anyway.
            p.eat()
            p.eat("=")
            p._reset_flags()
            expr = p.expr()
            if not isinstance(expr, Column):
                raise VrlCompileError(
                    "`. = <scalar>` event roots are unsupported (the "
                    "columnar event model needs named fields)"
                )
            err = None
            for flag in p.fallible_flags:
                err = flag if err is None else (err | flag)
            if assignments or p.peek() is not None:
                raise VrlCompileError(
                    "`. = expr` must be the program's only statement"
                )
            assignments.append(Assignment("__root__", expr, err))
            return assignments, False, p.enrich_requests
        if t.kind == "name" and t.text == "if":
            # top-level `if cond { .x = e } else { .x = e2 }` statement
            # (corpus remap_function_upcase etc.): each branch assignment
            # becomes a conditional column rewrite; branch error flags
            # gate on the branch actually taken
            p.eat()
            p._reset_flags()
            cond = p.expr()
            if not isinstance(cond, Column):
                cond = F.lit(cond)
            cond = cond.cast("boolean")

            def _if_block() -> list:
                p.eat("{")
                stmts = []
                while not p.at("}"):
                    tt = p.peek()
                    if tt is None:
                        raise VrlCompileError("unterminated if block")
                    if tt.kind == "name" and tt.text == "abort":
                        # row-level conditional abort: sentinel carries
                        # the branch condition to vrl_remap's rollback
                        p.eat()
                        stmts.append(("__abort__", None, None))
                        continue
                    if tt.kind not in ("path", "mpath"):
                        raise VrlCompileError(
                            "only assignments are supported inside if blocks"
                        )
                    tgt = p.eat()
                    p.eat("=")
                    p._reset_flags()
                    e = p.expr()
                    berr = None
                    for flag in p.fallible_flags:
                        berr = flag if berr is None else (berr | flag)
                    stmts.append((_target_name(tgt), e, berr))
                p.eat("}")
                return stmts

            then_stmts = _if_block()
            else_stmts = []
            if (
                p.peek() is not None
                and p.peek().kind == "name"
                and p.peek().text == "else"
            ):
                p.eat()
                else_stmts = _if_block()
            for branch_cond, stmts in (
                (cond, then_stmts),
                (~cond, else_stmts),
            ):
                for out, e, berr in stmts:
                    if out == "__abort__":
                        assignments.append(
                            Assignment("__abort__", branch_cond)
                        )
                        continue
                    if (
                        p.known_cols is not None
                        and out.split(".")[0] not in p.known_cols
                    ):
                        keep = F.lit(None)
                    elif out.startswith("_meta_"):
                        keep = F.col(out)
                    else:
                        keep = _path_col("." + out)
                    assignments.append(
                        Assignment(
                            out,
                            F.when(branch_cond, e).otherwise(keep),
                            None
                            if berr is None
                            else (berr & branch_cond),
                        )
                    )
                    _learn(out)
            continue
        nxt = p.toks[p.i + 1].text if p.i + 1 < len(p.toks) else None
        if t.kind == "name" and t.text not in _KEYWORDS and nxt == "=":
            # program variable binding — a Column alias at compile time
            p.eat()
            p.eat("=")
            p._reset_flags()
            p.vars[t.text] = p.expr()
            err = None
            for flag in p.fallible_flags:
                err = flag if err is None else (err | flag)
            if err is not None:
                # an unhandled fallible expr in a variable binding is a
                # program error, same as an assignment's
                noops += 1
                assignments.append(Assignment(f"__noop__{noops}", F.lit(None), err))
            continue
        if t.kind == "name" and t.text in ("set_secret", "remove_secret"):
            # secret mutation statements (lib/vector-vrl/functions/src/):
            # secrets ride in the `_secrets` map column — rewrite the bare
            # call into an assignment to it
            from vector_spark.functions.vrl_wave4 import (
                remove_secret_expr,
                set_secret_expr,
            )

            fn = t.text
            p.eat()
            p.eat("(")
            name_tok = p.eat()
            if name_tok.kind not in ("dqstr", "sqstr"):
                raise VrlCompileError(f"{fn} takes a literal secret name")
            secret_name = name_tok.text[1:-1]
            if fn == "set_secret":
                p.eat(",")
                p._reset_flags()
                value = p.expr()
                new = set_secret_expr(F.col("_secrets"), secret_name, value)
            else:
                new = remove_secret_expr(F.col("_secrets"), secret_name)
            p.eat(")")
            assignments.append(Assignment("_secrets", new))
            continue
        if t.kind == "name" and t.text == "for_each" and nxt == "(":
            # `for_each(coll) -> |k, v| { acc = <expr> }` — the iteration
            # RFC's side-effect form (2022-05-18 RFC; the 0.27 upgrade
            # guide's tag-counting example). The only side effect a
            # straight-line Column program can express is accumulation
            # into an existing program variable, and that IS the
            # documented idiom — compiled to F.aggregate over the
            # entries, so the loop runs JVM-side inside the plan.
            # Objects iterate |key, value|; arrays |index, value|
            # (dtype tag decides; untagged collections iterate as maps).
            p.eat()
            p.eat("(")
            p._reset_flags()
            coll = p.expr()
            p.eat(")")
            p.eat("->")
            p.eat("|")
            k_name = p.eat().text
            p.eat(",")
            v_name = p.eat().text
            p.eat("|")
            p.eat("{")
            var_tok = p.eat()
            if var_tok.kind != "name" or var_tok.text not in p.vars:
                raise VrlCompileError(
                    "for_each closure body must accumulate into an "
                    "existing program variable (`acc = acc + ...`); "
                    "general side effects have no Column analog"
                )
            p.eat("=")
            depth, start = 1, p.i
            while depth:
                t2 = p.eat()
                if t2.text == "{":
                    depth += 1
                elif t2.text == "}":
                    depth -= 1
            body = p.toks[start : p.i - 1]
            dtype = _col_meta(coll, "_vs_dtype", "") or ""
            if dtype.startswith("array"):
                entries = F.transform(
                    coll,
                    lambda x, i: F.struct(
                        i.cast("long").alias("key"), x.alias("value")
                    ),
                )
            else:
                entries = F.map_entries(coll)
            outer = dict(p.vars)
            var = var_tok.text

            def _make_merge(_body, _outer, _var, _k, _v):
                def _merge(acc, e):
                    inner = _P(
                        _body,
                        vars={
                            **_outer,
                            _var: acc,
                            _k: e.getField("key"),
                            _v: e.getField("value"),
                        },
                    )
                    r = inner.expr()
                    if inner.peek() is not None:
                        raise VrlCompileError(
                            "for_each body must be one accumulation "
                            "expression"
                        )
                    return r

                return _merge

            _merge = _make_merge(body, outer, var, k_name, v_name)

            init = p.vars[var]
            if not isinstance(init, Column):
                init = F.lit(init)
            # aggregate() requires the accumulator type to EQUAL the
            # merge result type — and VRL integers are i64, so an
            # int-literal accumulator (`count = 0`) must ride as
            # bigint or `acc + to_int(v)` mismatches at analysis
            m_lit = re.match(r"^Column<'(-?\d+)'>$", str(init))
            if m_lit:
                init = F.lit(int(m_lit.group(1))).cast("bigint")
            p.vars[var] = F.aggregate(entries, init, _merge)
            continue
        if t.kind == "name" and nxt in ("(", "!"):
            # bare call statement: assert!/log/set_semantic_meaning — value
            # discarded, error conditions (assert) kept
            p._reset_flags()
            p.call()
            err = None
            for flag in p.fallible_flags:
                err = flag if err is None else (err | flag)
            if err is not None:
                noops += 1
                assignments.append(Assignment(f"__noop__{noops}", F.lit(None), err))
            continue
        if (
            t.kind == "op"
            and t.text == "%"
            and p.i + 1 < len(p.toks)
            and p.toks[p.i + 1].text == "="
        ):
            # `% = expr` — whole-metadata root assignment
            # (vrl_target.rs metadata root; corpus vrl_test_input.yaml):
            # the metadata value rides in the `_metadata` envelope column
            p.eat()
            p.eat("=")
            p._reset_flags()
            expr = p.expr()
            assignments.append(Assignment("_metadata", expr))
            _learn("_metadata")
            continue
        if t.kind not in ("path", "mpath"):
            raise VrlCompileError(f"statement must start with a path, got {t.text!r}")
        targets = [p.eat()]
        while p.at(","):
            p.eat()
            nt = p.peek()
            if nt is not None and nt.kind in ("path", "mpath"):
                targets.append(p.eat())
            elif nt is not None and nt.kind == "name":
                targets.append(p.eat())  # `, err` variable target
            else:
                raise VrlCompileError("expected assignment target after ','")
        p.eat("=")
        p._reset_flags()
        expr = p.expr()
        if isinstance(expr, RegexLiteral):
            raise VrlCompileError("a regex literal cannot be assigned")
        err = None
        for flag in p.fallible_flags:
            err = flag if err is None else (err | flag)
        _idx_m = (
            re.match(r"^\.([A-Za-z_]\w*)\[(\d+)\]$", targets[0].text)
            if len(targets) == 1 and targets[0].kind == "path"
            else None
        )
        if _idx_m:
            # `.a[i] = v` — rebuild the array with position i set, padded
            # with nulls to i+1 (VRL array-index assignment; element
            # types coerce as Spark's lub, matching the corpus's
            # heterogeneous-array comparisons which coerce identically)
            root, idx = _idx_m.group(1), int(_idx_m.group(2))
            if p.known_cols is not None and root not in p.known_cols:
                base = F.array()
            else:
                base = F.col(root)
            # heterogeneous VRL arrays land as array<string> (the typed
            # engine's lub); comparisons coerce literal arrays the same
            # way, so equality semantics survive
            v = (expr if isinstance(expr, Column) else F.lit(expr)).cast(
                "string"
            )
            n = F.greatest(
                F.coalesce(F.size(base), F.lit(0)), F.lit(idx + 1)
            )
            arr = F.transform(
                F.sequence(F.lit(0), n - 1),
                lambda j: F.when(j == idx, v).otherwise(
                    F.try_element_at(base, (j + 1).cast("int")).cast(
                        "string"
                    )
                ),
            )
            assignments.append(Assignment(root, arr, err))
            _learn(root)
        elif len(targets) == 1:
            tname = _target_name(targets[0])
            assignments.append(Assignment(tname, expr, err))
            _learn(tname)
            if "." not in tname and "`" not in tname:
                # propagate known function-result dtypes (tagged via
                # _tag_dtype) so later reads into the assigned field
                # resolve their leaf type; drop any stale entry when the
                # new value's type is unknown
                # NB: must read via __dict__ — Column.__getattr__ resolves
                # any attribute name as a field-access Column, so hasattr()
                # is always true on a Column
                tagged = _col_meta(expr, "_vs_dtype")
                if isinstance(tagged, str):
                    p.known_dtypes[tname] = tagged
                elif not p._is_jsontext:
                    p.known_dtypes.pop(tname, None)
            if p._is_jsontext and "." not in tname and "`" not in tname:
                # schema-less parse_json/compact/flatten result: the
                # column holds JSON TEXT — record the dtype so later
                # reads (.x.field) take the JSON-path bridge instead of
                # struct extraction on a string
                p.known_dtypes[tname] = "string"
        elif len(targets) == 2:
            # `.ok, err = expr` — handled fallibility (expressions.cue
            # assignment form): ok=null + err=message on error; the
            # program does NOT error. Non-bang fallible calls count here
            # (that's what `, err` is FOR), hence latent_flags too.
            cond = err
            for flag in p.latent_flags:
                cond = flag if cond is None else (cond | flag)
            cond = cond if cond is not None else F.lit(False)
            ok = F.when(~cond, expr).otherwise(F.lit(p._err_default))
            # exact diagnostics first (first failing call wins, matching
            # sequential evaluation), generic text for the rest
            msg_val: Column = F.lit("function call error")
            chain = None
            for flag, m in p.flag_msgs:
                chain = (
                    F.when(flag, F.lit(m))
                    if chain is None
                    else chain.when(flag, F.lit(m))
                )
            if chain is not None:
                msg_val = chain.otherwise(msg_val)
            msg = F.when(cond, msg_val).otherwise(F.lit(None))
            assignments.append(Assignment(_target_name(targets[0]), ok))
            _learn(_target_name(targets[0]))
            et = targets[1]
            if et.kind == "name":
                p.vars[et.text] = msg
            else:
                assignments.append(Assignment(_target_name(et), msg))
                _learn(_target_name(et))
        else:
            raise VrlCompileError("at most two assignment targets supported")
    for d in deletes:
        assignments.append(Assignment(f"__del__{d}", F.lit(None)))
    return assignments, False, p.enrich_requests


def compile_vrl(source: str) -> list[Assignment]:
    """Back-compat wrapper: assignments only (abort treated as compile
    error so callers that can't route aborts find out at config time)."""
    assignments, aborted, enrich = compile_vrl_full(source)
    if aborted:
        raise VrlCompileError("program aborts; use vrl_remap for abort routing")
    if enrich:
        raise VrlCompileError(
            "program uses enrichment tables; use vrl_remap(enrichment_tables=...)"
        )
    return assignments


def _compile_cond(expr_text: str, dtypes: dict[str, str] | None):
    assignments, aborted, enrich = compile_vrl_full(
        f".__vs_cond = ({expr_text})", known_dtypes=dtypes
    )
    if aborted or enrich or len(assignments) != 1:
        raise VrlCompileError("not a single condition expression")
    return assignments


def vrl_condition(source: str, dtypes: dict[str, str] | None = None):
    """Compile a VRL condition (src/conditions/vrl.rs) to a boolean
    Column. Each non-empty line must be a boolean expression; lines AND
    together (the reference's corpus conditions list one check per line).
    A line that is not valid VRL falls back to SQL expr — the loader
    historically accepted SQL strings under `type: vrl|sql` and existing
    configs keep working."""
    whole = " ".join(
        l.strip() for l in source.strip().splitlines() if l.strip()
    )
    try:
        # whole-source first: reference corpus conditions wrap ONE boolean
        # expression across lines (`.a == 1 &&\n.b == 2`)
        (a,) = _compile_cond(whole, dtypes)
        return a.expr.cast("boolean")
    except Exception:
        pass
    cols = []
    for line in source.strip().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        try:
            (a,) = _compile_cond(line, dtypes)
            cols.append(a.expr.cast("boolean"))
        except Exception:
            cols.append(F.expr(line).cast("boolean"))
    if not cols:
        return F.lit(True)
    out = cols[0]
    for c in cols[1:]:
        out = out & c
    return out


def _resolve_enrichment(df, requests: list[dict], tables: dict):
    """One broadcast join per lookup: the table collapses to
    (key columns, row-struct) — or (keys, array<struct>) for the multi
    form — so the join carries exactly one extra column into the stream.
    Single-row semantics: find_table_row errors on duplicate key matches
    in the reference (src/enrichment_tables/file.rs:568); here the FIRST
    table row per key (deterministic) wins, documented delta."""
    for i, req in enumerate(requests):
        if req["table"] not in tables:
            raise VrlCompileError(
                f"enrichment table {req['table']!r} not registered "
                f"(pass enrichment_tables={{name: DataFrame}})"
            )
        t = tables[req["table"]]
        out_col = f"__enrich_{i}"
        if hasattr(t, "membership_column"):
            # bloom/cuckoo memory table (src/enrichment_tables/memory/
            # bloom_table.rs:156-170, cuckoo_table.rs:645-656): a found
            # key returns {key, value: null[, fingerprint]}; the filter's
            # compact array broadcasts and probes executor-side — no
            # join, no shuffle.
            key_exprs = list(req["keys"].values())
            if len(key_exprs) != 1:
                raise VrlCompileError(
                    "memory filter tables take exactly one key "
                    "(Error::OnlyOneConditionAllowed)")
            row = t.membership_column(key_exprs[0], fields=True)
            if req["multi"]:
                # null (not empty array) is the established no-match
                # shape — same as the geoip containment-join path
                row = F.when(row.isNotNull(), F.array(row))
            df = df.withColumn(out_col, row)
            continue
        if hasattr(t, "snapshot"):
            # writable memory KV table: lookups join the current
            # snapshot (key, value, remaining-ttl — table.rs:69-89),
            # broadcast like any small dimension
            t = t.snapshot(df.sparkSession, include_ttl=True)
        if ("lo" in t.columns and "hi" in t.columns
                and list(req["keys"]) == ["ip"]):
            # geoip/mmdb RANGE table (src/enrichment_tables/geoip.rs,
            # mmdb.rs: queried with an "ip" condition): containment
            # join aton(ip) BETWEEN lo AND hi — broadcast, fact side
            # unshuffled, the mmdb_enrich plan shape. MMDB ranges are
            # disjoint by construction, so ≤1 match per event. Planned
            # as the block-bucketed broadcast HASH join (per-event hash
            # probe on ipn>>16 + residual range check), not the nested-
            # loop per-event scan of the whole range table — see
            # functions/mmdb.ip_range_block_join.
            from vector_spark.functions.mmdb import ip_range_block_join
            from vector_spark.functions.vrl import VRL_FUNCTIONS

            aton = VRL_FUNCTIONS["ip_aton"]
            data_cols = [c for c in t.columns if c not in ("lo", "hi")]
            # backticked: mmdb-flattened names contain dots
            rrow = F.struct(
                *[F.col(f"`{c}`").alias(c) for c in data_cols])
            tagged = t.select(
                "lo", "hi",
                (F.array(rrow) if req["multi"] else rrow)
                .alias(out_col))
            ipn_col = f"__enrich_ipn_{i}"
            df = ip_range_block_join(
                df.withColumn(
                    ipn_col, aton(req["keys"]["ip"].cast("string"))
                ),
                tagged,
                ipn_col=ipn_col,
            ).drop(ipn_col, "lo", "hi")
            continue
        row = F.struct(*[F.col(c) for c in t.columns])
        eq_keys = [k for k, v in req["keys"].items()
                   if not isinstance(v, dict)]
        rng = {k: v for k, v in req["keys"].items() if isinstance(v, dict)}
        wildcard = req.get("wildcard")
        if rng:
            # date-range conditions ({"col": {"from": …, "to": …}},
            # file.rs BetweenDates/FromDate/ToDate, bounds inclusive):
            # collapse the table per eq-key into an ARRAY of
            # {range cells, row} candidates (enrichment tables are
            # broadcast-small by contract), join on the eq keys alone,
            # then filter candidates per event Column-side — the join
            # stays 1:1, no fact-row duplication to dedupe.
            if wildcard is not None:
                raise VrlCompileError(
                    "wildcard together with date conditions is not "
                    "supported (exact-or-wildcard-row indexing has no "
                    "per-range analog)")
            rng_keys = list(rng)
            entry = F.struct(
                *[F.col(k).alias(f"rng_{j}") for j, k in enumerate(rng_keys)],
                row.alias("row"),
            )
            collapsed = (
                t.groupBy(*eq_keys) if eq_keys else t.groupBy()
            ).agg(F.collect_list(entry).alias("__cand"))
            sel = []
            cond = None
            for j, k in enumerate(eq_keys):
                kc = F.col(f"__ek_{i}_{j}")
                sel.append(F.col(k).alias(f"__ek_{i}_{j}"))
                left = req["keys"][k]
                if not req["case_sensitive"]:
                    left = F.lower(left.cast("string"))
                    kc = F.lower(kc.cast("string"))
                c = left == kc
                cond = c if cond is None else cond & c
            tagged = collapsed.select(*sel, "__cand")
            df = df.join(
                F.broadcast(tagged),
                on=cond if cond is not None else F.lit(True),
                how="left",
            ).drop(*[f"__ek_{i}_{j}" for j in range(len(eq_keys))])

            def _make_in_range(_rng, _keys):
                def _in_range(e):
                    mcond = F.lit(True)
                    for j, k in enumerate(_keys):
                        cell = e.getField(f"rng_{j}")
                        bounds = _rng[k]
                        if bounds.get("from") is not None:
                            mcond = mcond & (cell >= bounds["from"])
                        if bounds.get("to") is not None:
                            mcond = mcond & (cell <= bounds["to"])
                    return mcond

                return _in_range

            matched = F.filter(F.col("__cand"), _make_in_range(rng, rng_keys))
            if req["multi"]:
                val = F.when(
                    F.size(matched) > 0,
                    F.transform(matched, lambda e: e.getField("row")),
                )
            else:
                val = F.get(matched, 0).getField("row")
            df = df.withColumn(out_col, val).drop("__cand")
            continue
        key_cols = eq_keys
        if req["multi"]:
            collapsed = (
                t.groupBy(*key_cols)
                .agg(F.collect_list(row).alias(out_col))
            )
        else:
            # first row per key, deterministic by the table's column order
            collapsed = (
                t.groupBy(*key_cols)
                .agg(F.min(row).alias(out_col))
            )
        sel = []
        cond = None
        for j, k in enumerate(key_cols):
            kc = F.col(f"__ek_{i}_{j}")
            sel.append(F.col(k).alias(f"__ek_{i}_{j}"))
            left = req["keys"][k]
            if not req["case_sensitive"]:
                left, kc = F.lower(left.cast("string")), F.lower(kc.cast("string"))
            c = left == kc
            cond = c if cond is None else cond & c
        tagged = collapsed.select(*sel, out_col)
        df = df.join(F.broadcast(tagged), on=cond, how="left").drop(
            *[f"__ek_{i}_{j}" for j in range(len(key_cols))]
        )
        if wildcard is not None:
            # exact-or-wildcard-row indexing (file.rs
            # indexed_with_wildcard:499-516): a failed exact lookup
            # falls back to the row whose key cells hold the wildcard
            # VALUE. That row broadcasts as ≤1 extra row; the fact side
            # stays 1:1. (The sequential-scan path's per-field OR —
            # row_equals:340-345 — is wider; out of scope, documented.)
            wlit = F.lit(wildcard)
            wcond = None
            for k in key_cols:
                cell = F.col(k)
                if not req["case_sensitive"]:
                    c2 = (
                        F.lower(cell.cast("string"))
                        == F.lower(wlit.cast("string"))
                    )
                else:
                    c2 = cell == wlit
                wcond = c2 if wcond is None else wcond & c2
            wtag = collapsed.where(
                wcond if wcond is not None else F.lit(False)
            ).select(F.col(out_col).alias(f"{out_col}_w"))
            df = df.join(F.broadcast(wtag), on=F.lit(True), how="left")
            df = df.withColumn(
                out_col, F.coalesce(F.col(out_col), F.col(f"{out_col}_w"))
            ).drop(f"{out_col}_w")
    return df


def vrl_remap(
    df,
    source: str,
    drop_on_abort: bool = False,
    enrichment_tables: dict | None = None,
    **remap_kwargs,
):
    """remap driven by VRL source text: compile → operators.remap.

    An unconditional `abort` discards all changes for every event
    (behavior corpus remap_abort): forward the ORIGINAL stream, or drop
    it all under drop_on_abort (`remap.rs:142`).

    enrichment_tables: name → DataFrame registry resolving
    get_enrichment_table_record / find_enrichment_table_records calls —
    each becomes one broadcast join ahead of the projection (the same
    plan shape the enrich operator pins in test_plans)."""
    from vector_spark.operators.remap import remap

    # secrets ride in the `_secrets` map column; sources without one get
    # an empty map so secret fns resolve (read of absent secret -> null)
    if "secret" in source and "_secrets" not in df.columns:
        df = df.withColumn(
            "_secrets",
            F.lit(None).cast("map<string,string>"),
        )

    # `. = expr` followed by further statements: stage the replacement,
    # then run the rest of the program against the REPLACED event's
    # schema (the corpus parse_regex shape). Statement split is at the
    # first newline — root-replacement exprs are single-line in VRL
    # practice; a multi-line expr falls through to the single-statement
    # path's clearer error.
    m = re.match(r"\s*\.\s*=\s*([^\n]+)\n(.*)$", source, re.S)
    if m and m.group(2).strip():
        head = ". = " + m.group(1)
        # The staged head must honor the caller's error routing: a row
        # that errors during root replacement (all-null fields) is dropped
        # or rerouted exactly like a tail-statement error — not silently
        # continued (review finding r3).
        drop_on_error = remap_kwargs.get("drop_on_error", False)
        reroute = remap_kwargs.get("reroute_dropped", False)
        head_res = vrl_remap(
            df, head, drop_on_abort=drop_on_abort,
            enrichment_tables=enrichment_tables,
            drop_on_error=drop_on_error, reroute_dropped=reroute,
        )
        staged = head_res[""]
        if "_error" in staged.columns:
            staged = staged.drop("_error")
        tail = vrl_remap(
            staged, m.group(2), drop_on_abort=drop_on_abort,
            enrichment_tables=enrichment_tables, **remap_kwargs,
        )
        if reroute and "dropped" in head_res:
            hd = head_res["dropped"]
            td = tail.get("dropped")
            tail["dropped"] = (
                td.unionByName(hd, allowMissingColumns=True)
                if td is not None
                else hd
            )
        return tail

    # known_cols makes absent-field reads compile to null (VRL contract);
    # dtypes feed timestamp-aware rendering
    assignments, aborted, enrich = compile_vrl_full(
        source, known_cols=set(df.columns), known_dtypes=dict(df.dtypes)
    )
    df = _resolve_enrichment(df, enrich, enrichment_tables or {})
    if aborted:
        none = df.where(F.lit(False))
        result = {"": none if drop_on_abort else df}
        if remap_kwargs.get("reroute_dropped"):
            result["dropped"] = df if drop_on_abort else none
        return result
    if assignments and assignments[0].out == "__root__":
        # `. = expr` whole-event replacement: a STRUCT result's fields
        # become the new event. Error rows (fallible root expr, e.g. a
        # no-match enrichment lookup) have all-null fields — the original
        # event's schema no longer exists post-replacement; drop_on_error
        # / reroute_dropped route them like any other remap error.
        a = assignments[0]
        err = a.error_when if a.error_when is not None else F.lit(False)
        tagged = df.withColumn("_error", F.coalesce(err, F.lit(False)))
        probe = tagged.select(a.expr.alias("__r"))
        dt = probe.schema[0].dataType
        from pyspark.sql.types import ArrayType, MapType, StructType

        if isinstance(dt, StructType):
            replaced = tagged.select("_error", a.expr.alias("__r")).select(
                "_error", "__r.*"
            )
        elif isinstance(dt, ArrayType):
            # `. = [e1, e2, ...]` — MULTI-EVENT EMISSION: each element
            # becomes one output event (remap.rs TargetEvents::Traversal /
            # vrl_target.rs, corpus remap_emit_multiple). Spark shape:
            # array-of-struct projection + explode — one narrow codegen
            # stage, no shuffle. Struct elements expand to event fields;
            # scalar elements wrap into `message` like scalar roots.
            exploded = tagged.select(
                "_error", F.explode(a.expr).alias("__r")
            )
            if isinstance(dt.elementType, StructType):
                replaced = exploded.select("_error", "__r.*")
            else:
                replaced = exploded.select(
                    "_error", F.col("__r").alias("message")
                )
        elif isinstance(dt, MapType):
            # `. = <map>` (corpus remap_function_parse_key_value): keys
            # are per-row dynamic, so the event rides as ONE map column
            # `_root_map`; top-level reads of otherwise-unknown fields
            # bridge via try_element_at (see the parser's path branch) —
            # the typed-column analog of VRL's dynamic object root.
            replaced = tagged.select(
                "_error", a.expr.alias("_root_map")
            )
        else:
            # `. = scalar` — the event becomes {message: scalar}
            # (vrl_target.rs: scalar roots land on the message key;
            # corpus remap_mapped_scalars asserts `.message == 5`)
            replaced = tagged.select("_error", a.expr.alias("message"))
        result = {}
        drop_on_error = remap_kwargs.get("drop_on_error", False)
        reroute = remap_kwargs.get("reroute_dropped", False)
        if drop_on_error or reroute:
            result[""] = replaced.where(~F.col("_error")).drop("_error")
            if reroute:
                result["dropped"] = tagged.where(F.col("_error")).drop(
                    "_error", *[f"__enrich_{i}" for i in range(len(enrich))]
                )
        else:
            result[""] = replaced
        return result

    # conditional row-level abort (`if cond { abort }`, remap.rs
    # TargetEvents + the abort rollback contract): matching rows discard
    # ALL program changes — forwarded unchanged, or dropped under
    # drop_on_abort. The condition evaluates against the event's INPUT
    # state, the same evaluation point the error-flag machinery already
    # uses (remap() computes error_when flags on the pre-program frame).
    abort_conds = [a.expr for a in assignments if a.out == "__abort__"]
    assignments = [a for a in assignments if a.out != "__abort__"]
    real = [a for a in assignments if not a.out.startswith("__del__")]
    drops = [a.out[len("__del__"):] for a in assignments if a.out.startswith("__del__")]
    drops += [a.out for a in real if a.out.startswith("__noop__")]
    drops += [f"__enrich_{i}" for i in range(len(enrich))]
    if not abort_conds:
        return remap(df, real, drop=drops, **remap_kwargs)
    acond = F.coalesce(abort_conds[0], F.lit(False))
    for c in abort_conds[1:]:
        acond = acond | F.coalesce(c, F.lit(False))
    kept, aborted = df.where(~acond), df.where(acond)
    result = remap(kept, real, drop=drops, **remap_kwargs)
    enrich_cols = [f"__enrich_{i}" for i in range(len(enrich))]
    aborted_orig = aborted.drop(*enrich_cols)
    if drop_on_abort:
        if remap_kwargs.get("reroute_dropped"):
            d = result.get("dropped")
            result["dropped"] = (
                d.unionByName(aborted_orig, allowMissingColumns=True)
                if d is not None
                else aborted_orig
            )
    else:
        # rollback: the original event continues, new fields stay null
        result[""] = result[""].unionByName(
            aborted_orig, allowMissingColumns=True
        )
    return result
