"""Datadog-search-syntax conditions → Spark Column predicates.

Reference: vector's `Condition::DatadogSearch`
(`src/conditions/mod.rs:26-50`, impl in `src/conditions/datadog_search.rs`)
— the second condition dialect (besides VRL) usable by
filter/route/sample/throttle. Grammar subset implemented (the operators
vector's own tests exercise):

    expr      := or
    or        := and ( OR and )*
    and       := unary ( AND unary )*          # adjacency == AND
    unary     := NOT unary | '-' unary | primary
    primary   := '(' expr ')' | term
    term      := FIELD ':' value | value       # bare value → default field
                | '_exists_' ':' FIELD        # field is non-null / tag present
                | '_missing_' ':' FIELD
    value     := quoted | word                 # word may hold * wildcards
                | '>' num | '>=' num | '<' num | '<=' num
                | '[' v TO v ']'               # inclusive range ('*' unbounded)
                | '{' v TO v '}'               # exclusive range

`@field` facet prefixes strip to the bare column name; `\\`-escapes in
words unescape (`va\\ lue`, `va\\(lue`, ...). When a `schema` is supplied,
a term whose field is NOT a column compiles against the Datadog
tags-array convention instead (`tags` contains `"field:value"` /
prefix-matches for wildcards), mirroring the reference's
attribute-vs-tag resolution (`src/conditions/datadog_search.rs`).

Compilation is to pure Column expressions — a search condition is
pushdown-eligible like any other predicate.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# one token = paren | [field:]"quoted" | [field:][range TO range] | word —
# the optional field prefix keeps `f:"a b"` and `f:[1 TO 2]` single tokens;
# words may contain backslash-escaped spaces/parens
_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<quoted>[^\s()]*"[^"]*") |
        (?P<range>(?:[^\s():]+:)?[\[{]\s*[^\s\]}]+\s+TO\s+[^\s\]}]+\s*[\]}]) |
        (?P<word>(?:[^\s()\\]|\\.)+)
    )""",
    re.VERBOSE,
)


def _tokens(q: str) -> list[str]:
    out = []
    pos = 0
    while pos < len(q):
        m = _TOKEN.match(q, pos)
        if not m or m.end() == pos:
            break
        pos = m.end()
        out.append(next(v for v in m.groupdict().values() if v is not None))
    return out


def _wildcard_to_like(val: str) -> str | None:
    """'*' wildcards → SQL LIKE pattern (None if no wildcard present)."""
    if "*" not in val:
        return None
    esc = val.replace("%", r"\%").replace("_", r"\_")
    return esc.replace("*", "%")


def _unescape(val: str) -> str:
    return re.sub(r"\\(.)", r"\1", val)


_RANGE = re.compile(r"^([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])$")


def _value_predicate(
    field: str,
    val: str,
    schema: list[str] | None = None,
    tags_col: str = "tags",
) -> Column:
    field = field[1:] if field.startswith("@") else field
    # reserved "source" matches source OR ddsource
    # (datadog_search.rs:116-118 exists_match_multiple)
    if field == "source" and schema is not None:
        cols = [x for x in ("source", "ddsource") if x in schema]
        if cols:
            pred = None
            for x in cols:
                p = _value_predicate_col(F.col(x), val)
                pred = p if pred is None else (pred | p)
            return pred
    # attribute-vs-tag resolution (reference datadog_search.rs): a field
    # that isn't a column compiles against the tags array — and tag
    # facets probe BOTH tags and ddtags when present
    # (datadog_search.rs:108-149 any_string_match_multiple)
    if schema is not None and field not in schema:
        pred = _tag_predicate(field, val, tags_col)
        if "ddtags" in schema and tags_col != "ddtags":
            pred = pred | _tag_predicate(field, val, "ddtags")
        return pred
    c = F.col(field)
    return _value_predicate_col(c, val)


def _value_predicate_col(c: Column, val: str) -> Column:
    """Scalar-column half of _value_predicate (shared by the reserved
    multi-field ORs)."""
    if val.startswith('"') and val.endswith('"'):
        return c.cast("string") == val[1:-1]
    m = _RANGE.match(val)
    if m:
        excl = m.group(1) == "{"
        lo, hi = m.group(2), m.group(3)
        pred = F.lit(True)
        if lo != "*":
            rhs = float(lo) if _num(lo) else lo
            pred = pred & ((c > rhs) if excl else (c >= rhs))
        if hi != "*":
            rhs = float(hi) if _num(hi) else hi
            pred = pred & ((c < rhs) if excl else (c <= rhs))
        return pred
    for op, fn in ((">=", "__ge__"), ("<=", "__le__"), (">", "__gt__"), ("<", "__lt__")):
        if val.startswith(op):
            rest = val[len(op):]
            rhs = float(rest) if _num(rest) else rest
            return getattr(c, fn)(rhs)
    like = _wildcard_to_like(val)
    if like is not None:
        return c.cast("string").like(like)
    return c.cast("string") == _unescape(val)


def _tag_predicate(field: str, val: str, tags_col: str) -> Column:
    """`field:value` against a Datadog tags array column: the tag string
    is `"field:value"`; ranges/comparisons apply to the tag's value part."""
    tags = F.col(tags_col)
    prefix = field + ":"
    tag_val = lambda t: F.substring(t, len(prefix) + 1, 2**18)
    has_field = lambda t: t.startswith(prefix)

    m = _RANGE.match(val)
    ops = [(">=", "__ge__"), ("<=", "__le__"), (">", "__gt__"), ("<", "__lt__")]
    op = next((o for o in ops if val.startswith(o[0])), None)
    if m:
        excl = m.group(1) == "{"
        lo, hi = m.group(2), m.group(3)

        def in_range(t):
            v = tag_val(t)
            pred = has_field(t)
            if lo != "*":
                lhs = v.cast("double") if _num(lo) else v
                rhs = float(lo) if _num(lo) else lo
                pred = pred & ((lhs > rhs) if excl else (lhs >= rhs))
            if hi != "*":
                lhs = v.cast("double") if _num(hi) else v
                rhs = float(hi) if _num(hi) else hi
                pred = pred & ((lhs < rhs) if excl else (lhs <= rhs))
            return pred

        return F.exists(tags, in_range)
    if op is not None:
        rest = val[len(op[0]):]
        rhs = float(rest) if _num(rest) else rest

        def cmp(t):
            v = tag_val(t).cast("double") if _num(rest) else tag_val(t)
            return has_field(t) & getattr(v, op[1])(rhs)

        return F.exists(tags, cmp)
    if val.startswith('"') and val.endswith('"'):
        return F.array_contains(tags, prefix + val[1:-1])
    like = _wildcard_to_like(val)
    if like is not None:
        esc_prefix = prefix.replace("%", r"\%").replace("_", r"\_")
        return F.exists(tags, lambda t: t.like(esc_prefix + like))
    return F.array_contains(tags, prefix + _unescape(val))


def _exists_predicate(
    field: str, schema: list[str] | None, tags_col: str
) -> Column:
    """`_exists_:f` — non-null column, or `f:*` tag present."""
    field = field[1:] if field.startswith("@") else field
    if schema is not None and field not in schema:
        prefix = field + ":"
        return F.exists(F.col(tags_col), lambda t: t.startswith(prefix))
    return F.col(field).isNotNull()


def _num(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


class _Parser:
    def __init__(
        self,
        tokens: list[str],
        default_field: str,
        schema: list[str] | None = None,
        tags_col: str = "tags",
    ):
        self.toks = tokens
        self.i = 0
        self.default_field = default_field
        self.schema = schema
        self.tags_col = tags_col

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise ValueError("unexpected end of query")
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self) -> Column:
        e = self.or_()
        if self.peek() is not None:
            raise ValueError(f"unexpected token: {self.peek()!r}")
        return e

    def or_(self) -> Column:
        left = self.and_()
        while self.peek() is not None and self.peek().upper() == "OR":
            self.next()
            left = left | self.and_()
        return left

    def and_(self) -> Column:
        left = self.unary()
        while True:
            t = self.peek()
            if t is None or t.upper() == "OR" or t == ")":
                return left
            if t.upper() == "AND":
                self.next()
                t = self.peek()
                if t is None:
                    raise ValueError("dangling AND")
            left = left & self.unary()

    def unary(self) -> Column:
        t = self.peek()
        if t is not None and (t.upper() == "NOT" or t == "-"):
            self.next()
            return ~self.unary()
        if t is not None and t.startswith("-") and len(t) > 1:
            self.toks[self.i] = t[1:]
            return ~self.unary()
        return self.primary()

    def primary(self) -> Column:
        t = self.peek()
        if t == "(":
            self.next()
            e = self.or_()
            if self.peek() != ")":
                raise ValueError("unbalanced parens")
            self.next()
            return e
        return self.term()

    def term(self) -> Column:
        t = self.next()
        m = re.match(r"^(@?[A-Za-z_][\w.-]*):(.+)$", t)
        if m:
            fld, val = m.group(1), m.group(2)
            if fld == "_exists_":
                return _exists_predicate(val, self.schema, self.tags_col)
            if fld == "_missing_":
                return ~_exists_predicate(val, self.schema, self.tags_col)
            return _value_predicate(fld, val, self.schema, self.tags_col)
        # field:[a TO b] tokenizes as 'field:[...' only when no spaces; with
        # spaces the range is its own token following 'field:'
        if t.endswith(":") and self.peek() is not None:
            return _value_predicate(t[:-1], self.next(), self.schema, self.tags_col)
        return _value_predicate(
            self.default_field, t, self.schema, self.tags_col
        )


def datadog_search(
    query: str,
    default_field: str = "message",
    schema: list[str] | None = None,
    tags_col: str = "tags",
) -> Column:
    """Compile a Datadog-search-syntax condition string to a boolean Column.

    schema: when given (a DataFrame's .columns), unknown fields resolve
    against the `tags_col` array per the Datadog tag convention instead
    of erroring at analysis — the reference's attribute-vs-tag split."""
    toks = _tokens(query)
    if not toks:
        return F.lit(True)
    return _Parser(toks, default_field, schema, tags_col).parse()
