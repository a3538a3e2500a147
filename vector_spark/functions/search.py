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
    value     := quoted | word                 # word may hold * wildcards
                | '>' num | '>=' num | '<' num | '<=' num
                | '[' num TO num ']'           # inclusive range

Compilation is to pure Column expressions — a search condition is
pushdown-eligible like any other predicate.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# one token = paren | [field:]"quoted" | [field:][range TO range] | word —
# the optional field prefix keeps `f:"a b"` and `f:[1 TO 2]` single tokens
_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<quoted>[^\s()]*"[^"]*") |
        (?P<range>(?:[^\s():]+:)?\[\s*[^\s\]]+\s+TO\s+[^\s\]]+\s*\]) |
        (?P<word>[^\s()]+)
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


def _value_predicate(field: str, val: str) -> Column:
    c = F.col(field)
    if val.startswith('"') and val.endswith('"'):
        return c.cast("string") == val[1:-1]
    m = re.match(r"^\[\s*(\S+)\s+TO\s+(\S+)\s*\]$", val)
    if m:
        lo, hi = m.group(1), m.group(2)
        pred = F.lit(True)
        if lo != "*":
            pred = pred & (c >= float(lo) if _num(lo) else c >= lo)
        if hi != "*":
            pred = pred & (c <= float(hi) if _num(hi) else c <= hi)
        return pred
    for op, fn in ((">=", "__ge__"), ("<=", "__le__"), (">", "__gt__"), ("<", "__lt__")):
        if val.startswith(op):
            rest = val[len(op):]
            rhs = float(rest) if _num(rest) else rest
            return getattr(c, fn)(rhs)
    like = _wildcard_to_like(val)
    if like is not None:
        return c.cast("string").like(like)
    return c.cast("string") == val


def _num(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


class _Parser:
    def __init__(self, tokens: list[str], default_field: str):
        self.toks = tokens
        self.i = 0
        self.default_field = default_field

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
        m = re.match(r"^([A-Za-z_][\w.]*):(.+)$", t)
        if m:
            return _value_predicate(m.group(1), m.group(2))
        # field:[a TO b] tokenizes as 'field:[...' only when no spaces; with
        # spaces the range is its own token following 'field:'
        if t.endswith(":") and self.peek() is not None:
            return _value_predicate(t[:-1], self.next())
        return _value_predicate(self.default_field, t)


def datadog_search(query: str, default_field: str = "message") -> Column:
    """Compile a Datadog-search-syntax condition string to a boolean Column."""
    toks = _tokens(query)
    if not toks:
        return F.lit(True)
    return _Parser(toks, default_field).parse()
