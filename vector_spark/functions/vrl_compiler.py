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


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<float>\d+\.\d+)
  | (?P<int>\d+)
  | (?P<dqstr>"(?:[^"\\]|\\.)*")
  | (?P<sqstr>'(?:[^'\\]|\\.)*')
  | (?P<path>\.[A-Za-z_][\w.]*)
  | (?P<name>[A-Za-z_]\w*)
  | (?P<op>\?\?|==|!=|<=|>=|&&|\|\||[-+*/%<>=!(){},])
    """,
    re.VERBOSE,
)

_KEYWORDS = {"if", "else", "true", "false", "null", "del"}


@dataclass
class _Tok:
    kind: str
    text: str


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
        toks.append(_Tok(kind, m.group()))
    return toks


_STRING_FNS = {
    "upcase", "downcase", "strip_whitespace", "to_string", "truncate",
    "slice", "replace", "join", "format_timestamp", "encode_base64",
    "decode_base64", "encode_json", "md5", "sha1", "sha2", "parse_regex",
}


class _P:
    """Recursive-descent parser producing Column expressions directly."""

    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.i = 0
        self.fallible_flags: list[Column] = []  # error conds from fn! calls
        # VRL `+` is string concat when either operand is a string; Catalyst
        # can't tell us pre-analysis, so the parser tracks "known string"
        # provenance (string literals + string-returning stdlib calls)
        self._is_str = False

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
            left = F.coalesce(left, right)
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
            op = self.eat().text
            right = self.add()
            left = {
                "==": lambda a, b: a == b,
                "!=": lambda a, b: a != b,
                "<": lambda a, b: a < b,
                "<=": lambda a, b: a <= b,
                ">": lambda a, b: a > b,
                ">=": lambda a, b: a >= b,
            }[op](left, right)
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
                left = left / right
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
        return self.primary()

    def primary(self) -> Column:
        self._is_str = False
        t = self.peek()
        if t is None:
            raise VrlCompileError("unexpected end of expression")
        if t.text == "(":
            self.eat()
            e = self.expr()
            self.eat(")")
            return e
        if t.kind == "path":
            self.eat()
            return F.col(t.text[1:])  # .a.b → col("a.b") (struct access)
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
            return F.lit(
                body.replace(r"\"", '"').replace(r"\'", "'").replace(r"\\", "\\")
            )
        if t.kind == "name":
            if t.text == "true":
                self.eat()
                return F.lit(True)
            if t.text == "false":
                self.eat()
                return F.lit(False)
            if t.text == "null":
                self.eat()
                return F.lit(None)
            if t.text == "if":
                return self.if_expr()
            return self.call()
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
        name = self.eat().text
        fallible = False
        if self.at("!"):
            self.eat()
            fallible = True
        self.eat("(")
        args: list = []
        while not self.at(")"):
            args.append(self.arg())
            if self.at(","):
                self.eat()
        self.eat(")")
        if name not in VRL_FUNCTIONS:
            raise VrlCompileError(f"unknown function {name!r}")
        result = VRL_FUNCTIONS[name](*args)
        self._is_str = name in _STRING_FNS
        if fallible and args and isinstance(args[0], Column):
            # fn!(x): error when input present but result null
            self.fallible_flags.append(args[0].isNotNull() & result.isNull())
        return result

    def arg(self):
        """Function args: Column exprs, or bare literals passed as Python
        values (regex patterns, format strings, counts)."""
        t = self.peek()
        if t is not None and t.kind in ("dqstr", "sqstr"):
            nxt = self.toks[self.i + 1].text if self.i + 1 < len(self.toks) else None
            if nxt in (",", ")"):
                self.eat()
                return t.text[1:-1]
        if t is not None and t.kind == "int":
            nxt = self.toks[self.i + 1].text if self.i + 1 < len(self.toks) else None
            if nxt in (",", ")"):
                self.eat()
                return int(t.text)
        return self.expr()


def compile_vrl(source: str) -> list[Assignment]:
    """Compile a straight-line VRL program into remap Assignments.

    Each `.out = expr` statement yields one Assignment; `fn!` calls inside
    attach their error condition so remap's drop_on_error /
    reroute_dropped applies. `del(.field)` yields Assignment(out, None)
    consumed by vrl_remap below.
    """
    toks = _lex(source)
    p = _P(toks)
    assignments: list[Assignment] = []
    deletes: list[str] = []
    while p.peek() is not None:
        t = p.peek()
        if t.kind == "name" and t.text == "del":
            p.eat()
            p.eat("(")
            path = p.eat()
            if path.kind != "path":
                raise VrlCompileError("del() takes a path")
            p.eat(")")
            deletes.append(path.text[1:])
            continue
        if t.kind != "path":
            raise VrlCompileError(f"statement must start with a path, got {t.text!r}")
        p.eat()
        p.eat("=")
        p.fallible_flags = []
        expr = p.expr()
        err: Column | None = None
        for flag in p.fallible_flags:
            err = flag if err is None else (err | flag)
        assignments.append(Assignment(t.text[1:], expr, err))
    for d in deletes:
        assignments.append(Assignment(f"__del__{d}", F.lit(None)))
    return assignments


def vrl_remap(df, source: str, **remap_kwargs):
    """remap driven by VRL source text: compile → operators.remap."""
    from vector_spark.operators.remap import remap

    assignments = compile_vrl(source)
    real = [a for a in assignments if not a.out.startswith("__del__")]
    drops = [a.out[len("__del__"):] for a in assignments if a.out.startswith("__del__")]
    return remap(df, real, drop=drops, **remap_kwargs)
