"""VRL fallback interpreter: run a VRL-subset program per Arrow batch in
pandas when the Column compiler can't express it.

SURVEY §7 phase-1 risk mitigation and the reference's own execution
model (`Runtime::resolve` per event, `src/transforms/remap.rs:461`) —
except batched: the interpreter evaluates each statement once per
pandas batch (vectorized Series ops), not once per row.

Intended use: `vrl_transform(df, source)` tries the Column compiler
first (fast path: part of the query plan); on `VrlCompileError` it
falls back to this interpreter via scripted_transform — the same
"compile at config time, degrade gracefully" shape as the reference's
VRL runtime selection. Programs the interpreter adds beyond the
compiler: none yet (same grammar) — it exists so future surface
(closures, dynamic paths) can land interpreter-first.

Semantic deltas vs SQL (documented): pandas NaN ordering/equality
differs from SQL tri-state null logic on comparisons with null.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd

from vector_spark.functions.vrl_compiler import VrlCompileError, _Tok, _lex

# pandas twins of the VRL stdlib subset the interpreter supports
def _pd_str(s: pd.Series) -> pd.Series:
    return s.astype("string")


PANDAS_FNS: dict[str, Any] = {
    "upcase": lambda s: _pd_str(s).str.upper(),
    "downcase": lambda s: _pd_str(s).str.lower(),
    "strip_whitespace": lambda s: _pd_str(s).str.strip(),
    "length": lambda s: _pd_str(s).str.len(),
    "truncate": lambda s, n: _pd_str(s).str.slice(0, n),
    "starts_with": lambda s, p: _pd_str(s).str.startswith(p),
    "ends_with": lambda s, p: _pd_str(s).str.endswith(p),
    "contains": lambda s, sub: _pd_str(s).str.contains(sub, regex=False),
    "match": lambda s, pat: _pd_str(s).str.contains(pat, regex=True),
    "replace": lambda s, pat, rep: _pd_str(s).str.replace(pat, rep, regex=True),
    "parse_regex": lambda s, pat, g=1: _pd_str(s).str.extract(pat, expand=True)[g - 1],
    "to_string": lambda s: _pd_str(s),
    "to_int": lambda s: pd.to_numeric(s, errors="coerce").astype("Int64"),
    "to_float": lambda s: pd.to_numeric(s, errors="coerce").astype("float64"),
    "parse_int": lambda s: pd.to_numeric(s, errors="coerce").astype("Int64"),
    "parse_float": lambda s: pd.to_numeric(s, errors="coerce").astype("float64"),
    "round": lambda s, n=0: pd.to_numeric(s, errors="coerce").round(n),
    "abs": lambda s: pd.to_numeric(s, errors="coerce").abs(),
    "floor": lambda s: np.floor(pd.to_numeric(s, errors="coerce")),
    "ceil": lambda s: np.ceil(pd.to_numeric(s, errors="coerce")),
    "exists": lambda s: s.notna(),
    "is_null": lambda s: s.isna(),
}


def _pd_hashfn(algo):
    def fn(s: pd.Series) -> pd.Series:
        import hashlib

        return _pd_str(s).map(
            lambda x: None if pd.isna(x)
            else getattr(hashlib, algo)(str(x).encode()).hexdigest())

    return fn


def _pd_hmac(s, key, algorithm="SHA-256"):
    """hmac(value, key, algorithm:) → lowercase hex (VRL returns the
    raw bytes; hex is this interpreter's comparable form, matching the
    Column registry's encode_base16(hmac(...)) idiom)."""
    import hashlib
    import hmac as _hmac

    algo = str(algorithm).replace("-", "").lower()
    k = str(key).encode()
    return _pd_str(s).map(
        lambda x: None if pd.isna(x)
        else _hmac.new(k, str(x).encode(), getattr(hashlib, algo))
        .hexdigest())


# the custom-auth path (vrl_auth_matcher) runs real token checks:
# hashes, hmac, base64, timing-safe-enough equality over single-row
# frames — the stdlib slice those programs actually use
PANDAS_FNS.update({
    "md5": _pd_hashfn("md5"),
    "sha1": _pd_hashfn("sha1"),
    "sha2": _pd_hashfn("sha256"),
    "sha3": _pd_hashfn("sha3_256"),
    "hmac": _pd_hmac,
    "encode_base64": lambda s: _pd_str(s).map(
        lambda x: None if pd.isna(x) else __import__("base64")
        .b64encode(str(x).encode()).decode()),
    "decode_base64": lambda s: _pd_str(s).map(
        lambda x: None if pd.isna(x) else __import__("base64")
        .b64decode(str(x).encode() + b"==").decode("utf-8", "replace")),
    "strlen": lambda s: _pd_str(s).str.len(),
    "slice": lambda s, a, b=None: _pd_str(s).str.slice(a, b),
    "split": lambda s, sep, limit=-1: _pd_str(s).str.split(sep),
    "join": lambda s, sep="": s.map(
        lambda x: None if not isinstance(x, list) else str(sep).join(
            str(i) for i in x)),
})


class _Interp:
    """Recursive-descent over the same token stream as the compiler,
    evaluating directly against a pandas batch."""

    def __init__(self, toks: list[_Tok], pdf: pd.DataFrame):
        self.toks = toks
        self.i = 0
        self.pdf = pdf
        self.err = pd.Series(False, index=pdf.index)

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def at(self, text):
        t = self.peek()
        return t is not None and t.text == text

    def eat(self, text=None):
        t = self.peek()
        if t is None:
            raise VrlCompileError("unexpected end of program")
        if text is not None and t.text != text:
            raise VrlCompileError(f"expected {text!r}, got {t.text!r}")
        self.i += 1
        return t

    def _series(self, v):
        if isinstance(v, pd.Series):
            return v
        return pd.Series([v] * len(self.pdf), index=self.pdf.index)

    # grammar mirrors vrl_compiler._P
    def expr(self):
        left = self.or_()
        while self.at("??"):
            self.eat()
            right = self.or_()
            ls = self._series(left)
            left = ls.where(ls.notna(), other=right)
        return left

    def or_(self):
        left = self.and_()
        while self.at("||"):
            self.eat()
            left = self._series(left).fillna(False).astype(bool) | self._series(
                self.and_()
            ).fillna(False).astype(bool)
        return left

    def and_(self):
        left = self.cmp()
        while self.at("&&"):
            self.eat()
            left = self._series(left).fillna(False).astype(bool) & self._series(
                self.cmp()
            ).fillna(False).astype(bool)
        return left

    def cmp(self):
        left = self.add()
        while self.peek() and self.peek().text in ("==", "!=", "<", "<=", ">", ">="):
            op = self.eat().text
            right = self.add()
            import operator as _op

            left = {
                "==": _op.eq, "!=": _op.ne, "<": _op.lt,
                "<=": _op.le, ">": _op.gt, ">=": _op.ge,
            }[op](self._series(left), right)
        return left

    def add(self):
        left = self.mul()
        while self.peek() and self.peek().text in ("+", "-"):
            op = self.eat().text
            right = self.mul()
            l, r = self._series(left), right
            if op == "+" and (
                pd.api.types.is_string_dtype(l)
                or isinstance(r, str)
                or (isinstance(r, pd.Series) and pd.api.types.is_string_dtype(r))
            ):
                rs = r if isinstance(r, pd.Series) else pd.Series([r] * len(l), index=l.index)
                left = _pd_str(l) + _pd_str(rs)
            else:
                left = (l + r) if op == "+" else (l - r)
        return left

    def mul(self):
        left = self.unary()
        while self.peek() and self.peek().text in ("*", "/", "%"):
            op = self.eat().text
            right = self.unary()
            l = self._series(left)
            left = l * right if op == "*" else l / right if op == "/" else l % right
        return left

    def unary(self):
        if self.at("!"):
            self.eat()
            return ~self._series(self.unary()).astype(bool)
        if self.at("-"):
            self.eat()
            return -self._series(self.unary())
        return self.primary()

    def primary(self):
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
            name = t.text[1:]
            if name not in self.pdf.columns:
                # quoted segments name flattened columns directly
                # (`.headers."x-api-key"` → column `headers.x-api-key` —
                # the auth-context shape)
                alt = name.replace('"', "")
                if alt in self.pdf.columns:
                    return self.pdf[alt]
                raise VrlCompileError(f"unknown field .{name}")
            return self.pdf[name]
        if t.kind == "float":
            self.eat()
            return float(t.text)
        if t.kind == "int":
            self.eat()
            return int(t.text)
        if t.kind in ("dqstr", "sqstr"):
            self.eat()
            return t.text[1:-1]
        if t.kind == "name":
            if t.text == "true":
                self.eat()
                return True
            if t.text == "false":
                self.eat()
                return False
            if t.text == "null":
                self.eat()
                return None
            if t.text == "if":
                return self.if_expr()
            return self.call()
        raise VrlCompileError(f"unexpected token {t.text!r}")

    def if_expr(self):
        self.eat("if")
        cond = self._series(self.expr()).fillna(False).astype(bool)
        self.eat("{")
        then = self.expr()
        self.eat("}")
        other = None
        if self.at("else"):
            self.eat()
            if self.at("if"):
                other = self.if_expr()
            else:
                self.eat("{")
                other = self.expr()
                self.eat("}")
        return self._series(then).where(cond, other=self._series(other))

    def call(self):
        name = self.eat().text
        fallible = self.at("!")
        if fallible:
            self.eat()
        self.eat("(")
        args = []
        while not self.at(")"):
            args.append(self.expr())
            if self.at(","):
                self.eat()
        self.eat(")")
        if name not in PANDAS_FNS:
            raise VrlCompileError(f"interpreter: unknown function {name!r}")
        result = PANDAS_FNS[name](*args)
        if fallible and args and isinstance(args[0], pd.Series):
            self.err = self.err | (args[0].notna() & self._series(result).isna())
        return result


def interpret_vrl(pdf: pd.DataFrame, source: str) -> tuple[pd.DataFrame, pd.Series]:
    """Run a program over one batch; returns (output batch, error flags)."""
    toks = _lex(source)
    out = pdf.copy()
    it = _Interp(toks, out)
    while it.peek() is not None:
        t = it.peek()
        if t.kind == "name" and t.text == "del":
            it.eat()
            it.eat("(")
            path = it.eat()
            it.eat(")")
            out = out.drop(columns=[path.text[1:]], errors="ignore")
            it.pdf = out
            continue
        if t.kind != "path":
            raise VrlCompileError(f"statement must start with a path, got {t.text!r}")
        it.eat()
        it.eat("=")
        val = it.expr()
        out[t.text[1:]] = it._series(val)
        it.pdf = out
    return out, it.err


def vrl_transform(df, source: str, schema: str, force_interpret: bool = False):
    """Column-compile when possible, else interpret in pandas.

    Both paths honor the reference's error contract (`remap.rs:121-128`):
    an errored event forwards with NO assignments applied (original
    values kept, new columns null) and `_error` set. The fallback needs
    an explicit ``schema`` (pandas can't infer Spark types). Documented
    delta: `del`'d columns disappear for errored rows too — a uniform
    schema can't keep a column for only some rows.
    """
    from vector_spark.functions.vrl_compiler import vrl_remap

    if not force_interpret:
        try:
            return vrl_remap(df, source)[""]
        except VrlCompileError:
            pass

    # fail at build time, not inside an executor: every called function
    # must exist in the interpreter registry (config-time compile errors,
    # like the reference's RemapConfig::build)
    toks = _lex(source)
    for i, t in enumerate(toks):
        if (
            t.kind == "name"
            and t.text not in ("if", "else", "true", "false", "null", "del")
            and i + 1 < len(toks)
            and toks[i + 1].text in ("(", "!")
            and t.text not in PANDAS_FNS
        ):
            raise VrlCompileError(f"interpreter: unknown function {t.text!r}")

    from vector_spark.operators.script import scripted_transform

    def process(pdf: pd.DataFrame, ctx):
        out, err = interpret_vrl(pdf, source)
        err = err.fillna(False).astype(bool)
        # errored events forward unchanged: revert originals, null the new
        for c in out.columns:
            if c in pdf.columns:
                out.loc[err, c] = pdf.loc[err, c]
            else:
                out.loc[err, c] = None
        out["_error"] = err
        return out

    return scripted_transform(df, process, schema=schema)


def vrl_auth_matcher(source: str):
    """Compile a custom-auth VRL condition ONCE; returns
    ``check(headers, address, path) -> (ok, enrichment)``.

    The reference's `auth: {strategy: custom, source: ...}`
    (src/common/http/server_auth.rs:149-289): the program sees
    `.headers` (lowercased names), `.address` (client IP), `.path`,
    must end in a boolean expression, may write `%field = value`
    metadata (returned as `enrichment` for injection into
    authenticated events), and the event root is READ-ONLY — a
    `.field = value` statement is a compile error, mirroring
    `config.set_read_only_path(event_root, true)`.

    Runs in-process per request via this pandas interpreter (the
    reference resolves in-process too); no Spark job per request."""
    toks = _lex(source)
    # compile-time validation pass: unknown functions and event writes
    # fail at config build, not on the first request
    for i, t in enumerate(toks):
        nxt = toks[i + 1] if i + 1 < len(toks) else None
        if t.kind == "path" and nxt is not None and nxt.text == "=":
            if i + 2 < len(toks) and toks[i + 2].text == "=":
                continue  # `==` comparison, not assignment
            raise VrlCompileError(
                "custom auth: the event root is read-only — write "
                "%field metadata instead (server_auth.rs:157)")
        if (
            t.kind == "name"
            and t.text not in ("if", "else", "true", "false", "null")
            and nxt is not None
            and nxt.text in ("(", "!")
            and t.text not in PANDAS_FNS
        ):
            raise VrlCompileError(
                f"custom auth interpreter: unknown function {t.text!r}")

    def check(headers: dict, address, path: str):
        cols: dict = {
            "address": [address],
            "path": [str(path)],
        }
        for k, v in (headers or {}).items():
            cols[f"headers.{str(k).lower()}"] = [str(v)]
        pdf = pd.DataFrame(cols)
        it = _Interp(list(toks), pdf)
        enrichment: dict = {}
        result = None
        try:
            while it.peek() is not None:
                t = it.peek()
                nxt = it.toks[it.i + 1] if it.i + 1 < len(it.toks) else None
                if (
                    t.kind == "mpath"
                    and nxt is not None
                    and nxt.text == "="
                    and not (it.i + 2 < len(it.toks)
                             and it.toks[it.i + 2].text == "=")
                ):
                    it.eat()
                    it.eat("=")
                    val = it.expr()
                    if isinstance(val, pd.Series):
                        val = val.iloc[0] if len(val) else None
                    enrichment[t.text[1:]] = val
                    continue
                result = it.expr()
        except VrlCompileError:
            # an unknown header read etc. → auth failed, not a crash
            return False, {}
        if isinstance(result, pd.Series):
            result = bool(result.fillna(False).iloc[0]) if len(result) else False
        # non-boolean return = rejected (server_auth.rs "Invalid return
        # value")
        ok = result is True
        return ok, (enrichment if ok else {})

    return check
