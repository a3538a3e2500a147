"""Lua 5.4 string-pattern matcher (clean-room, from the public Lua
reference manual §6.4.1) for the Lua-subset interpreter
(functions/lua_interp.py) backing the `lua` transform
(src/transforms/lua/). string.find/match/gmatch/gsub with patterns are
the most common stdlib use in real transform hooks; until r11 they
raised a loud scope error.

Supported (the full pattern grammar):
- classes: `.` `%a %c %d %g %l %p %s %u %w %x` (+ uppercase
  complements), `%<punct>` escapes, sets `[...]` with `^` negation,
  ranges and classes inside sets
- items: class with `*` `+` `-` (lazy) `?` quantifiers
- anchors `^` and `$`, captures `(...)`, position captures `()`,
  back-references `%1`-`%9`, balanced match `%bxy`, frontier `%f[set]`

Character classes use the C-locale (ASCII) definitions like stock Lua.
Implementation is the standard backtracking matcher, written against
the manual's semantics (not a translation of lstrlib.c).
"""

from __future__ import annotations

_SPECIALS = "^$*+?.([%-"
_WS = " \t\n\r\f\v"
_POSCAP = -2  # position capture marker
_UNCLOSED = -1


class LuaPatternError(ValueError):
    pass


def _class_match(c: str, cl: str) -> bool:
    low = cl.lower()
    o = ord(c)
    if low == "a":
        r = c.isascii() and c.isalpha()
    elif low == "c":
        r = o < 32 or o == 127
    elif low == "d":
        r = "0" <= c <= "9"
    elif low == "g":
        r = 32 < o < 127
    elif low == "l":
        r = "a" <= c <= "z"
    elif low == "p":
        r = 32 < o < 127 and not (c.isascii() and c.isalnum())
    elif low == "s":
        r = c in _WS
    elif low == "u":
        r = "A" <= c <= "Z"
    elif low == "w":
        r = c.isascii() and c.isalnum()
    elif low == "x":
        r = c in "0123456789abcdefABCDEF"
    else:
        return c == cl  # %<punct> escape
    return r if cl == low else not r


class _Matcher:
    def __init__(self, s: str, p: str) -> None:
        self.s = s
        self.p = p
        self.caps: list[list[int]] = []  # [start, len] ; len<0 = marker

    # ---- pattern-structure helpers

    def _class_end(self, pi: int) -> int:
        """Index just past the single-class item starting at pi."""
        p = self.p
        c = p[pi]
        pi += 1
        if c == "%":
            if pi >= len(p):
                raise LuaPatternError("malformed pattern (ends with '%')")
            return pi + 1
        if c == "[":
            if pi < len(p) and p[pi] == "^":
                pi += 1
            first = True
            while True:
                if pi >= len(p):
                    raise LuaPatternError(
                        "malformed pattern (missing ']')")
                ch = p[pi]
                pi += 1
                if ch == "%":
                    pi += 1
                elif ch == "]" and not first:
                    return pi
                first = False
        return pi

    def _single_match(self, si: int, pi: int, ep: int) -> bool:
        if si >= len(self.s):
            return False
        c = self.s[si]
        pc = self.p[pi]
        if pc == ".":
            return True
        if pc == "%":
            return _class_match(c, self.p[pi + 1])
        if pc == "[":
            return self._set_match(c, pi, ep)
        return pc == c

    def _set_match(self, c: str, pi: int, ep: int) -> bool:
        """pi at '[', ep just past ']'."""
        p = self.p
        i = pi + 1
        negate = False
        if p[i] == "^":
            negate = True
            i += 1
        found = False
        while i < ep - 1:
            if p[i] == "%":
                if _class_match(c, p[i + 1]):
                    found = True
                i += 2
            elif i + 2 < ep - 1 and p[i + 1] == "-":
                if p[i] <= c <= p[i + 2]:
                    found = True
                i += 3
            else:
                if p[i] == c:
                    found = True
                i += 1
        return found != negate

    # ---- the matcher proper (returns end index or None)

    def match(self, si: int, pi: int):
        s, p = self.s, self.p
        while True:
            if pi >= len(p):
                return si
            c = p[pi]
            if c == "(":
                if pi + 1 < len(p) and p[pi + 1] == ")":  # position capture
                    self.caps.append([si, _POSCAP])
                    r = self.match(si, pi + 2)
                    if r is None:
                        self.caps.pop()
                    return r
                self.caps.append([si, _UNCLOSED])
                r = self.match(si, pi + 1)
                if r is None:
                    self.caps.pop()
                return r
            if c == ")":
                for cap in reversed(self.caps):
                    if cap[1] == _UNCLOSED:
                        cap[1] = si - cap[0]
                        r = self.match(si, pi + 1)
                        if r is None:
                            cap[1] = _UNCLOSED
                        return r
                raise LuaPatternError("invalid pattern capture")
            if c == "$" and pi + 1 == len(p):
                return si if si == len(s) else None
            if c == "%" and pi + 1 < len(p):
                nxt = p[pi + 1]
                if nxt == "b":  # balanced %bxy
                    if pi + 3 >= len(p):
                        raise LuaPatternError("missing arguments to '%b'")
                    x, y = p[pi + 2], p[pi + 3]
                    if si >= len(s) or s[si] != x:
                        return None
                    depth = 1
                    j = si + 1
                    while j < len(s):
                        if s[j] == y:
                            depth -= 1
                            if depth == 0:
                                return self.match(j + 1, pi + 4)
                        elif s[j] == x:
                            depth += 1
                        j += 1
                    return None
                if nxt == "f":  # frontier %f[set]
                    if pi + 2 >= len(p) or p[pi + 2] != "[":
                        raise LuaPatternError(
                            "missing '[' after '%f' in pattern")
                    ep = self._class_end(pi + 2)
                    prev = s[si - 1] if si > 0 else "\0"
                    cur = s[si] if si < len(s) else "\0"
                    if (not self._set_match(prev, pi + 2, ep)
                            and self._set_match(cur, pi + 2, ep)):
                        pi = ep
                        continue
                    return None
                if nxt.isdigit():  # back-reference %1-%9
                    idx = int(nxt) - 1
                    if idx >= len(self.caps) or self.caps[idx][1] < 0:
                        raise LuaPatternError(
                            f"invalid capture index %{nxt}")
                    start, ln = self.caps[idx]
                    ref = s[start:start + ln]
                    if s.startswith(ref, si):
                        si += len(ref)
                        pi += 2
                        continue
                    return None
            # a single-class item, possibly quantified
            ep = self._class_end(pi)
            quant = p[ep] if ep < len(p) else ""
            if quant == "?":
                if self._single_match(si, pi, ep):
                    r = self.match(si + 1, ep + 1)
                    if r is not None:
                        return r
                pi = ep + 1
                continue
            if quant == "+":
                if not self._single_match(si, pi, ep):
                    return None
                return self._max_expand(si + 1, pi, ep)
            if quant == "*":
                return self._max_expand(si, pi, ep)
            if quant == "-":
                return self._min_expand(si, pi, ep)
            if not self._single_match(si, pi, ep):
                return None
            si += 1
            pi = ep

    def _max_expand(self, si: int, pi: int, ep: int):
        n = 0
        while self._single_match(si + n, pi, ep):
            n += 1
        while n >= 0:
            r = self.match(si + n, ep + 1)
            if r is not None:
                return r
            n -= 1
        return None

    def _min_expand(self, si: int, pi: int, ep: int):
        while True:
            r = self.match(si, ep + 1)
            if r is not None:
                return r
            if self._single_match(si, pi, ep):
                si += 1
            else:
                return None

    def captures(self, mstart: int, mend: int,
                 whole_if_none: bool = True) -> list:
        if not self.caps:
            return [self.s[mstart:mend]] if whole_if_none else []
        out = []
        for start, ln in self.caps:
            if ln == _POSCAP:
                out.append(start + 1)  # 1-based position
            else:
                out.append(self.s[start:start + ln])
        return out


def _norm_init(s: str, init) -> int:
    init = 1 if init is None else int(init)
    if init < 0:
        init = max(len(s) + init + 1, 1)
    elif init == 0:
        init = 1
    return init - 1  # 0-based


def _run(s: str, p: str, si: int):
    """Try the pattern at successive positions from si; honours a
    leading '^' anchor. Returns (start, end, matcher) or None."""
    anchored = p.startswith("^")
    pi = 1 if anchored else 0
    while True:
        m = _Matcher(s, p)
        r = m.match(si, pi)
        if r is not None:
            return si, r, m
        if anchored or si >= len(s):
            return None
        si += 1


def lua_find(s: str, pat: str, init=1, plain=False):
    """string.find → [start, end, cap1, ...] (1-based) or [None]."""
    si = _norm_init(s, init)
    if plain:
        idx = s.find(pat, si)
        return [None] if idx < 0 else [idx + 1, idx + len(pat)]
    r = _run(s, pat, si)
    if r is None:
        return [None]
    start, end, m = r
    return [start + 1, end] + m.captures(start, end, whole_if_none=False)


def lua_match(s: str, pat: str, init=1):
    """string.match → [cap1, ...] (whole match when no captures)."""
    r = _run(s, pat, _norm_init(s, init))
    if r is None:
        return [None]
    start, end, m = r
    return m.captures(start, end)


def lua_gmatch(s: str, pat: str):
    """string.gmatch → stateful iterator function."""
    state = {"si": 0}

    def it(*_args):
        while state["si"] <= len(s):
            r = _run(s, pat, state["si"])
            if r is None:
                return [None]
            start, end, m = r
            # empty match must still advance (Lua gmatch rule)
            state["si"] = end + 1 if end == start else end
            return m.captures(start, end)
        return [None]

    return it


def lua_gsub(s: str, pat: str, repl, n=None):
    """string.gsub → [new_string, count]. repl: string (%0-%9, %%),
    table, or function; a false/nil result keeps the original match."""
    limit = float("inf") if n is None else int(n)
    out = []
    si = 0
    count = 0
    while count < limit:
        r = _run(s, pat, si)
        if r is None:
            break
        start, end, m = r
        out.append(s[si:start])
        whole = s[start:end]
        caps = m.captures(start, end)
        rep = _apply_repl(repl, whole, caps)
        out.append(whole if rep is None or rep is False
                   else _tostr(rep))
        count += 1
        if end == start:  # empty match: emit char, advance
            if start < len(s):
                out.append(s[start])
            si = start + 1
        else:
            si = end
        if si > len(s):
            break
    out.append(s[si:])
    return ["".join(out), count]


def _tostr(v) -> str:
    if isinstance(v, bool):
        raise LuaPatternError("invalid replacement value (a boolean)")
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def _apply_repl(repl, whole: str, caps: list):
    if callable(repl):
        res = repl(*caps)
        if isinstance(res, (list, tuple)):  # multi-value return: first wins
            res = res[0] if res else None
        return res
    if hasattr(repl, "get") and not isinstance(repl, str):  # LuaTable
        return repl.get(caps[0])
    rs = str(repl)
    out = []
    i = 0
    while i < len(rs):
        c = rs[i]
        if c == "%" and i + 1 < len(rs):
            d = rs[i + 1]
            if d == "%":
                out.append("%")
            elif d == "0":
                out.append(whole)
            elif d.isdigit():
                idx = int(d) - 1
                if idx >= len(caps):
                    raise LuaPatternError(f"invalid capture index %{d}")
                out.append(_tostr(caps[idx]))
            else:
                raise LuaPatternError(
                    f"invalid use of '%' in replacement string")
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)
