"""Lua 5.4 string patterns (functions/lua_patterns.py) — examples from
the public Lua reference manual §6.4.1 plus PiL's pattern chapters,
driven both directly and through the interpreter (the `lua` transform's
scripting surface, src/transforms/lua/). Before r11 string patterns
raised a loud scope error."""

from __future__ import annotations

import pytest

from vector_spark.functions.lua_patterns import (
    LuaPatternError,
    lua_find,
    lua_gmatch,
    lua_gsub,
    lua_match,
)


# ---------------------------------------------------------------------------
# find / match


def test_find_basic_and_captures():
    assert lua_find("hello world", "o w") == [5, 7]
    assert lua_find("hello world", "xyz") == [None]
    assert lua_find("hello", "l+") == [3, 4]
    # captures come after start/end
    assert lua_find("key=value", "(%w+)=(%w+)") == [1, 9, "key", "value"]
    # init offset (1-based) and negative init
    assert lua_find("aaa", "a", 2) == [2, 2]
    assert lua_find("hello", "l", -2) == [4, 4]
    # plain find ignores magic characters
    assert lua_find("a.b", ".", 1, plain=True) == [2, 2]


def test_match_classes_and_anchors():
    assert lua_match("hello 42 world", "%d+") == ["42"]
    assert lua_match("   pad", "^%s*(%w+)") == ["pad"]
    assert lua_match("ends here", "here$") == ["here"]
    assert lua_match("nope", "^here") == [None]
    assert lua_match("MixEd", "%u%l+") == ["Mix"]
    assert lua_match("x=3.14;", "[%d.]+") == ["3.14"]
    # complement classes
    assert lua_match("abc123", "%D+") == ["abc"]
    # set negation + ranges
    assert lua_match("foo-bar", "[^-]+") == ["foo"]
    assert lua_match("q9z", "[a-p]") == [None]


def test_match_quantifiers():
    assert lua_match("<<tag>>", "<(.-)>") == ["<tag"]   # lazy
    assert lua_match("<<tag>>", "<(.*)>") == ["<tag>"]  # greedy
    assert lua_match("color", "colou?r") == ["color"]
    assert lua_match("colour", "colou?r") == ["colour"]


def test_position_capture_and_backref():
    # PiL: position capture yields the 1-based position
    assert lua_match("hello", "l()l") == [4]
    # back-reference: doubled word
    assert lua_match("abc abc", "(%w+) %1") == ["abc"]
    assert lua_match("abc def", "(%w+) %1") == [None]


def test_balanced_and_frontier():
    # manual: %b() matches balanced parens
    assert lua_match("f(a(b)c)d", "%b()") == ["(a(b)c)"]
    # manual example: %f[%w] frontier
    assert lua_find("THE (quick) fox", "%f[%a]%u+%f[%A]") == [1, 3]


def test_malformed_patterns_raise():
    with pytest.raises(LuaPatternError):
        lua_match("x", "[unclosed")
    with pytest.raises(LuaPatternError):
        lua_match("x", "%")
    with pytest.raises(LuaPatternError):
        # index checked when the backref is REACHED (stock Lua ditto)
        lua_match("ab ab", "(%w+) %9")


# ---------------------------------------------------------------------------
# gmatch / gsub


def test_gmatch_words_and_pairs():
    it = lua_gmatch("one two three", "%a+")
    got = []
    while True:
        vs = it(None, None)
        if vs[0] is None:
            break
        got.append(vs[0])
    assert got == ["one", "two", "three"]
    # the manual's key=value example with two captures
    it = lua_gmatch("a=1, b=2", "(%w+)=(%w+)")
    assert it(None, None) == ["a", "1"]
    assert it(None, None) == ["b", "2"]
    assert it(None, None) == [None]


def test_gsub_manual_examples():
    # the four canonical examples from the manual's gsub section
    assert lua_gsub("hello world", "(%w+)", "%1 %1") == \
        ["hello hello world world", 2]
    assert lua_gsub("hello world", "%w+", "%0 %0", 1) == \
        ["hello hello world", 1]
    assert lua_gsub("hello world from Lua", "(%w+)%s*(%w+)", "%2 %1") == \
        ["world hello Lua from", 2]
    assert lua_gsub("hello world", "%w+",
                    lambda w: w.upper()) == ["HELLO WORLD", 2]


def test_gsub_table_function_and_nil_keeps():
    class T(dict):
        def get(self, k):
            return dict.get(self, k)
    t = T({"name": "lua", "version": "5.4"})
    assert lua_gsub("$name-$version", "%$(%w+)", t)[0] == "lua-5.4"
    # nil/false from the function keeps the original match
    assert lua_gsub("a b c", "%a", lambda c: None)[0] == "a b c"
    # %% literal percent
    assert lua_gsub("50", "%d+", "%0%%")[0] == "50%"
    # empty-pattern advance doesn't loop forever
    assert lua_gsub("abc", "x*", "-") == ["-a-b-c-", 4]


# ---------------------------------------------------------------------------
# through the interpreter (the lua transform's scripting surface)


def _run_lua(src: str):
    from vector_spark.functions.lua_interp import make_globals, run

    env = make_globals()
    return run(f"return {src}" if "\n" not in src
               and not src.strip().startswith(("local", "for", "return"))
               else src, env)


def test_interp_find_match_gsub():
    assert _run_lua('string.match("user-42", "%d+")') == ["42"]
    assert _run_lua('string.find("a,b", ",")') == [2, 2]
    assert _run_lua('string.gsub("a.b.c", "%.", "/")') == ["a/b/c", 2]
    assert _run_lua(
        'string.gsub("hello", "(l+)", string.upper)') == ["heLLo", 1]


def test_interp_gmatch_loop():
    out = _run_lua(
        "local t = {}\n"
        'for k, v in string.gmatch("a=1, b=2", "(%w+)=(%w+)") do\n'
        "  t[k] = v\n"
        "end\n"
        'return t["a"], t["b"]'
    )
    assert out == ["1", "2"]


def test_interp_log_parsing_hook_shape():
    # a realistic transform-hook snippet: parse a syslog-ish prefix
    out = _run_lua(
        'local line = "2024-01-02 ERROR service=auth msg=denied"\n'
        'local date, lvl = string.match(line, "^(%d+-%d+-%d+)%s+(%u+)")\n'
        "local fields = {}\n"
        'for k, v in string.gmatch(line, "(%w+)=(%w+)") do\n'
        "  fields[k] = v\n"
        "end\n"
        'return date, lvl, fields["service"], fields["msg"]'
    )
    assert out == ["2024-01-02", "ERROR", "auth", "denied"]


def test_interp_plain_find_still_works():
    assert _run_lua('string.find("a.b", ".", 1, true)') == [2, 2]
