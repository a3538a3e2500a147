"""Lua-subset interpreter + lua transform.

The corpus cases run the REFERENCE'S OWN Lua sources
(`tests/behavior/transforms/lua_v1.yaml`, `lua_v2.yaml`) through the
Spark operator — the five-round "reference configs embedding Lua don't
run" gap, closed. Language-feature tests pin the interpreter subset;
unsupported constructs must fail loudly, never mis-execute."""

from __future__ import annotations

import pytest

from vector_spark.functions import lua_interp as li


def run_chunk(src, extra=None):
    env = li.make_globals(extra or {})
    li.run(src, env)
    return env


# --------------------------------------------------------------------- lang


def test_values_and_operators():
    env = run_chunk(
        """
        a = 1 + 2 * 3 - 4 / 2
        b = 2 ^ 10
        c = 7 % 3
        d = "x" .. 1 .. "y"
        e = 1 < 2 and "yes" or "no"
        f = not nil
        g = #"hello"
        h = -a
        """
    )
    assert env.get("a") == 5 and env.get("b") == 1024.0
    assert env.get("c") == 1 and env.get("d") == "x1y"
    assert env.get("e") == "yes" and env.get("f") is True
    assert env.get("g") == 5 and env.get("h") == -5


def test_tables_nil_deletes_and_length():
    env = run_chunk(
        """
        t = { a = 1, b = 2, 10, 20, 30 }
        t.a = nil
        t[4] = 40
        n = #t
        b = t.b
        """
    )
    t = env.get("t")
    assert t.get("a") is None and t.get("b") == 2
    assert env.get("n") == 4 and [t.get(i) for i in range(1, 5)] == [
        10, 20, 30, 40]


def test_control_flow_and_closures():
    env = run_chunk(
        """
        function counter()
          local n = 0
          return function() n = n + 1 return n end
        end
        c = counter()
        c(); c()
        third = c()
        total = 0
        for i = 1, 10, 2 do total = total + i end
        while total > 20 do total = total - 2 end
        repeat total = total + 1 until total >= 23
        if total == 23 then verdict = "ok" elseif total > 23 then
          verdict = "high" else verdict = "low" end
        """
    )
    assert env.get("third") == 3
    assert env.get("total") == 23 and env.get("verdict") == "ok"


def test_multiple_assignment_and_returns():
    env = run_chunk(
        """
        function two() return 1, 2 end
        a, b = two()
        c, d = two(), 10
        x, y = y_undefined, 5
        """
    )
    assert (env.get("a"), env.get("b")) == (1, 2)
    assert (env.get("c"), env.get("d")) == (1, 10)
    assert env.get("x") is None and env.get("y") == 5


def test_stdlib_slice():
    env = run_chunk(
        """
        s = string.format("%s=%d (%.2f)", "k", 7, 1.5)
        u = string.upper(string.sub("hello world", 1, 5))
        t = {}
        table.insert(t, "b"); table.insert(t, 1, "a")
        joined = table.concat(t, "-")
        fl = math.floor(3.9)
        keys = {}
        for k, v in pairs({ x = 1 }) do table.insert(keys, k) end
        k1 = keys[1]
        arr = {}
        for i, v in ipairs({ 9, 8, 7 }) do arr[i] = v * 10 end
        a3 = arr[3]
        num = tonumber("42") + tonumber("0x10")
        str2 = tostring(nil) .. tostring(true)
        ty = type({})
        """
    )
    assert env.get("s") == "k=7 (1.50)"
    assert env.get("u") == "HELLO"
    assert env.get("joined") == "a-b"
    assert env.get("fl") == 3 and env.get("k1") == "x"
    assert env.get("a3") == 70
    assert env.get("num") == 58
    assert env.get("str2") == "niltrue" and env.get("ty") == "table"


def test_unsupported_constructs_fail_loudly():
    # r11 shrank the loud-error set: varargs/goto/metatables/coroutines,
    # then load/loadstring/require, then io/os/custom-_ENV are REAL now.
    # What remains out of scope must still fail loudly.
    for src in (
        'require("mod")',      # module not in package.preload -> loud
        "goto nowhere",        # goto with NO visible label
        'os.execute("true")',  # process control stays out of scope
    ):
        with pytest.raises(li.LuaError):
            run_chunk(src)
    # load is REAL since the r11 third wave
    env = run_chunk('y = load("return 1")()')
    assert env.get("y") == 1
    # patterns are REAL since r11 (lua_patterns.py) — no longer a
    # loud-error construct
    env = run_chunk('x = string.find("abc", "%a")')
    assert env.get("x") == 1


def test_runtime_errors_name_the_site():
    with pytest.raises(li.LuaError, match="global 'event'"):
        run_chunk("x = event.log.a", {"event": None})
    with pytest.raises(li.LuaError, match="field 'log'"):
        run_chunk("x = event.log.a", {"event": li.LuaTable()})
    with pytest.raises(li.LuaError, match="call a non-function"):
        run_chunk("nope()")


# ------------------------------------------------------------- spark operator


def test_reference_lua_v1_corpus_spark(spark):
    """lua_v1.yaml verbatim source: event["a"], event["b"] = nil,
    event["a"] — rename via multi-assignment on the flat v1 event."""
    from vector_spark.operators.lua import lua_transform

    df = spark.createDataFrame([("example value",)], "a string")
    rows = lua_transform(
        df, source='event["a"], event["b"] = nil, event["a"]', version="1"
    ).collect()
    assert [r.asDict() for r in rows] == [{"b": "example value"}]


def test_reference_lua_v2_corpus_spark(spark):
    """lua_v2.yaml verbatim hook sources through the v2 lifecycle."""
    from vector_spark.operators.lua import lua_transform

    df = spark.createDataFrame([("example value",)], "a string")
    # inline hook: rename
    out = lua_transform(
        df,
        hooks={
            "process": """
            function (event, emit)
              event.log.a, event.log.b = nil, event.log.a
              emit(event)
            end
            """
        },
    ).collect()
    assert [r.asDict() for r in out] == [{"b": "example value"}]

    # named hook defined in source: insert a field
    df2 = spark.createDataFrame([("some value",)], "some_field string")
    out2 = lua_transform(
        df2,
        source="""
        function hook_process (event, emit)
          event.log.inserted_field = "inserted value"
          emit(event)
        end
        """,
        hooks={"process": "hook_process"},
    ).collect()
    assert [r.asDict() for r in out2] == [
        {"some_field": "some value", "inserted_field": "inserted value"}
    ]

    # metric increment (nested struct event)
    df3 = spark.createDataFrame(
        [("example counter", {"value": 1.0})],
        "name string, counter struct<value double>",
    )
    out3 = lua_transform(
        df3,
        hooks={
            "process": """
            function (event, emit)
              event.metric.counter.value = event.metric.counter.value + 1
              emit(event)
            end
            """
        },
        kind="metric",
    ).collect()
    assert out3[0].counter.value == 2.0

    # log -> metric conversion via table constructor
    out4 = lua_transform(
        df,
        hooks={
            "process": """
            function (event, emit)
              event.log = nil
              event.metric = {
                name = "example metric",
                counter = {
                  value = 1.0
                }
              }
              emit(event)
            end
            """
        },
    ).collect()
    d4 = out4[0].asDict(recursive=True)
    assert d4 == {"name": "example metric", "counter": {"value": 1.0}}


def test_lua_v2_multi_emit_and_drop_spark(spark):
    """emit() may fire 0..n times per event (reference multi-event
    emission); events whose log table is nil'd without replacement are
    dropped."""
    from vector_spark.operators.lua import lua_transform

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 0)], "seq long, n long"
    )
    out = lua_transform(
        df,
        hooks={
            "process": """
            function (event, emit)
              local n = event.log.n
              if n == 0 then
                event.log = nil
                emit(event)
              else
                for i = 1, n do
                  emit({ log = { seq = event.log.seq, copy = i } })
                end
              end
            end
            """
        },
    ).collect()
    got = sorted((r.seq, r.copy) for r in out)
    assert got == [(1, 1), (1, 2), (2, 1), (2, 2), (2, 3)]


def test_lua_init_shutdown_and_timers_error(spark):
    from vector_spark.operators.lua import LuaConfigError, lua_transform

    df = spark.createDataFrame([(1,)], "seq long")
    out = lua_transform(
        df,
        source="""
        function boot (emit)
          emit({ log = { seq = -1 } })
        end
        function bye (emit)
          emit({ log = { seq = -2 } })
        end
        function proc (event, emit)
          emit(event)
        end
        """,
        hooks={"init": "boot", "process": "proc", "shutdown": "bye"},
    ).collect()
    # driver-side inference sample AND the executor pass both run the
    # lifecycle; assert content, not duplication of the sample run
    assert {r.seq for r in out} == {-1, 1, -2}
    # timers are REAL since r11 (event-time replay) — but a timer
    # without a handler is still a config error
    with pytest.raises(LuaConfigError, match="interval_seconds and "
                                             "handler"):
        lua_transform(
            df,
            hooks={"process": "function (e, emit) emit(e) end"},
            timers=[{"interval_seconds": 1}],
        )


def test_lua_v2_timers_fire_on_event_time(spark):
    """Reference v2 timers (`src/transforms/lua/v2/mod.rs:183-196`)
    fire every interval_seconds of wall clock; the batch analog fires
    on EVENT-TIME boundary crossings. 10 events 1s apart with a
    3-second timer: boundaries at +3s, +6s, +9s → 3 timer emissions
    interleaved deterministically."""
    from vector_spark.operators.lua import lua_transform

    df = spark.createDataFrame(
        [(i, float(1000 + i)) for i in range(10)],
        "seq long, timestamp double",
    ).coalesce(1)
    out = lua_transform(
        df,
        source="""
        seen = 0
        function proc (event, emit)
          seen = seen + 1
        end
        function flush (emit)
          emit({ log = { seq = -1, timestamp = 0.0 } })
        end
        function bye (emit)
          emit({ log = { seq = seen, timestamp = -1.0 } })
        end
        """,
        hooks={"process": "proc", "shutdown": "bye"},
        timers=[{"interval_seconds": 3, "handler": "flush"}],
        schema="seq long, timestamp double",
    ).collect()
    flushes = [r for r in out if r.seq == -1]
    finals = [r for r in out if r.timestamp == -1.0]
    assert len(flushes) == 3
    assert [r.seq for r in finals] == [10]


def test_lua_v2_state_persists_across_arrow_batches(spark):
    """The counter pattern from the reference's lua v2 docs: a
    `source`-chunk global incremented per event and emitted at
    shutdown. The interpreter env must live per PARTITION, so the
    final counter equals the partition's row count even when Arrow
    splits the partition into many batches (maxRecordsPerBatch=7)."""
    from vector_spark.operators.lua import lua_transform

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "7")
    try:
        n = 100
        df = spark.createDataFrame(
            [(i,) for i in range(n)], "seq long"
        ).coalesce(1)
        out = lua_transform(
            df,
            source="counter = 0",
            hooks={
                "process": """
                function (event, emit)
                  counter = counter + 1
                end
                """,
                "shutdown": """
                function (emit)
                  emit({ log = { total = counter } })
                end
                """,
            },
            schema="total long",
        ).collect()
        totals = sorted(r.total for r in out if r.total is not None)
        # one partition → exactly one shutdown emission, counting ALL
        # rows (a per-batch env would emit ceil(100/7)=15 partials)
        assert totals == [n]
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_lua_via_topology_loader(tmp_path, spark):
    """A reference-style config with embedded Lua runs through
    load_topology end-to-end."""
    import yaml

    from vector_spark.config.loader import build_topology

    src = tmp_path / "events.parquet"
    spark.createDataFrame(
        [("example value",)], "a string"
    ).write.parquet(str(src))
    cfg = yaml.safe_load(
        f"""
sources:
  logs:
    type: parquet
    path: {src}
transforms:
  rename:
    type: lua
    version: "2"
    inputs: [logs]
    hooks:
      process: |
        function (event, emit)
          event.log.a, event.log.b = nil, event.log.a
          emit(event)
        end
sinks:
  out:
    type: memory
    inputs: [rename]
"""
    )
    topo = build_topology(spark, cfg)
    rows = topo.output("rename").collect()
    assert [r.asDict() for r in rows] == [{"b": "example value"}]
