"""`lua` transform: reference Lua programs over the event stream.

Reference: `src/transforms/lua/mod.rs:60` (v1: a statement chunk
mutating a flat `event` table) and `src/transforms/lua/v2/mod.rs:27-40`
(v2: `hooks.init/process/shutdown`, inline `function (event, emit)`
literals or names defined in `source`; events carry `event.log` /
`event.metric` subtables and `emit` may fire any number of times).

Spark mapping: the hook runs in the pure-Python Lua-subset interpreter
(`functions/lua_interp.py`) inside ``mapInPandas`` — Arrow-batched, one
interpreter environment per partition (the reference's per-task
lifecycle: `init` once before the first event, `shutdown` after the
last). Python hook bodies remain available via
:func:`vector_spark.operators.script.scripted_transform`; this module
is for configs that EMBED LUA SOURCE.

Schema: Spark needs a static output schema where Lua does not. Pass
``schema`` explicitly, or the operator infers it by running the hook
driver-side over a small sample (``df.take(sample)``) and unioning the
emitted fields — the inferred contract (all events flatten to
schema-stable fields) is then enforced by the Arrow conversion, which
is the honest DataFrame adaptation of a dynamically-typed stream.

v2 `timers` (r11): the reference fires each ``TimerConfig.handler``
every ``interval_seconds`` of WALL CLOCK while the stream runs
(`src/transforms/lua/v2/mod.rs:183-196,:461-476`). A batch replay has
no wall clock, so the honest deterministic analog is EVENT TIME: per
partition, the first event's timestamp anchors each timer, and the
handler fires once per interval boundary the event stream crosses
(``timestamp_field`` picks the column; rows without a parseable
timestamp advance nothing). Catch-up after a gap fires once per
elapsed boundary, capped at ``timer_catchup_max`` per event (a
year-long gap on a 1s timer should not emit 31M flushes — the cap is
the documented replay/real-time divergence). Wall-clock timers remain
available in streaming via
`streaming/stateful.py::scripted_stateful_transform`.

The interpreter itself is full-fidelity since r11 — metatables,
coroutines, goto, varargs, string patterns all run (see lua_interp
docstring for the remaining io/require exclusions). At 100 TB this is
the slow path by construction — Python in the loop — mitigated by
Arrow batching; anything expressible as Columns should be remap/VRL
instead.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from vector_spark.functions import lua_interp as li


class LuaConfigError(ValueError):
    pass


def _hook_fn(env, spec: str):
    """Resolve a hook spec: inline `function (...) ... end` source or
    the NAME of a function defined by the config's `source` chunk."""
    spec = spec.strip()
    if spec.startswith("function"):
        vals = li.run("return " + spec, env)
        fn = vals[0] if vals else None
    else:
        fn = env.get(spec)
    if fn is None or not callable(fn):
        raise LuaConfigError(f"lua hook {spec[:40]!r} is not a function")
    return fn


def _parse_ts(v) -> float | None:
    """Event timestamp → epoch seconds (numeric, datetime/Timestamp,
    or ISO string); None if absent/unparseable."""
    if v is None:
        return None
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return float(v)
    if hasattr(v, "timestamp"):
        try:
            return float(v.timestamp())
        except (ValueError, OSError, OverflowError):
            return None
    if isinstance(v, str):
        try:
            return float(pd.Timestamp(v).timestamp())
        except (ValueError, OverflowError):
            return None
    return None


class _V2Runner:
    """One v2 interpreter lifecycle: env + hooks built ONCE, `init`
    fired before the first event, `process` per event against the
    SHARED env (so `source`-chunk globals — counters, caches — persist
    across Arrow batches, matching the reference's persistent per-
    instance Lua state), `shutdown` after the last event. Timers fire
    on event-time boundary crossings (module docstring)."""

    def __init__(self, source: str | None, hooks: dict, kind: str,
                 timers: list[dict] | None = None,
                 timestamp_field: str = "timestamp",
                 timer_catchup_max: int = 100):
        self.kind = kind
        self.emitted: list[dict] = []

        def emit(ev):
            d = li.from_lua(ev)
            if not isinstance(d, dict):
                raise LuaConfigError("emit() expects an event table")
            body = (d.get("log") if d.get("log") is not None
                    else d.get("metric"))
            if body is None:
                return  # event with both subtables nil: dropped
            if not isinstance(body, dict):
                raise LuaConfigError("event.log/.metric must be a table")
            self.emitted.append(body)

        self._emit = emit
        env = li.make_globals({"emit": emit})
        if source:
            li.run(source, env)
        self._process = _hook_fn(env, hooks["process"])
        self._init = _hook_fn(env, hooks["init"]) if hooks.get("init") \
            else None
        self._shutdown = (
            _hook_fn(env, hooks["shutdown"]) if hooks.get("shutdown")
            else None
        )
        self._ts_field = timestamp_field
        self._catchup_max = int(timer_catchup_max)
        # per timer: (interval_secs, handler, [base_ts], [fired_count])
        self._timers: list = []
        for tc in timers or []:
            interval = float(tc["interval_seconds"])
            if interval <= 0:
                raise LuaConfigError("timer interval_seconds must be > 0")
            self._timers.append(
                [interval, _hook_fn(env, tc["handler"]), None, 0]
            )
        self._started = False

    def _advance_timers(self, row: dict) -> None:
        if not self._timers:
            return
        ts = _parse_ts(row.get(self._ts_field))
        if ts is None:
            return
        for timer in self._timers:
            interval, handler, base, fired = timer
            if base is None:
                timer[2] = ts  # first event anchors the timer
                continue
            due = int((ts - base) // interval)
            for _ in range(min(due - fired, self._catchup_max)):
                timer[3] += 1
                handler(self._emit)

    def _drain(self) -> list[dict]:
        out, self.emitted = self.emitted, []
        return out

    def process_rows(self, rows: list[dict]) -> list[dict]:
        if not self._started:
            self._started = True
            if self._init is not None:
                self._init(self._emit)
        for row in rows:
            self._advance_timers(row)
            self._process(li.to_lua({self.kind: row}), self._emit)
        return self._drain()

    def finish(self) -> list[dict]:
        if not self._started:
            self._started = True
            if self._init is not None:
                self._init(self._emit)
        if self._shutdown is not None:
            self._shutdown(self._emit)
        return self._drain()


def _run_events_v2(rows: list[dict], source: str | None, hooks: dict,
                   kind: str, timers=None, timestamp_field="timestamp",
                   timer_catchup_max=100) -> list[dict]:
    """One full lifecycle over a single batch (used for driver-side
    schema inference; the partition path in ``lua_transform`` keeps the
    runner alive across batches)."""
    runner = _V2Runner(source, hooks, kind, timers, timestamp_field,
                       timer_catchup_max)
    out = runner.process_rows(rows)
    out.extend(runner.finish())
    return out


def _run_events_v1(rows: list[dict], source: str) -> list[dict]:
    """v1: the chunk runs once per event with the flat `event` global;
    the mutated table is the output (nil `event` drops it)."""
    ast_env = li.make_globals()
    # parse once; re-bind `event` per row
    prog = li.parse(source)
    out: list[dict] = []
    for row in rows:
        ast_env.declare("event", li.to_lua(row))
        try:
            li._exec_block(prog, ast_env)
        except li._Return:
            pass
        ev = ast_env.get("event")
        if ev is not None:
            d = li.from_lua(ev)
            if isinstance(d, dict):
                out.append(d)
    return out


def _py_type(v) -> DataType:
    if isinstance(v, bool):
        return BooleanType()
    if isinstance(v, int):
        return LongType()
    if isinstance(v, float):
        return DoubleType()
    if isinstance(v, str):
        return StringType()
    if isinstance(v, dict):
        return StructType(
            [StructField(k, _py_type(x), True) for k, x in v.items()]
        )
    if isinstance(v, list):
        return ArrayType(_py_type(v[0]) if v else StringType(), True)
    raise LuaConfigError(f"cannot map value {v!r} to a Spark type")


def _infer_schema(events: list[dict]) -> StructType:
    fields: dict[str, DataType] = {}
    for ev in events:
        for k, v in ev.items():
            if v is None:
                fields.setdefault(k, StringType())
            elif k not in fields or isinstance(fields[k], StringType):
                t = _py_type(v)
                if k in fields and fields[k] != t and not isinstance(
                    fields[k], StringType
                ):
                    raise LuaConfigError(
                        f"field {k!r} emitted with conflicting types"
                    )
                fields[k] = t
    if not fields:
        raise LuaConfigError(
            "schema inference sample produced no events; pass schema="
        )
    return StructType(
        [StructField(k, t, True) for k, t in fields.items()]
    )


def lua_transform(
    df: DataFrame,
    source: str | None = None,
    hooks: dict[str, str] | None = None,
    version: str = "2",
    kind: str = "log",
    schema: StructType | str | None = None,
    sample: int = 20,
    timers: Any = None,
    timestamp_field: str = "timestamp",
    timer_catchup_max: int = 100,
) -> DataFrame:
    """Run a reference-style Lua program over every event. v2 needs
    ``hooks['process']`` (plus optional init/shutdown, ``timers``
    entries ``{interval_seconds, handler}`` replayed on event time —
    module docstring — and a ``source`` chunk defining named hooks);
    v1 needs ``source`` only."""
    version = str(version)
    if version == "2":
        if not hooks or "process" not in hooks:
            raise LuaConfigError("lua v2 needs hooks.process")
        for tc in timers or []:
            if "interval_seconds" not in tc or "handler" not in tc:
                raise LuaConfigError(
                    "each timer needs interval_seconds and handler"
                )
    elif version in ("1", ""):
        if not source:
            raise LuaConfigError("lua v1 needs source")
        if hooks:
            raise LuaConfigError("lua v1 takes no hooks")
        if timers:
            raise LuaConfigError("lua v1 takes no timers")
    else:
        raise LuaConfigError(f"unknown lua version {version!r}")

    def run_batch(rows: list[dict]) -> list[dict]:
        if version == "2":
            return _run_events_v2(rows, source, hooks, kind, timers,
                                  timestamp_field, timer_catchup_max)
        return _run_events_v1(rows, source)

    if schema is None:
        head = [r.asDict(recursive=True) for r in df.take(sample)]
        schema = _infer_schema(run_batch(head))
    elif not isinstance(schema, StructType):
        schema = StructType.fromDDL(str(schema))
    cols = schema.fieldNames()

    def _frame(events: list[dict]) -> pd.DataFrame:
        return pd.DataFrame(
            {c: [e.get(c) for e in events] for c in cols},
            columns=cols,
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if version == "2":
            # one interpreter env per PARTITION: init fires before the
            # first event, globals persist across Arrow batches, and
            # shutdown fires after the iterator is exhausted — the
            # reference's per-instance Lua lifecycle. Empty emissions
            # are skipped (an empty pandas frame defaults every column
            # to float64, which Arrow can't cast to struct/array).
            runner = _V2Runner(source, hooks, kind, timers,
                               timestamp_field, timer_catchup_max)
            for pdf in batches:
                events = runner.process_rows(pdf.to_dict("records"))
                if events:
                    yield _frame(events)
            tail = runner.finish()
            if tail:
                yield _frame(tail)
        else:
            for pdf in batches:
                events = _run_events_v1(pdf.to_dict("records"), source)
                if events:
                    yield _frame(events)

    return df.mapInPandas(fn, schema=schema)
