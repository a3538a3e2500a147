"""Custom stateful streaming operators via applyInPandasWithState.

These cover the reference semantics that have no built-in Spark streaming
equivalent (SURVEY.md §4 "custom Spark work" item 2):
- throttle: GCRA/token-bucket per key (vector
  `src/transforms/throttle/rate_limiter.rs:54`)
- LRU-bounded dedupe (vector `dedupe/transform.rs:77-81`, cache of
  `num_events`)
- tag_cardinality_limit seen-sets (vector
  `src/transforms/tag_cardinality_limit/`)

Each operator keeps per-key state in the state store (checkpointed,
partitioned by key — scales horizontally with executors). The Python hook
is Arrow-batched (pandas), not row-at-a-time.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def streaming_throttle(
    df: DataFrame,
    threshold: int,
    window_secs: int,
    key_field: str,
    ts_col: str = "ts",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Admit at most `threshold` events per key per window, streaming.

    State per key: (window_start_epoch, admitted_count). This is the
    discrete-window form of the reference's GCRA limiter — same admission
    rate, state is two longs per key.
    """
    payload_cols = payload_cols or [c for c in df.columns if c != key_field]
    out_schema = StructType(
        [StructField(key_field, StringType())]
        + [df.schema[c] for c in payload_cols]
    )
    state_schema = StructType(
        [
            StructField("win_start", LongType()),
            StructField("admitted", LongType()),
        ]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            win_start, admitted = state.get
        else:
            win_start, admitted = -1, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(ts_col)
            # Vectorized window rank: position within each window bucket,
            # offset by the carried count only when the batch CONTINUES the
            # carried window (the sequential limiter resets its counter at
            # every window change, so a window re-entered later in a batch
            # starts from zero — mirrored by the w.iloc[0] guard).
            epoch = (
                pdf[ts_col].values.astype("datetime64[ns]").astype("int64")
                // 1_000_000_000
            )
            w = pd.Series(epoch - (epoch % window_secs), index=pdf.index)
            cum = w.groupby(w).cumcount()
            prior = pd.Series(0, index=pdf.index)
            if int(w.iloc[0]) == win_start:
                prior[w == win_start] = admitted
            keep = (cum + prior) < threshold
            last_w = int(w.iloc[-1])
            in_last = w == last_w
            carry = admitted if (last_w == win_start and int(w.iloc[0]) == win_start) else 0
            admitted = int((in_last & keep).sum()) + carry
            win_start = last_w
            if keep.any():
                kept = pdf[keep].copy()
                kept[key_field] = key[0]
                yield kept[[key_field] + payload_cols]
        state.update((win_start, admitted))

    return df.groupBy(key_field).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_lru_dedupe(
    df: DataFrame,
    fields: list[str],
    key_field: str,
    cache_size: int = 5000,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """dedupe with a bounded LRU of `cache_size` recently-seen field tuples
    per key-partition — the reference's exact semantics
    (`src/transforms/dedupe/transform.rs:77-81`, default cache 5000): a
    key evicted from the cache is admitted again on next sight.

    State per group: ordered list of recent field-tuple hashes. Partitioned
    by `key_field` so the cache shards horizontally across executors
    (the reference has one global cache; sharding is the documented scale
    adaptation — same bound per shard).
    """
    payload_cols = payload_cols or [c for c in df.columns if c != key_field]
    out_schema = StructType(
        [StructField(key_field, df.schema[key_field].dataType)]
        + [df.schema[c] for c in payload_cols]
    )
    state_schema = StructType([StructField("seen", StringType())])

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import hashlib
        import json
        from collections import OrderedDict

        seen: OrderedDict = OrderedDict()
        if state.exists:
            (blob,) = state.get
            if blob:
                seen = OrderedDict((h, None) for h in json.loads(blob))
        for pdf in pdfs:
            if not len(pdf):
                continue
            # Deterministic digest, NOT Python hash(): hash() of strings
            # depends on PYTHONHASHSEED, so checkpointed fingerprints from a
            # previous driver would not match and seen events would be
            # silently re-admitted. md5 mirrors the reference's stable
            # type-aware key encoding (`dedupe/transform.rs:47-67`).
            joined = pdf[fields].astype(str).agg("|".join, axis=1)
            fps = [
                hashlib.md5(s.encode()).hexdigest() for s in joined.to_numpy()
            ]
            # The LRU walk stays a Python loop (eviction order is inherently
            # sequential) but over a plain string list — no iterrows/row
            # copies; the per-row cost is dict ops only.
            mask = []
            for h in fps:
                if h in seen:
                    seen.move_to_end(h)
                    mask.append(False)
                    continue
                seen[h] = None
                while len(seen) > cache_size:
                    seen.popitem(last=False)
                mask.append(True)
            if any(mask):
                out = pdf[pd.Series(mask, index=pdf.index)].copy()
                out[key_field] = key[0]
                yield out[[key_field] + payload_cols]
        state.update((json.dumps(list(seen)),))

    return df.groupBy(key_field).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_tag_cardinality_limit(
    df: DataFrame,
    tag_col: str,
    key_field: str,
    limit: int,
    payload_cols: list[str] | None = None,
    action: str = "drop_tag",
) -> DataFrame:
    """tag_cardinality_limit streaming form (vector
    `src/transforms/tag_cardinality_limit/config.rs:18`, mode
    ExactFingerprint): per key-partition, remember the admitted value set
    per tag; values beyond `limit` are nulled out (drop_tag) or their rows
    dropped (drop_event). State: the admitted-value hash set."""
    payload_cols = payload_cols or [
        c for c in df.columns if c not in (key_field, tag_col)
    ]
    out_schema = StructType(
        [
            StructField(key_field, df.schema[key_field].dataType),
            StructField(tag_col, df.schema[tag_col].dataType),
        ]
        + [df.schema[c] for c in payload_cols]
    )
    state_schema = StructType([StructField("admitted", StringType())])

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import json

        admitted: set = set()
        if state.exists:
            (blob,) = state.get
            if blob:
                admitted = set(json.loads(blob))
        for pdf in pdfs:
            if not len(pdf):
                continue
            # First-seen admission is order-sensitive, but only the first
            # occurrence of each NEW value matters — walk the (small) list
            # of values, not the rows, then apply the verdict vectorized.
            vals = pdf[tag_col].to_numpy()
            over: set = set()  # values seen this batch that exceeded the limit
            for v in vals:
                if v is None or pd.isna(v):
                    continue
                s = str(v)
                if s not in admitted and s not in over:
                    if len(admitted) < limit:
                        admitted.add(s)
                    else:
                        over.add(s)
            is_over = pd.Series(
                [v is not None and not pd.isna(v) and str(v) in over for v in vals],
                index=pdf.index,
            )
            if action == "drop_event":
                out = pdf[~is_over].copy()
            else:
                out = pdf.copy()
                out.loc[is_over, tag_col] = None
            if len(out):
                out[key_field] = key[0]
                yield out[[key_field, tag_col] + payload_cols]
        state.update((json.dumps(sorted(admitted)),))

    return df.groupBy(key_field).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def scripted_stateful_transform(
    df: DataFrame,
    key_field: str,
    out_schema: StructType | str,
    process,
    on_timer=None,
    timer_secs: int | None = None,
):
    """Lua-transform analog with lifecycle + timers (vector
    `src/transforms/lua/v2/mod.rs:27-40`: hooks.process + `timers` that
    periodically emit from persistent state).

    ``process(key, pdf, state: dict) -> (pandas.DataFrame | None, dict)``
    runs per micro-batch per key (Arrow-batched); ``on_timer(key, state)
    -> (pandas.DataFrame | None, dict)`` fires every ``timer_secs`` — from
    the PROCESS path while the key has traffic (processing-time check, the
    reference's timer cadence) and from the state-store TIMEOUT path when
    the key goes idle, so periodic emission never stops either way.

    State is a JSON-serializable dict in the checkpointed state store —
    per-key, partitioned across executors, restart-durable (the lua VM's
    in-process globals are the part of the reference this strengthens)."""
    import json
    import time as _time

    if on_timer is not None and not timer_secs:
        raise ValueError("on_timer requires timer_secs")
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if on_timer is not None
        else GroupStateTimeout.NoTimeout
    )
    state_schema = StructType([StructField("state_json", StringType())])

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        st = json.loads(state.get[0]) if state.exists else {}
        outs = []
        if state.hasTimedOut:
            out, st = on_timer(key[0], st)
            if out is not None and len(out):
                outs.append(out)
        else:
            for pdf in pdfs:
                out, st = process(key[0], pdf, st)
                if out is not None and len(out):
                    outs.append(out)
            if on_timer is not None:
                now = _time.time()
                nxt = st.get("_next_timer", 0)
                if now >= nxt:
                    if nxt:  # don't fire on the very first batch
                        out, st = on_timer(key[0], st)
                        if out is not None and len(out):
                            outs.append(out)
                    st["_next_timer"] = now + timer_secs
        state.update((json.dumps(st),))
        if on_timer is not None:
            state.setTimeoutDuration(timer_secs * 1000)
        yield from outs

    return df.groupBy(key_field).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )


def lua_stateful_transform(
    df: DataFrame,
    key_field: str,
    out_schema: StructType | str,
    source: str | None = None,
    hooks: dict | None = None,
    timers: list[dict] | None = None,
    kind: str = "log",
):
    """Streaming lua v2 with the reference's WALL-CLOCK timer contract
    (`src/transforms/lua/v2/mod.rs:183-196,:461-476`): hook/timer
    sources are LUA (functions/lua_interp.py), persistent program
    state is the Lua global ``state`` (a table), serialized through
    the checkpointed state store per key — so unlike the reference's
    in-process mlua globals, it survives a restart. The batch
    transform (`operators/lua.py`) replays timers on EVENT time; this
    is the true-streaming analog where ``interval_seconds`` means
    seconds of wall clock, enforced by the state store's
    processing-time timeout via :func:`scripted_stateful_transform`.

    Hook shapes match the batch v2 runner: ``hooks['process']`` is
    ``function (event, emit)`` (inline or named in ``source``);
    each ``timers`` entry is ``{interval_seconds, handler}`` with
    ``handler = function (emit)``. Multiple timers ride one
    state-store cadence (gcd would over-fire; we use the MINIMUM
    interval and per-timer due-times in state)."""
    import time as _time

    from vector_spark.functions import lua_interp as li
    from vector_spark.operators.lua import LuaConfigError, _hook_fn

    if not hooks or "process" not in hooks:
        raise LuaConfigError("lua v2 needs hooks.process")
    timers = timers or []
    for tc in timers:
        if "interval_seconds" not in tc or "handler" not in tc:
            raise LuaConfigError(
                "each timer needs interval_seconds and handler")
    if isinstance(out_schema, str):
        out_schema = StructType.fromDDL(out_schema)
    cols = out_schema.fieldNames()
    tick = min((int(t["interval_seconds"]) for t in timers), default=None)

    def _build(st: dict, emitted: list):
        def emit(ev):
            d = li.from_lua(ev)
            if not isinstance(d, dict):
                raise LuaConfigError("emit() expects an event table")
            body = (d.get("log") if d.get("log") is not None
                    else d.get("metric"))
            if body is not None and isinstance(body, dict):
                emitted.append(body)

        env = li.make_globals({"emit": emit})
        if source:
            li.run(source, env)
        env.declare("state", li.to_lua(st.get("lua", {})))
        return env, emit

    def _frame(emitted: list):
        if not emitted:
            return None
        return pd.DataFrame(
            {c: [e.get(c) for e in emitted] for c in cols}, columns=cols)

    def process(key, pdf, st):
        emitted: list[dict] = []
        env, emit = _build(st, emitted)
        fn = _hook_fn(env, hooks["process"])
        for row in pdf.to_dict("records"):
            fn(li.to_lua({kind: row}), emit)
        st["lua"] = li.from_lua(env.get("state")) or {}
        return _frame(emitted), st

    def on_timer(key, st):
        emitted: list[dict] = []
        env, emit = _build(st, emitted)
        now = _time.time()
        due = st.setdefault("_lua_timers", {})
        for i, tc in enumerate(timers):
            k = str(i)
            if now >= due.get(k, 0):
                _hook_fn(env, tc["handler"])(emit)
                due[k] = now + int(tc["interval_seconds"])
        st["lua"] = li.from_lua(env.get("state")) or {}
        return _frame(emitted), st

    return scripted_stateful_transform(
        df, key_field, out_schema, process,
        on_timer=on_timer if timers else None,
        timer_secs=tick,
    )
