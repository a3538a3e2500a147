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
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            keep_rows = []
            for _, row in pdf.iterrows():
                epoch = int(row[ts_col].timestamp())
                w = epoch - (epoch % window_secs)
                if w != win_start:
                    win_start, admitted = w, 0
                if admitted < threshold:
                    admitted += 1
                    keep_rows.append(row)
            if keep_rows:
                kept = pd.DataFrame(keep_rows)
                kept[key_field] = key[0]
                outs.append(kept[[key_field] + payload_cols])
        state.update((win_start, admitted))
        if outs:
            yield from outs

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
        import json
        from collections import OrderedDict

        seen: OrderedDict = OrderedDict()
        if state.exists:
            (blob,) = state.get
            if blob:
                seen = OrderedDict((h, None) for h in json.loads(blob))
        for pdf in pdfs:
            keep = []
            for _, row in pdf.iterrows():
                h = str(hash(tuple(str(row[f]) for f in fields)))
                if h in seen:
                    seen.move_to_end(h)
                    continue
                seen[h] = None
                while len(seen) > cache_size:
                    seen.popitem(last=False)
                keep.append(row)
            if keep:
                out = pd.DataFrame(keep)
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
            rows = []
            for _, row in pdf.iterrows():
                v = row[tag_col]
                if v is not None and str(v) not in admitted:
                    if len(admitted) < limit:
                        admitted.add(str(v))
                    elif action == "drop_event":
                        continue
                    else:
                        row = row.copy()
                        row[tag_col] = None
                rows.append(row)
            if rows:
                out = pd.DataFrame(rows)
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
