"""`lua`-style scripted transforms — arbitrary user code over the stream.

Reference: vector `src/transforms/lua/mod.rs:60` (v2 API
`lua/v2/mod.rs:27-40`): user-supplied programs with lifecycle hooks
(`init` / `process` / `shutdown`) and persistent state + timers.

Spark mapping: the scripting language is Python (the engine's host
language), executed Arrow-batched — never row-at-a-time over a socket:

- stateless `process`-only scripts → ``mapInPandas`` (this module):
  the user function sees an iterator of pandas DataFrames per partition;
  `init`/`shutdown` run once per partition around the batch loop, which is
  the partition-local analog of the reference's per-task hooks.
- stateful/timer scripts → `applyInPandasWithState`
  (vector_spark.streaming.stateful) keyed on a group column.

At 100 TB: a scripted transform is the slow path by construction (Python
in the loop). The batch iterator shape keeps the overhead to one Arrow
exchange per ~10k-row batch rather than per row; anything expressible as
Column expressions should use remap/VRL functions instead.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def scripted_transform(
    df: DataFrame,
    process: Callable[[pd.DataFrame, dict[str, Any]], pd.DataFrame],
    schema: StructType | str,
    init: Callable[[], dict[str, Any]] | None = None,
    shutdown: Callable[[dict[str, Any]], None] | None = None,
) -> DataFrame:
    """Run a per-batch Python hook over every Arrow batch.

    process(batch_pdf, ctx) -> output pdf matching ``schema``; ``ctx`` is
    the partition-local dict produced by ``init`` (lifecycle analog of the
    reference's hooks.init/process/shutdown).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = init() if init else {}
        try:
            for pdf in batches:
                out = process(pdf, ctx)
                if out is not None and len(out):
                    yield out
        finally:
            if shutdown:
                shutdown(ctx)

    return df.mapInPandas(run, schema=schema)
