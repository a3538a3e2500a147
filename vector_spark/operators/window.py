"""`window` transform — context rows around a match (look-back/ahead buffer).

Reference: vector `src/transforms/window/config.rs:15` — keep a ring buffer
of `num_events_before` (default 100); when `flush_when` fires, emit the
buffer, the match, and the next `num_events_after` events; `forward_when`
events always pass. "grep -B/-A for event streams".

Spark strategy (batch): mark matches, then a frame-max over
rowsBetween(-after, +before) on the explicit order column — a row is kept
if any row within the window around it matched. Note the frame inversion:
a row B positions *before* a match M must look *forward* to see M, so the
frame is (-num_after, +num_before). One window shuffle, partitioned by the
stream key so state stays bounded at scale.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def window_context(
    df: DataFrame,
    flush_when: Column | str,
    order_col: str,
    partition_by: list[str] | None = None,
    num_events_before: int = 100,
    num_events_after: int = 0,
    forward_when: Column | str | None = None,
    match_col: str | None = None,
) -> DataFrame:
    """Keep rows within (before, after) rows of a `flush_when` match."""
    cond = F.expr(flush_when) if isinstance(flush_when, str) else flush_when
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(order_col)
    else:
        # Faithful to vector's single-stream total order, but an
        # unpartitioned Window ranks the whole input on ONE task — fine for
        # a single agent's stream, a scale hazard on a 100 TB table.
        warnings.warn(
            "window_context without partition_by runs a single-task global "
            "window; pass partition_by (e.g. the stream/host key) at scale",
            stacklevel=2,
        )
        w = Window.orderBy(order_col)
    frame = w.rowsBetween(-num_events_after, num_events_before)
    is_match = F.coalesce(cond, F.lit(False)).cast("int")
    near = F.max(is_match).over(frame) == 1
    keep = near
    if forward_when is not None:
        fwd = F.expr(forward_when) if isinstance(forward_when, str) else forward_when
        keep = keep | F.coalesce(fwd, F.lit(False))
    out = df.withColumn("_m", is_match).withColumn("_keep", keep)
    out = out.where(F.col("_keep")).drop("_keep")
    if match_col:
        out = out.withColumnRenamed("_m", match_col)
    else:
        out = out.drop("_m")
    return out
