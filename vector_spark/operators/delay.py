"""`delay` transform — hold each event for a fixed interval before emitting.

Reference: vector `src/transforms/delay.rs:22` — delay emission by
`delay_ms` per event (optionally gated on a condition), bounded queue.

Spark mapping (documented semantic): delay is a *wall-clock emission*
concept that has no meaning inside a batch plan — rows have no emission
time. What IS preserved is the data-visible effect: an `emit_ts` column
computed as event time + delay, which downstream event-time operators
(windowing, watermark alignment in streaming) consume exactly as the
reference's delayed timestamps would be. In streaming, pairing `emit_ts`
with a watermark on it reproduces "events become visible delay_ms late";
actual trigger-level hold-back is a non-goal (Spark's micro-batch trigger
already quantizes emission).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def delay(
    df: DataFrame,
    delay_ms: int,
    ts_col: str = "ts",
    condition: Column | str | None = None,
    out_col: str = "emit_ts",
) -> DataFrame:
    """Add ``out_col`` = ts + delay_ms (only where ``condition`` holds, if
    given; other rows emit at their original time)."""
    delayed = F.timestamp_micros(
        (F.unix_micros(F.col(ts_col)) + F.lit(delay_ms * 1000)).cast("long")
    )
    if condition is not None:
        cond = F.expr(condition) if isinstance(condition, str) else condition
        delayed = F.when(F.coalesce(cond, F.lit(False)), delayed).otherwise(
            F.col(ts_col)
        )
    return df.withColumn(out_col, delayed)
