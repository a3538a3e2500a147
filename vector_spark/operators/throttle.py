"""`throttle` transform — per-key rate limiting within a time window.

Reference: vector `src/transforms/throttle/config.rs:36` — token-bucket
(GCRA via the governor crate) allowing `threshold` events per `key` per
`window_secs`; excess events are dropped
(`src/transforms/throttle/rate_limiter.rs:54`).

Spark strategy (batch): a rank within (key, event-time bucket) — the first
`threshold` events per key per window pass. This is the event-time
deterministic analog of the processing-time GCRA: same steady-state
admission rate, reproducible results. One shuffle on (key, bucket); at
100 TB the bucket column keeps partitions bounded (a key's data splits
across time), and AQE skew-join/salting handles hot keys.

Streaming: see vector_spark.streaming.stateful (applyInPandasWithState
GCRA counters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_bucket(ts: Column, window_secs: int) -> Column:
    """Epoch-second bucket start (BIGINT) — portable across engines."""
    return (F.floor(F.unix_timestamp(ts) / F.lit(window_secs)) * F.lit(window_secs)).cast("long")


def throttle(
    df: DataFrame,
    threshold: int,
    window_secs: int,
    key_field: str | list[str],
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
    exclude: Column | str | None = None,
) -> DataFrame:
    """Admit at most `threshold` rows per key per `window_secs` bucket.

    ``order_cols`` breaks ties deterministically (vector uses arrival
    order; Spark needs an explicit order, FIXTURES.md `seq` convention).
    """
    keys = [key_field] if isinstance(key_field, str) else list(key_field)
    order = order_cols or [ts_col]
    bucket = time_bucket(F.col(ts_col), window_secs)
    w = (
        Window.partitionBy(*keys, bucket)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Excluded events bypass the rate limiter entirely and must not consume
    # quota (`throttle/transform.rs`: the exclude check happens before the
    # bucket is touched) — so the rank is a running count of NON-excluded
    # rows only, not a row_number over everything.
    excl = None
    if exclude is not None:
        excl = F.expr(exclude) if isinstance(exclude, str) else exclude
    flag = F.lit(1) if excl is None else F.when(excl, F.lit(0)).otherwise(F.lit(1))
    ranked = df.withColumn("_rn", F.sum(flag).over(w))
    keep = F.col("_rn") <= F.lit(threshold)
    if excl is not None:
        keep = excl | keep
    return ranked.where(keep).drop("_rn")
