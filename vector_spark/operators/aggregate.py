"""`aggregate` transform — time-bucketed metric aggregation per series.

Reference: vector `src/transforms/aggregate.rs:26` — per-`MetricSeries`
buckets flushed every `interval_ms` (default 10 s, `aggregate.rs:140-142`),
modes `Auto/Sum/Latest/Count/Diff/Max/Min/Mean/Stdev` (`aggregate.rs:47-76`).

Spark strategy: groupBy(epoch-bucket, series keys) — a single partial-agg
shuffle (map-side combine is automatic for sum/count/min/max/mean).
`Diff` is value - lag(value) over the bucket sequence; `Auto` is
sum for incremental metrics, last for absolute
(kind semantics: `lib/vector-core/src/event/metric/mod.rs:533-539`).

Numeric determinism note (matters for the DuckDB oracle and for
re-runs at different parallelism): float addition is order-sensitive, so
`sum`/`mean` accept ``exact_decimals`` to aggregate in fixed-point DECIMAL
and cast back to double — bit-identical results at any partitioning.
Stdev is computed from exact moments (n, Σx, Σx²) for the same reason.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.operators.throttle import time_bucket

MODES = ("auto", "sum", "latest", "count", "diff", "max", "min", "mean", "stdev")


def _exact_sum(c: Column, decimals: int) -> Column:
    return F.sum(c.cast(f"decimal(28,{decimals})")).cast("double")


def aggregate(
    df: DataFrame,
    interval_secs: int,
    series_keys: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    order_col: str | None = None,
    modes: list[str] | None = None,
    kind_col: str | None = None,
    exact_decimals: int | None = 2,
    bucket_col: str = "bucket",
) -> DataFrame:
    """One output row per (time bucket, series); one column per mode.

    ``order_col`` determines 'latest' deterministically (arrival order in
    the reference). ``kind_col`` ('incremental'|'absolute') drives `auto`.
    """
    modes = modes or ["count", "sum", "min", "max", "mean"]
    v = F.col(value_col)
    order = F.col(order_col) if order_col else F.col(ts_col)

    sum_c = _exact_sum(v, exact_decimals) if exact_decimals is not None else F.sum(v)
    sumsq = (
        F.sum((v * v).cast(f"decimal(38,{2 * exact_decimals})")).cast("double")
        if exact_decimals is not None
        else F.sum(v * v)
    )
    n = F.count(v)

    agg_for = {
        "sum": lambda: sum_c,
        "count": lambda: n.cast("long"),
        "latest": lambda: F.max_by(v, order),
        "max": lambda: F.max(v),
        "min": lambda: F.min(v),
        "mean": lambda: sum_c / n,
        # sample stdev from exact moments: sqrt((Σx² - (Σx)²/n) / (n-1))
        "stdev": lambda: F.when(
            n > 1, F.sqrt((sumsq - sum_c * sum_c / n) / (n - F.lit(1)))
        ),
    }

    out = df.withColumn(bucket_col, time_bucket(F.col(ts_col), interval_secs))
    aggs: list[Column] = []
    for m in modes:
        if m in agg_for:
            aggs.append(agg_for[m]().alias(m))
        elif m == "auto":
            if kind_col is None:
                raise ValueError("auto mode requires kind_col")
            # incremental → sum; absolute → latest (per reference Auto)
            aggs.append(
                F.when(
                    F.max(F.col(kind_col)) == F.lit("incremental"), sum_c
                ).otherwise(F.max_by(v, order)).alias("auto")
            )
        elif m == "diff":
            continue  # post-agg window below
        else:
            raise ValueError(f"unknown aggregate mode: {m}")

    res = out.groupBy(bucket_col, *series_keys).agg(*aggs)

    if "diff" in modes:
        base = "latest" if "latest" in modes else "sum"
        if base not in modes:
            raise ValueError("diff requires latest or sum in modes")
        w = Window.partitionBy(*series_keys).orderBy(bucket_col)
        res = res.withColumn("diff", F.col(base) - F.lag(F.col(base), 1).over(w))
    return res


def salted_aggregate(
    df: DataFrame,
    group_by: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase aggregation for SKEWED keys: partial-agg on
    (key, salt) — spreading a hot key over `salt_buckets` reducers —
    then final agg on the key.

    aggs: out_col -> (fn, in_col) with fn in {sum, count, min, max}
    (the algebraic aggregates that re-combine losslessly; mean = sum/count
    downstream). ``salt_source`` defaults to a deterministic hash of all
    non-key columns — deterministic re-runs, no rand() (AQE's skew-join
    handling covers joins; this covers aggregations).

    At 100 TB: one hot host/service key otherwise lands its entire volume
    on one reducer; salting bounds any reducer's share to ~1/salt_buckets
    of the hot key. Cost: a second (tiny — |keys|×buckets rows) shuffle.
    """
    partial_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    final_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for out, (fn, _col) in aggs.items():
        if fn not in partial_fn:
            raise ValueError(f"{out}: non-algebraic agg {fn!r} cannot be salted")

    if salt_source is None:
        others = [c for c in df.columns if c not in group_by] or group_by
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in others]), F.lit(salt_buckets))
    else:
        salt = F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt_buckets))

    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*group_by, "_salt")
        .agg(*[partial_fn[fn](F.col(c)).alias(out) for out, (fn, c) in aggs.items()])
    )
    return partial.groupBy(*group_by).agg(
        *[final_fn[fn](F.col(out)).alias(out) for out, (fn, _c) in aggs.items()]
    )
