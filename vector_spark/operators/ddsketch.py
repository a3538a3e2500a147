"""DDSketch-style relative-error quantile sketch as a pure Column program.

Reference: vector's metric `Sketch` value wraps DDSketch
(`lib/vector-core/src/event/metric/value.rs:83`, AgentDDSketch in
`lib/vector-core/src/metrics/ddsketch.rs`): log-γ bucketed counts giving
quantiles with relative error α, mergeable across hosts.

Spark form: the sketch IS a grouped table of (series, bucket_index,
count) with γ = (1+α)/(1−α) — one hash aggregation, algebraic
(map-side combinable), mergeable by adding counts (union + re-group).
No UDAF needed: the log-bucket index is a Column expression, so building
a sketch over 100 TB is exactly one shuffle of K×buckets rows. This is
the same "sketch = group-by over a deterministic bucketing" trick the
histogram uses, with DDSketch's multiplicative buckets.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _gamma(alpha: float) -> float:
    return (1 + alpha) / (1 - alpha)


# Sentinel bucket for values the sketch cannot resolve multiplicatively
# (v < MIN_VALUE, including zero/negatives). A distinct key — not index 0 —
# because ceil(log_γ(v)) legitimately yields 0 for v ∈ (1/γ, 1] and negative
# indices for v < 1; conflating them reported any sub-1 quantile as 0 and
# ordered zeros after sub-1 values. Mirrors AgentDDSketch's separate zero
# bucket with min resolvable value 1e-9
# (lib/vector-core/src/metrics/ddsketch.rs). LONG_MIN sorts before every
# real index, so the cumulative walk sees zeros first — the correct rank
# order, as every resolvable value is > 0.
ZERO_BUCKET = -(1 << 63)
MIN_VALUE = 1e-9


def bucket_index(value: Column, alpha: float = 0.01) -> Column:
    """DDSketch bucket index: ceil(log_γ(v)) for v ≥ MIN_VALUE (negative
    indices valid for v < 1); ZERO_BUCKET sentinel otherwise."""
    g = _gamma(alpha)
    return (
        F.when(value < MIN_VALUE, F.lit(ZERO_BUCKET))
        .otherwise(F.ceil(F.log(value.cast("double")) / math.log(g)).cast("long"))
    )


def ddsketch(
    df: DataFrame,
    series_keys: list[str],
    value_col: str = "value",
    alpha: float = 0.01,
) -> DataFrame:
    """Build sketches: one row per (series, bucket) with the count.

    Mergeable: union sketch tables and re-group summing counts.
    """
    return (
        df.withColumn("_bkt", bucket_index(F.col(value_col), alpha))
        .groupBy(*series_keys, "_bkt")
        .agg(F.count(F.lit(1)).alias("bucket_count"))
        .withColumnRenamed("_bkt", "bucket")
    )


def ddsketch_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same α (DDSketch's defining property)."""
    res = sketches[0]
    for s in sketches[1:]:
        res = res.unionByName(s)
    keys = [c for c in res.columns if c not in ("bucket_count",)]
    return res.groupBy(*keys).agg(F.sum("bucket_count").alias("bucket_count"))


def ddsketch_quantile(
    sketch: DataFrame,
    series_keys: list[str],
    q: float,
    alpha: float = 0.01,
    out_col: str = "quantile_est",
) -> DataFrame:
    """Estimate the q-quantile per series from a sketch table: walk the
    cumulative counts to the target rank, report the bucket midpoint
    γ^(i−1)·(1+γ)/2 — within α relative error by construction."""
    g = _gamma(alpha)
    w = Window.partitionBy(*series_keys).orderBy("bucket")
    wtot = Window.partitionBy(*series_keys)
    cum = sketch.withColumn("_cum", F.sum("bucket_count").over(w)).withColumn(
        "_total", F.sum("bucket_count").over(wtot)
    )
    target = F.ceil(F.lit(q) * F.col("_total"))
    hit = (
        cum.where(F.col("_cum") >= target)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
    )
    # Midpoint γ^(i−1)·(1+γ)/2 is valid for any non-sentinel index,
    # including negative i (values in (0,1)); only the zero bucket is 0.0.
    mid = F.when(F.col("bucket") == ZERO_BUCKET, F.lit(0.0)).otherwise(
        F.pow(F.lit(g), F.col("bucket") - 1) * (1 + g) / 2.0
    )
    return hit.select(*series_keys, mid.alias(out_col))
