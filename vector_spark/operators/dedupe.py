"""`dedupe` transform — drop events whose selected fields were seen before.

Reference: vector `src/transforms/dedupe/config.rs:21`, impl
`transform.rs:77-81`; key encoding is type-aware (`transform.rs:47-67`),
with `fields.match` (key = listed fields) or `fields.ignore`
(key = all fields except listed). The reference keeps an LRU cache of
`num_events` (default 5000) — a processing-order heuristic bound, not a
semantic guarantee.

Spark strategy (batch): exact global dedupe — keep the FIRST row per key
in explicit order (`order_col`). This is strictly stronger than the LRU
variant (never re-admits a key after cache eviction) and is the semantics
a user wants at 100 TB. Implemented as `row_number() == 1` over
(key → order), one shuffle on the key; at scale prefer passing a
pre-bucketed key column. The LRU-bounded and TTL variants live in
vector_spark.streaming (dropDuplicatesWithinWatermark / stateful map).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedupe(
    df: DataFrame,
    match: list[str] | None = None,
    ignore: list[str] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Keep one row per key. ``match``/``ignore`` mirror the reference's
    field selection; ``order_col`` makes "first seen" deterministic — if
    None, falls back to Spark's dropDuplicates (any row per key)."""
    if (match is None) == (ignore is None):
        raise ValueError("exactly one of match / ignore must be set")
    keys = match if match is not None else [c for c in df.columns if c not in set(ignore)]
    if order_col is None:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
