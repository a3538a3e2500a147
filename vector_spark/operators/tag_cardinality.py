"""`tag_cardinality_limit` transform — cap distinct values per metric tag.

Reference: vector `src/transforms/tag_cardinality_limit/config.rs:18` —
modes Exact (value set), ExactFingerprint (64-bit hashes), Probabilistic
(bloom); actions drop_tag (null the offending tag) or drop_event.

Spark strategy (batch, deterministic): the first `limit` distinct values
per tag IN EXPLICIT ORDER are admitted; rows carrying a later value either
lose the tag (drop_tag) or are dropped (drop_event). Implemented as
  groupBy(tag).min(first_seen)  →  orderBy(first_seen).limit(limit)
  →  broadcast semi-join back.
The limit step compiles to TakeOrderedAndProject — a parallel per-partition
partial top-k followed by a driver merge of `limit` rows per partition — so
there is NO single-task global sort even when the adversarial input
(unbounded tag cardinality, the exact case this operator exists for) makes
the distinct set huge. The admitted set is at most `limit` rows, so the
broadcast side is bounded by config, not by data.

Streaming: bloom/seen-set state per tag via applyInPandasWithState
(vector_spark.streaming.stateful).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tag_cardinality_limit(
    df: DataFrame,
    tag_cols: list[str],
    limit: int,
    order_col: str,
    action: str = "drop_tag",
) -> DataFrame:
    """Enforce per-tag value-cardinality `limit` in first-seen order."""
    if action not in ("drop_tag", "drop_event"):
        raise ValueError("action must be drop_tag | drop_event")
    out = df
    for tag in tag_cols:
        firsts = (
            df.where(F.col(tag).isNotNull())
            .groupBy(tag)
            .agg(F.min(order_col).alias("_first_seen"))
        )
        # orderBy().limit() → TakeOrderedAndProject: parallel partial top-k,
        # no unpartitioned Window rank over the whole distinct set.
        admitted = (
            firsts.orderBy("_first_seen", tag)
            .limit(limit)
            .select(F.col(tag).alias("_admitted_value"))
        )
        joined = out.join(
            F.broadcast(admitted),
            out[tag] == admitted["_admitted_value"],
            "left",
        )
        ok = F.col("_admitted_value").isNotNull() | F.col(tag).isNull()
        if action == "drop_event":
            out = joined.where(ok).drop("_admitted_value")
        else:
            out = joined.withColumn(
                tag, F.when(ok, F.col(tag)).otherwise(F.lit(None))
            ).drop("_admitted_value")
    return out
