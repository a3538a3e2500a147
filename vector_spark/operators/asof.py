"""As-of (temporal) join: match each fact row to the most recent dimension
row at-or-before its timestamp (direction="backward"), or the earliest
at-or-after (direction="forward").

The reference has no stream-stream join (SURVEY §2.2) — its closest shapes
are the memory enrichment table (`src/enrichment_tables/memory/mod.rs`,
"most recent writer wins at read time") and reduce-window lookback. As-of
join is the batch-relational generalization the driver mandate names
explicitly; Spark has no native ASOF JOIN, so this implements the classic
scalable formulation:

    tag both sides → union → one partitioned window per key →
    last(dim columns, ignorenulls) → keep fact rows

Why this beats the naive range-join: a range join (fact.ts BETWEEN dim.ts
AND next_ts) explodes into O(fact × dim-per-key) candidate pairs before
picking the max; the union+window form shuffles each input exactly once on
the join key and does a single ordered pass per key — the same plan you
would want at 100 TB (skew follows the key distribution, no
cartesian-per-key blowup, AQE skew-split applies to the sort-exchange).

Determinism contract: (on, ts_col) must be unique in `dim` (pre-aggregate
duplicates upstream); at equal timestamps the dim row is visible to the
fact row (inclusive match), matching DuckDB/pandas `merge_asof` semantics
— the DuckDB ASOF JOIN oracle in plans/queries.py pins this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    direction: str = "backward",
    suffix: str = "",
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Left as-of join. Output = all fact columns + each non-key dim column
    (suffixed) + ``asof_ts`` (the matched dim timestamp; null when no dim
    row qualifies — a left join, like DuckDB ``ASOF LEFT JOIN``).

    tolerance_sec: maximum fact-dim age; staler matches become null
    (pandas merge_asof `tolerance`).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    dim_vals = [c for c in dim.columns if c not in keys and c != ts_col]

    # All dim values travel in ONE struct (`_d_row`) so that
    # last(_d_row, ignorenulls) picks every matched field from the SAME dim
    # row — filling each column independently would stitch a row that never
    # existed whenever a dim value is null (null c2 at t=11:00 must yield
    # null, not c2 from t=09:00; pandas merge_asof / DuckDB agree).
    is_dim = "_is_dim"
    dtag = dim.select(
        *keys,
        F.col(ts_col),
        F.lit(1).alias(is_dim),
        F.struct(
            F.col(ts_col).alias("_dim_ts"),
            *[F.col(c).alias(f"_d_{c}") for c in dim_vals],
        ).alias("_d_row"),
    )
    ftag = fact.withColumn(is_dim, F.lit(0))
    u = ftag.unionByName(dtag, allowMissingColumns=True)

    # At equal ts the dim row sorts first (backward: visible to the fact
    # row) / after (forward) — the inclusive-match contract.
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(ts_col).asc(), F.col(is_dim).desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(ts_col).desc(), F.col(is_dim).desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    filled = u.select(
        "*",
        F.last("_d_row", ignorenulls=True).over(w).alias("_match"),
    )
    out = filled.where(F.col(is_dim) == 0).withColumn(
        "asof_ts", F.col("_match._dim_ts")
    )

    stale = _stale_flag(tolerance_sec, ts_col)
    return out.select(
        *fact.columns,
        F.when(stale, F.lit(None)).otherwise(F.col("asof_ts")).alias("asof_ts"),
        *[
            F.when(stale, F.lit(None))
            .otherwise(F.col(f"_match._d_{c}"))
            .alias(f"{c}{suffix}")
            for c in dim_vals
        ],
    )


def _stale_flag(tolerance_sec: int | None, ts_col: str) -> Column:
    if tolerance_sec is None:
        return F.lit(False)
    age = F.abs(F.unix_timestamp(ts_col) - F.unix_timestamp("asof_ts"))
    return age > tolerance_sec


def streaming_asof_join(
    fact_stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    output_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    direction: str = "backward",
    suffix: str = "",
    tolerance_sec: int | None = None,
    trigger_secs: int = 1,
):
    """Streaming form of the as-of join. The batch plan's window-over-
    union is unsupported over an unbounded stream (no time bound), so
    each micro-batch as-of joins the dimension snapshot via foreachBatch
    and appends to a parquet sink — the same per-event-lookup model the
    reference's enrichment reads use in a running topology
    (src/enrichment_tables/memory: readers see the table state at
    process time). The checkpoint makes batch replay exactly-once across
    restart at the source; the parquet append inside foreachBatch is the
    standard at-least-once-on-mid-batch-crash caveat of that hook.

    Returns the started StreamingQuery."""

    def fb(batch_df: DataFrame, epoch_id: int) -> None:
        asof_join(
            batch_df,
            dim,
            on=on,
            ts_col=ts_col,
            direction=direction,
            suffix=suffix,
            tolerance_sec=tolerance_sec,
        ).write.mode("append").parquet(output_path)

    return (
        fact_stream.writeStream.foreachBatch(fb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_secs} seconds")
        .start()
    )
