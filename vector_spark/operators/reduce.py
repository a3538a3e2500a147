"""`reduce` transform — collapse multiple events into one per group.

Reference: vector `src/transforms/reduce/{config,transform,merge_strategy}.rs`
(config at `config.rs:25`): group keys + per-field merge strategies +
sessionization controls (`expire_after_ms`, `ends_when`/`starts_when`,
`max_events`).

Merge strategy → Spark aggregate mapping
(`src/transforms/reduce/merge_strategy.rs:18-56`):
  discard        -> first(col)           (by explicit order)
  retain         -> last(col)            (by explicit order)
  sum            -> sum
  max / min      -> max / min
  array          -> collect_list ordered by seq (array_agg ORDER BY)
  concat         -> concat_ws(" ", ordered values)
  concat_newline -> concat_ws("\n", ...)
  concat_raw     -> concat_ws("", ...)
  flat_unique    -> array_distinct(flatten(collect_list))
  shortest_array -> min_by(col, size(col))
  longest_array  -> max_by(col, size(col))

Batch sessionization (`sessionize`): condition/gap-driven session ids via a
running sum of start flags over (partition key → order) — the standard
flag-cumsum trick; one window + one groupBy shuffle, both on the group key.
Streaming variants (timers, expiry) are in vector_spark.streaming.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ordered_first(col: str, order_col: str) -> Column:
    return F.min_by(F.col(col), F.col(order_col))


def _ordered_last(col: str, order_col: str) -> Column:
    """Last NON-NULL by order — RetainMerger skips nulls ('works as a way
    to coalesce by not retaining null', merge_strategy.rs:24,96-101):
    null-valued rows get a null ordering key, which max_by ignores."""
    c = F.col(col)
    return F.max_by(c, F.when(c.isNotNull(), F.col(order_col)))


def merge_agg(strategy: str, col: str, order_col: str) -> Column:
    """One merge strategy → one aggregate Column (unaliased)."""
    c = F.col(col)
    if strategy == "discard":
        return _ordered_first(col, order_col)
    if strategy == "retain":
        return _ordered_last(col, order_col)
    if strategy == "sum":
        return F.sum(c)
    if strategy == "max":
        return F.max(c)
    if strategy == "min":
        return F.min(c)
    if strategy == "array":
        # order-stable: sort collected (order, value) structs by order key
        return F.transform(
            F.array_sort(F.collect_list(F.struct(F.col(order_col).alias("o"), c.alias("v")))),
            lambda s: s["v"],
        )
    if strategy in ("concat", "concat_newline", "concat_raw"):
        sep = {"concat": " ", "concat_newline": "\n", "concat_raw": ""}[strategy]
        ordered = F.transform(
            F.array_sort(F.collect_list(F.struct(F.col(order_col).alias("o"), c.alias("v")))),
            lambda s: s["v"],
        )
        return F.array_join(ordered, sep)
    if strategy == "flat_unique":
        return F.array_distinct(F.flatten(F.collect_list(c)))
    if strategy == "shortest_array":
        return F.min_by(c, F.size(c))
    if strategy == "longest_array":
        return F.max_by(c, F.size(c))
    raise ValueError(f"unknown merge strategy: {strategy}")


def reduce_op(
    df: DataFrame,
    group_by: list[str],
    merge_strategies: dict[str, tuple[str, str]],
    order_col: str,
    count_col: str | None = "n_events",
    apply_defaults: bool = False,
) -> DataFrame:
    """GroupBy + strategy aggregation.

    merge_strategies: output_name -> (strategy, input_column).
    Also emits the event count per group (the reference tracks group size
    for `max_events`).

    ``apply_defaults`` adds the reference's default-merger insertion
    (`reduce/transform.rs:86-130`) for every column NOT covered by an
    explicit strategy: numbers sum, timestamps keep the first..last range
    (`<name>` + `<name>_end`), everything else keeps the first value.
    """
    covered = {col for _, col in merge_strategies.values()}
    aggs = [
        merge_agg(strategy, col, order_col).alias(out)
        for out, (strategy, col) in merge_strategies.items()
    ]
    if apply_defaults:
        numeric = ("bigint", "int", "smallint", "tinyint", "double", "float",
                   "decimal")
        for fld in df.schema.fields:
            if (
                fld.name in group_by
                or fld.name == order_col
                or fld.name in covered
                or fld.name in merge_strategies
            ):
                continue
            t = fld.dataType.simpleString()
            if t.startswith(numeric):
                aggs.append(merge_agg("sum", fld.name, order_col).alias(fld.name))
            elif t == "timestamp":
                aggs.append(merge_agg("discard", fld.name, order_col).alias(fld.name))
                aggs.append(
                    merge_agg("retain", fld.name, order_col).alias(f"{fld.name}_end")
                )
            else:
                aggs.append(merge_agg("discard", fld.name, order_col).alias(fld.name))
    if count_col:
        aggs.append(F.count(F.lit(1)).alias(count_col))
    return df.groupBy(*group_by).agg(*aggs)


def sessionize(
    df: DataFrame,
    group_by: list[str],
    order_col: str,
    starts_when: Column | str | None = None,
    ends_when: Column | str | None = None,
    gap: Column | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign session ids within each group in explicit order.

    A new session starts when `starts_when` fires on the current row, or
    the previous row fired `ends_when`, or `gap` (boolean Column comparing
    current row to lag, e.g. ts-gap > expire_after) holds. Mirrors the
    reference's state machine (`reduce/transform.rs:266-340`) determinized
    to event order.
    """
    w = Window.partitionBy(*group_by).orderBy(order_col)
    flag = F.lit(None)
    conds = []
    if starts_when is not None:
        c = F.expr(starts_when) if isinstance(starts_when, str) else starts_when
        conds.append(F.coalesce(c, F.lit(False)))
    if ends_when is not None:
        c = F.expr(ends_when) if isinstance(ends_when, str) else ends_when
        prev_end = F.lag(F.coalesce(c, F.lit(False)), 1, False).over(w)
        conds.append(prev_end)
    if gap is not None:
        conds.append(F.coalesce(gap, F.lit(False)))
    if not conds:
        raise ValueError("need at least one of starts_when/ends_when/gap")
    flag = conds[0]
    for c in conds[1:]:
        flag = flag | c
    started = F.when(flag, F.lit(1)).otherwise(F.lit(0))
    return df.withColumn(session_col, F.sum(started).over(w))


def line_agg(
    df: DataFrame,
    group_by: list[str],
    order_col: str,
    line_col: str,
    starts_when: Column | None = None,
    mode: str | None = None,
    condition: Column | None = None,
    separator: str = "\n",
    out_col: str = "message",
) -> DataFrame:
    """Multiline aggregation (vector `src/line_agg.rs:24-48`,
    `src/sources/util/multiline_config.rs:15`): collapse consecutive lines
    into one message per group.

    Either pass ``starts_when`` (explicit message-start flag) or
    ``mode`` + ``condition`` using the reference's four modes
    (`line_agg.rs:317-330` decision table), determinized to per-line
    boundary flags over explicit order:

    - continue_through: condition marks continuation lines → a new message
      starts at every NON-matching line.
    - continue_past: condition marks "next line continues" → a new message
      starts after a non-matching line.
    - halt_before: condition marks a message-beginning line.
    - halt_with: condition marks a message-ending line → new message
      starts after it.

    Batch form of the per-file-key sessionizer: flag-cumsum session ids,
    then ordered concat — two shuffles, both on the group key.
    """
    if (starts_when is None) == (mode is None):
        raise ValueError("exactly one of starts_when / (mode, condition) required")
    if mode is not None:
        if condition is None:
            raise ValueError(f"mode {mode!r} requires condition")
        w = Window.partitionBy(*group_by).orderBy(order_col)
        cond = F.coalesce(condition, F.lit(False))
        prev = F.coalesce(F.lag(cond, 1).over(w), F.lit(False))
        if mode == "continue_through":
            starts_when = ~cond
        elif mode == "continue_past":
            starts_when = ~prev
        elif mode == "halt_before":
            starts_when = cond
        elif mode == "halt_with":
            starts_when = prev
        else:
            raise ValueError(f"unknown line_agg mode {mode!r}")
    sess = sessionize(
        df, group_by=group_by, order_col=order_col,
        starts_when=starts_when, session_col="_line_sess",
    )
    ordered = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(line_col).alias("v")))
        ),
        lambda s: s["v"],
    )
    return (
        sess.groupBy(*group_by, "_line_sess")
        .agg(
            F.array_join(ordered, separator).alias(out_col),
            F.min(order_col).alias("first_" + order_col),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .withColumnRenamed("_line_sess", "message_id")
    )
