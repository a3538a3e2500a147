"""`route` and `exclusive_route` transforms — multi-way stream splits.

Reference:
- `route`: event goes to EVERY matching route; non-matching events go to the
  `_unmatched` output unless ``reroute_unmatched=False``
  (vector `src/transforms/route.rs:58`, UNMATCHED_ROUTE `:17`).
- `exclusive_route`: first-match-wins if/elif/else; implicit `_default`
  (vector `src/transforms/exclusive_route/config.rs:50`).

Spark strategy: each route is a filter over the SAME parent DataFrame, so
Catalyst prunes/pushes independently per output; nothing is materialized
until a sink acts. For exclusive_route we additionally provide a
single-pass tagger (`exclusive_route_tag`) that emits one `_route` column —
the scale-friendly form when all outputs land in one partitioned sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNMATCHED_ROUTE = "_unmatched"
DEFAULT_ROUTE = "_default"


def _to_col(condition: Column | str) -> Column:
    return F.expr(condition) if isinstance(condition, str) else condition


def route(
    df: DataFrame,
    routes: dict[str, Column | str],
    reroute_unmatched: bool = True,
) -> dict[str, DataFrame]:
    """Multi-match split: a row appears in every route whose condition holds."""
    conds = {name: _to_col(c) for name, c in routes.items()}
    out = {name: df.where(c) for name, c in conds.items()}
    if reroute_unmatched:
        none_match = None
        for c in conds.values():
            none_match = ~c if none_match is None else none_match & ~c
        if none_match is not None:
            # treat null condition results as non-matching (coalesce to false)
            matched = None
            for c in conds.values():
                cc = F.coalesce(c, F.lit(False))
                matched = cc if matched is None else matched | cc
            out[UNMATCHED_ROUTE] = df.where(~matched)
    return out


def exclusive_route_tag(
    df: DataFrame,
    routes: list[tuple[str, Column | str]],
    tag_col: str = "_route",
) -> DataFrame:
    """Single-pass first-match-wins tagging: adds ``tag_col`` with the name of
    the first matching route, else `_default`. Preferred at scale (one scan)."""
    expr = None
    for name, cond in routes:
        c = _to_col(cond)
        expr = F.when(c, F.lit(name)) if expr is None else expr.when(c, F.lit(name))
    expr = F.lit(DEFAULT_ROUTE) if expr is None else expr.otherwise(F.lit(DEFAULT_ROUTE))
    return df.withColumn(tag_col, expr)


def exclusive_route(
    df: DataFrame,
    routes: list[tuple[str, Column | str]],
) -> dict[str, DataFrame]:
    """First-match-wins split into one DataFrame per route + `_default`."""
    tagged = exclusive_route_tag(df, routes)
    names = [name for name, _ in routes] + [DEFAULT_ROUTE]
    return {name: tagged.where(F.col("_route") == name).drop("_route") for name in names}
