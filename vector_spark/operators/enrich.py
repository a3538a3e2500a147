"""Enrichment-table lookup joins (SURVEY.md §2.2).

Reference: VRL `get_enrichment_table_record` / `find_enrichment_table_records`
(vector `lib/vector-vrl/enrichment/src/lib.rs:24-43`) against `file` (CSV,
hash-indexed, `src/enrichment_tables/file.rs:302-370`), `geoip`, and
writable `memory` tables.

Spark strategy: enrichment tables are small dimension tables → BROADCAST
hash join (no shuffle of the fact side; this is the whole design point at
100 TB). Date-range conditions (`BetweenDates`) become range predicates in
the join condition. `get_` (single-row, errors on >1 match) vs `find_`
(multi-row) semantics map to enforcing uniqueness vs plain left join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich(
    df: DataFrame,
    table: DataFrame,
    on: list[tuple[str, str]],
    date_between: tuple[str, str, str] | None = None,
    date_from: tuple[str, str] | None = None,
    date_to: tuple[str, str] | None = None,
    wildcard=None,
    single_row: bool = False,
    case_insensitive: bool = False,
    how: str = "left",
    inclusive_end: bool = True,
) -> DataFrame:
    """Left-join `df` against a broadcast enrichment `table`.

    on: [(event_col, table_col), ...] equality keys.
    date_between: (event_ts_col, table_from_col, table_to_col) range
      condition — INCLUSIVE both ends, the reference's BetweenDates
      (file.rs:349-353 `from <= date && date <= to`); pass
      inclusive_end=False for half-open validity windows.
    date_from / date_to: (event_ts_col, table_col) one-sided bounds
      (file.rs FromDate/ToDate: table date >= from / <= to).
    wildcard: a VALUE — table rows whose key cell equals it match any
      probe (file.rs:340-345: equality first, then the wildcard row).
    single_row: enforce the reference's find_table_row uniqueness — keeps
      the first matching table row per key (deterministic by table key
      order).
    """
    t = table
    cond: Column | None = None
    for ec, tc in on:
        left = F.col(f"__l.{ec}")
        right = F.col(f"__r.{tc}")
        if case_insensitive:
            left, right = F.lower(left), F.lower(right)
        c = left == right
        if wildcard is not None:
            w = F.lit(wildcard)
            if case_insensitive:
                w = F.lower(w.cast("string"))
            c = c | (right == w)
        cond = c if cond is None else cond & c
    if date_between is not None:
        ets, tfrom, tto = date_between
        upper = (
            F.col(f"__l.{ets}") <= F.col(f"__r.{tto}")
            if inclusive_end
            else F.col(f"__l.{ets}") < F.col(f"__r.{tto}")
        )
        c = (F.col(f"__l.{ets}") >= F.col(f"__r.{tfrom}")) & upper
        cond = c if cond is None else cond & c
    if date_from is not None:
        ets, tcol = date_from
        c = F.col(f"__l.{ets}") >= F.col(f"__r.{tcol}")
        cond = c if cond is None else cond & c
    if date_to is not None:
        ets, tcol = date_to
        c = F.col(f"__l.{ets}") <= F.col(f"__r.{tcol}")
        cond = c if cond is None else cond & c
    if single_row:
        key_cols = [tc for _, tc in on]
        t = t.dropDuplicates(key_cols)
    return df.alias("__l").join(F.broadcast(t.alias("__r")), cond, how)
