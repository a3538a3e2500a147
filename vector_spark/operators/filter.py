"""`filter` transform — keep events matching a condition, drop the rest.

Reference: vector `src/transforms/filter.rs:20` (impl :94-95). Conditions in
the reference are VRL/Datadog-search programs returning bool
(`src/conditions/mod.rs:26-50`); here a condition is any Spark boolean
Column or SQL expression string, which Catalyst pushes down to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_col(condition: Column | str) -> Column:
    return F.expr(condition) if isinstance(condition, str) else condition


def filter_op(df: DataFrame, condition: Column | str) -> DataFrame:
    """Keep rows where ``condition`` is true (null-safe: null → dropped,
    matching vector's behavior where a failed condition drops the event)."""
    return df.where(_to_col(condition))
