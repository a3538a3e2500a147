"""`sample` transform — deterministic 1-in-N / ratio sampling.

Reference: vector `src/transforms/sample/config.rs:52`,
`src/transforms/sample/transform.rs:47-82`: when `key_field` is set the
decision is hash-consistent (seahash(key) % rate == 0) so all events with
the same key share a fate; otherwise a per-group monotonic counter is used
(every Nth event). `exclude` bypasses sampling entirely.

Spark strategy — everything stays a Column expression (no shuffle for the
keyed/hash paths; the counter path needs a window over an explicit order
column because Spark has no arrival order):

- keyed: ``pmod(consistent_hash(key), rate) == 0``. We use a
  multiplicative (Knuth) hash over a 64-bit key so the same expression is
  reproducible in any engine (the DuckDB oracle included). xxhash64 is
  also exposed for production use (JVM-native, better avalanche).
- counter: ``row_number() over (partition by group_by order by seq) % rate == 1``.
- ratio: ``pmod(consistent_hash(key), 2^31) <= ratio * 2^31``.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth multiplicative constant; modulus 2^31 keeps everything in signed-64
# arithmetic (reproducible in ANSI SQL: (key * 2654435761) % 2147483648).
_KNUTH = 2654435761
_MOD = 2147483648


def consistent_hash(key: Column) -> Column:
    """Deterministic 31-bit hash of an integral key, portable across engines."""
    return F.pmod(key.cast("long") * F.lit(_KNUTH), F.lit(_MOD))


def sample(
    df: DataFrame,
    rate: int | None = None,
    ratio: float | None = None,
    key_field: Column | str | None = None,
    group_by: list[str] | None = None,
    order_col: str | None = None,
    exclude: Column | str | None = None,
    use_xxhash: bool = False,
) -> DataFrame:
    """Sample 1-in-`rate` (or `ratio` fraction) of rows.

    Exactly one of rate/ratio must be set (vector errors likewise). If
    ``key_field`` is given, the decision is key-consistent; else a
    deterministic per-group counter over ``order_col`` is used.
    """
    if (rate is None) == (ratio is None):
        raise ValueError("exactly one of rate / ratio must be set")
    excl = None
    if exclude is not None:
        excl = F.expr(exclude) if isinstance(exclude, str) else exclude

    if key_field is not None:
        key = F.col(key_field) if isinstance(key_field, str) else key_field
        h = F.pmod(F.xxhash64(key), F.lit(_MOD)) if use_xxhash else consistent_hash(key)
        keep = (h % F.lit(rate) == 0) if rate is not None else (h <= F.lit(int(ratio * _MOD)))
    elif rate is not None:
        if order_col is None:
            raise ValueError("counter sampling needs order_col (explicit arrival order)")
        if group_by:
            w = Window.partitionBy(*group_by).orderBy(order_col)
        else:
            # vector's counter is a single global stream counter; the Spark
            # analog is an unpartitioned running count — one task. Callers
            # at scale should pass group_by so the counter is per-key.
            warnings.warn(
                "counter sampling without group_by runs a single-task global "
                "window; pass group_by for a per-key counter at scale",
                stacklevel=2,
            )
            w = Window.orderBy(order_col)
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        # Excluded events pass through BEFORE the counter increments
        # (`sample/transform.rs:326-339`), so they must not perturb which
        # remaining events are selected: count only non-excluded rows.
        flag = F.lit(1) if excl is None else F.when(excl, F.lit(0)).otherwise(F.lit(1))
        # window functions can't appear in WHERE — materialize the rank first
        tagged = df.withColumn("_samp_rn", F.sum(flag).over(w))
        keep = F.col("_samp_rn") % F.lit(rate) == 1
        cond = keep if excl is None else (excl | keep)
        return tagged.where(cond).drop("_samp_rn")
    else:
        raise ValueError("ratio sampling requires key_field")

    cond = keep if excl is None else (excl | keep)
    return df.where(cond)
