"""Loaders for the driver's synthetic tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# DataFrame-object memo: a logical plan is immutable, so re-serving the
# same object per (session, path) skips the per-build py4j/analysis
# constant (schema read + NTZ normalization ≈ 1-2 s on first touch) that
# every query otherwise pays again. Data is NOT cached — only the plan.
_PLAN_MEMO: dict[tuple[int, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table, normalizing every timestamp flavor the driver's
    generator has produced to plain TIMESTAMP (an instant, naive-as-UTC):

    - TIMESTAMP(NANOS): Spark has no native type — read nanos as long and
      truncate to microsecond timestamps (Spark's native precision).
    - timestamp[us] without timezone: Spark 4 infers TIMESTAMP_NTZ.
      `to_utc_timestamp(c, 'UTC')` maps the naive wall time to the same
      instant DuckDB's naive `epoch()` assumes, independent of the session
      timezone — so epoch arithmetic (`unix_micros`, `unix_timestamp`,
      `window`) agrees with the oracle in ANY session, not just UTC ones.
    """
    key = (id(spark), table_path(sf_dir, name))
    hit = _PLAN_MEMO.get(key)
    if hit is not None:
        return hit
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Read naive parquet timestamps as TIMESTAMP directly instead of
    # TIMESTAMP_NTZ + a `to_utc_timestamp(col, 'UTC')` wrapper: the two
    # are value-identical (stored micros become the same instant; the
    # session is pinned UTC), but the wrapper is a FUNCTION of the column
    # and therefore blocked predicate pushdown on every timestamp filter
    # in the registry (q3's l_shipdate predicate reached the scan as
    # IsNotNull only — no min/max row-group skipping, plus a per-row
    # timezone conversion in the filter). With the conf off, date
    # predicates push into PushedFilters and the wrapper branch below
    # never fires. The branch stays as the fallback for sessions that
    # don't honor the conf (the NTZ path remains correct, just slower).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(table_path(sf_dir, name))
    for f in df.schema.fields:
        if f.name == "ts" and f.dataType.simpleString() == "bigint":
            # integer div: ns values exceed double's exact range, no float detour
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif f.dataType.simpleString() == "timestamp_ntz":
            df = df.withColumn(
                f.name, F.expr(f"to_utc_timestamp({f.name}, 'UTC')")
            )
    # NOTE on local scan parallelism: the bench tables are single-row-group
    # parquet files, so each scan is ONE split and narrow chains above it
    # run on one core. A blanket repartition-after-scan was measured here
    # and REJECTED: it does fan out CPU-heavy codec chains (otlp roundtrip
    # 4.1→2.8 s) but costs every scan→broadcast-join→agg query an extra
    # exchange and drops the pipeline headline from ~470k to ~173k
    # events/s. On real cluster inputs files provide thousands of splits
    # and none of this applies.
    _PLAN_MEMO[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each table as a temp view so spark.sql() can reference it."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
