"""Physical data-layout utilities for 100 TB-scale joins and aggregations.

Three levers the mandate calls out explicitly, packaged so pipelines can
apply them declaratively:

- write_bucketed / read_bucketed — persist a table hash-bucketed (and
  optionally sorted) on its join key so repeated joins/aggregations on
  that key run with ZERO shuffle on the bucketed side(s). This is Spark's
  bucketing (Hive-compatible layout); at 100 TB it converts every
  fact-fact join on the bucket key from a full exchange of both sides
  into a local zip of pre-aligned buckets.
- salted_join — explicit skew mitigation for joins AQE can't fix (e.g.
  when the skewed side feeds a single hot key to a broadcast-ineligible
  join): fact rows scatter across `salt` sub-keys, the dim side
  replicates `salt`×, the hot key's work spreads over `salt` tasks.
- repartition_by_size — choose a partition count from the actual input
  bytes (files-size estimate) so each task lands near a target
  partition size instead of inheriting whatever upstream produced.

The reference has no analogs (single-node pipeline; its "layout" concern
is disk-buffer segments, buffer/disk/mod.rs) — these exist for the Spark
execution model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    n_buckets: int = 32,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
    path: str | None = None,
) -> None:
    """Materialize `df` as a bucketed (+ optionally sorted) managed table.

    A join or groupBy on `bucket_cols` between two tables bucketed with
    the SAME column set and bucket count runs shuffle-free (Catalyst
    reports the hash-partitioning as satisfied — see
    tests/test_layout.py's no-Exchange plan assertion). Sorting within
    buckets additionally enables sort-merge join without a per-task sort.
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else bucket_cols
    w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else sort_cols
        w = w.sortBy(*sort_cols)
    if path:  # external table (explicit location instead of the warehouse)
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a table written by write_bucketed, bucket metadata intact."""
    return spark.table(table)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    salt: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with explicit key salting for skewed fact keys.

    Fact rows get a uniform salt in [0, salt); the dim side cross-joins a
    `salt`-row range so every (key, salt) bucket finds its dim rows. The
    join result is IDENTICAL to fact.join(dim, on, how) — the salt only
    splits the hot key's rows across `salt` tasks instead of one.

    Use when: the dim side is too big to broadcast AND one fact key
    dominates (AQE skew-split handles sort-merge skew within a stage, but
    cannot split a single key finer than its partition when downstream
    state pins partitioning). Cost: dim side inflates `salt`× — keep salt
    small (8-32) and the dim the smaller input.

    Supported how: inner / left (semantics preserved; the salt column
    never escapes).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    fact_s = fact.withColumn(
        "_salt", F.floor(F.rand(seed) * salt).cast("int")
    )
    dim_s = dim.join(
        F.broadcast(
            dim.sparkSession.range(salt).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    out = fact_s.join(dim_s, keys + ["_salt"], how)
    return out.drop("_salt")


def compact_files(
    spark: SparkSession,
    path: str,
    target_mb: int = 256,
    fmt: str = "parquet",
) -> dict:
    """Rewrite a directory of small files into ~target_mb files (the
    small-files problem: streaming sinks and per-partition writers leave
    thousands of KB-scale files that poison later scan planning — at 100 TB
    a listing of 10M files costs more than the read). Two-phase for crash
    safety: write compacted output to a sibling temp dir, then swap dirs —
    a failure before the swap leaves the original untouched.

    Returns {"files_before": n, "files_after": m, "rows": r}.
    """
    import os
    import shutil
    import uuid

    def _data_files(p: str) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(p):
            out += [
                os.path.join(root, f)
                for f in files
                if not f.startswith(("_", "."))
            ]
        return out

    before = _data_files(path)
    df = spark.read.format(fmt).load(path)
    rows = df.count()
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    repartition_by_size(df, target_mb).write.format(fmt).mode(
        "overwrite"
    ).save(tmp)
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {
        "files_before": len(before),
        "files_after": len(_data_files(path)),
        "rows": rows,
    }


def repartition_by_size(
    df: DataFrame,
    target_mb: int = 256,
    cols: list[str | Column] | None = None,
) -> DataFrame:
    """Repartition so each output partition holds ~target_mb of input
    data, estimated from the logical plan's statistics (file sizes for
    scans). Use before wide transforms whose cost scales with partition
    size (big sorts, mapInPandas) or before writing to keep output files
    near the target (the small-files problem at 100 TB: a 1000-executor
    job writing 32 partitions per executor per hour makes millions of
    tiny files unless sized deliberately)."""
    size_bytes = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    n = max(1, min(int(size_bytes // (target_mb * 1024 * 1024)) + 1, 200_000))
    if cols:
        return df.repartition(n, *cols)
    return df.repartition(n)
