"""A/B receipt for the memory-table Arrow driver transfers (r12).

Times the two DRIVER transfer legs of the memory enrichment table at a
10x table (the sf0.1 signup key set replicated 10x, ~30k rows — the
bounded-by-contract regime, scaled):

  write leg:    DataFrame -> driver dict
      A. r11 row path: .collect() (pickled Rows)
      B. r12 Arrow path: .toArrow().to_pylist() (one columnar batch)
  snapshot leg: driver dict -> DataFrame (materialized via noop write)
      A. r11 row path: createDataFrame(rows, ddl)
      B. r12 Arrow path: createDataFrame(typed pyarrow.Table)

Both leg pairs assert VALUE IDENTITY (same dict contents after write;
same collected snapshot rows), so the numbers are not trading the
NULL/NaN semantics that deferred this in r11 (those are pinned by
tests/test_memory_table_config.py::test_arrow_transfers_preserve_null_and_nan).

Usage: python scripts/ab_memtable_arrow.py [replicas] [runs]
Prints one JSON line. Writes nothing outside /tmp.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_spark.session import get_spark  # noqa: E402
from vector_spark.streaming.memory_table import MemoryTable  # noqa: E402


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_memtable_arrow", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    base = ev.where(F.col("event_type") == "signup").select(
        F.col("user_id").cast("long").alias("mem_key"),
        (F.col("user_id") * 2 + 1).cast("double").alias("mem_value"),
    )
    n0 = base.count()
    kv = (
        spark.range(replicas)
        .crossJoin(base)
        .select(
            (F.col("mem_key") + F.col("id") * 1_000_000_000).alias("mem_key"),
            "mem_value",
        )
        .localCheckpoint()  # freeze the input so both arms read identical data
    )
    n_rows = kv.count()

    def bench(fn):
        best = None
        out = None
        for _ in range(runs):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return round(best, 3), out

    # ---- write leg ----
    def write_rowpath():
        tbl = MemoryTable(key_col="mem_key", value_col="mem_value",
                          value_type="double")
        now = 100.0
        for row in kv.select("mem_key", "mem_value").collect():
            tbl.put(row["mem_key"], row["mem_value"], now, None)
        return tbl

    def write_arrow():
        tbl = MemoryTable(key_col="mem_key", value_col="mem_value",
                          value_type="double")
        tbl.write_batch(kv, now=100.0)
        return tbl

    t_write_rows, tbl_a = bench(write_rowpath)
    t_write_arrow, tbl_b = bench(write_arrow)
    write_identical = {k: v[0] for k, v in tbl_a._data.items()} == {
        k: v[0] for k, v in tbl_b._data.items()
    }

    # ---- snapshot leg ----
    tbl = tbl_b

    def snap_rowpath():
        rows = [(str(k), tbl._coerce(v, "double"))
                for k, (v, _, _) in tbl._data.items()]
        df = spark.createDataFrame(
            rows or [], f"{tbl.key_col} string, {tbl.value_col} double"
        )
        df.write.format("noop").mode("overwrite").save()
        return df

    def snap_arrow():
        df = tbl.snapshot(spark)
        df.write.format("noop").mode("overwrite").save()
        return df

    t_snap_rows, df_a = bench(snap_rowpath)
    t_snap_arrow, df_b = bench(snap_arrow)
    snap_identical = sorted(map(tuple, df_a.collect())) == sorted(
        map(tuple, df_b.collect())
    )

    print(json.dumps({
        "replicas": replicas,
        "base_rows": n0,
        "table_rows": n_rows,
        "write_rowpath_sec": t_write_rows,
        "write_arrow_sec": t_write_arrow,
        "write_speedup": round(t_write_rows / t_write_arrow, 2),
        "snapshot_rowpath_sec": t_snap_rows,
        "snapshot_arrow_sec": t_snap_arrow,
        "snapshot_speedup": round(t_snap_rows / t_snap_arrow, 2),
        "write_identical": write_identical,
        "snapshot_identical": snap_identical,
    }))


if __name__ == "__main__":
    main()
