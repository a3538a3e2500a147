"""Interleaved A/B: tpch_q1 with vs without _spread on the lineitem
scan. At bench SF every table is ONE parquet row group, so q1's
scan + cents projection + partial aggregation serialize on a single
core; _spread (round-robin repartition, identity at real scale where
the scan has more splits than cores) fans the projection + partial agg
across the node. Integer cents sums are order-independent, so the
result is bit-identical.

Usage: python scripts/ab_q1_spread.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def steal() -> int:
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) if len(parts) > 8 else 0
    except Exception:
        return 0


def build_q1(spark, sf_dir, spread: bool):
    from vector_spark.plans.queries import _cents, _spread, _t

    li = _t(spark, sf_dir, "lineitem")
    if spread:
        li = _spread(li, spark)
    li = li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    qty_c = _cents(F.col("l_quantity"))
    price_c = _cents(F.col("l_extendedprice"))
    disc_c = _cents(F.col("l_discount"))
    tax_c = _cents(F.col("l_tax"))
    li = li.select(
        "l_returnflag",
        "l_linestatus",
        qty_c.alias("qc"),
        price_c.alias("pc"),
        disc_c.alias("dc"),
        tax_c.alias("tc"),
        (price_c * (100 - disc_c)).alias("dpc"),
        (price_c * (100 - disc_c) * (100 + tax_c)).alias("chc"),
    )
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum("qc") / 100.0).alias("sum_qty"),
        (F.sum("pc") / 100.0).alias("sum_base_price"),
        (F.sum("dpc") / 10000.0).alias("sum_disc_price"),
        (F.sum("chc") / 1000000.0).alias("sum_charge"),
        ((F.sum("qc") / 100.0) / F.count(F.lit(1))).alias("avg_qty"),
        ((F.sum("pc") / 100.0) / F.count(F.lit(1))).alias("avg_price"),
        ((F.sum("dc") / 100.0) / F.count(F.lit(1))).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return g.orderBy("l_returnflag", "l_linestatus")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from vector_spark.plans.queries import QUERIES
    from vector_spark.session import get_spark

    spark = get_spark("ab-q1-spread")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["filter"].fn(spark, sf_dir).count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    a = [tuple(r) for r in build_q1(spark, sf_dir, False).collect()]
    b = [tuple(r) for r in build_q1(spark, sf_dir, True).collect()]
    print(f"q1 identical: {a == b} ({len(a)} rows)", flush=True)

    def run(df):
        s0 = steal()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0, steal() - s0

    for r in range(rounds):
        od, ost = run(build_q1(spark, sf_dir, False))
        nd, nst = run(build_q1(spark, sf_dir, True))
        print(
            f"q1 round{r}: old {od:6.3f}s (steal {ost})"
            f"  spread {nd:6.3f}s (steal {nst})",
            flush=True,
        )


if __name__ == "__main__":
    main()
