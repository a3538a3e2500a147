"""Time individual registry queries: N full-evaluation (noop sink)
runs each, reporting every run's wall time and the hypervisor steal
ticks observed during it, so steal-quiet minima are identifiable.

Usage: python scripts/time_query.py [--runs N] [--sf DIR] query ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def steal() -> int:
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) if len(parts) > 8 else 0
    except Exception:
        return 0


def main() -> None:
    args = sys.argv[1:]
    runs = 5
    sf_dir = "/root/testdata/sf0.1"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    from vector_spark.plans.queries import QUERIES
    from vector_spark.session import get_spark

    spark = get_spark("vector-spark-time")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["filter"].fn(spark, sf_dir).count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    spark.range(4).collect()
    spark.createDataFrame([(0, "w")], "i long, s string").count()

    for name in names:
        fn = QUERIES[name].fn
        best = None
        for r in range(runs):
            s0 = steal()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            st = steal() - s0
            mark = " *" if st > 50 else ""
            if st <= 50 and (best is None or dt < best):
                best = dt
            print(f"{name}: run{r} {dt:6.3f}s steal={st}{mark}", flush=True)
        print(f"{name}: QUIET_MIN {best if best is not None else float('nan'):.3f}",
              flush=True)


if __name__ == "__main__":
    main()
