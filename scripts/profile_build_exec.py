"""Per-query profile: driver-side plan BUILD time vs EXECUTION time.

The bench times `run_full(fn(spark, sf_dir))` — fn's plan construction
(py4j Column building, analysis) is inside the timed region. This
script separates the two so optimization effort goes where the time is:
build = fn(spark, sf_dir) returning the DataFrame (min-of-3), exec =
noop write of a pre-built DataFrame (min-of-3, steal-quiet only).

Usage: python scripts/profile_build_exec.py [sf_dir] [query ...]
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    from bench import HEADLINE

    from vector_spark.plans.queries import QUERIES
    from vector_spark.session import get_spark

    spark = get_spark("vector-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    if not names:
        names = HEADLINE

    # warm (mirrors bench.py)
    QUERIES["filter"].fn(spark, sf_dir).count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    spark.range(4).collect()
    spark.createDataFrame([(0, "w")], "i long, s string").count()

    rows = []
    for name in names:
        fn = QUERIES[name].fn
        builds, execs = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            builds.append(time.perf_counter() - t0)
            s0 = steal()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if steal() - s0 > 50:
                # contaminated run: one retry
                s0 = steal()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = min(dt, time.perf_counter() - t0)
            execs.append(dt)
        rows.append((name, min(builds), min(execs)))
        print(
            f"{name:40s} build={min(builds):6.3f} exec={min(execs):6.3f}",
            flush=True,
        )

    print("\n== sorted by build ==")
    for n, b, e in sorted(rows, key=lambda r: -r[1])[:15]:
        print(f"{n:40s} build={b:6.3f} exec={e:6.3f}")
    print("\n== sorted by exec ==")
    for n, b, e in sorted(rows, key=lambda r: -r[2])[:15]:
        print(f"{n:40s} build={b:6.3f} exec={e:6.3f}")
    print(f"\ntotal build={sum(r[1] for r in rows):.2f} "
          f"exec={sum(r[2] for r in rows):.2f}")


if __name__ == "__main__":
    main()
