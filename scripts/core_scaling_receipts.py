"""8-vs-32-core scaling receipts on a MULTI-ROW-GROUP ~sf1 corpus.

VERDICT r11 "what's wrong" #7 / "next round" #6: the driver's 8-vs-32
scaling block at sf0.1 is structurally ~1 because every sf0.1 parquet
table is ONE row group — every scan is one task at any core count, so
per-entry fixed costs dominate and the bench cannot demonstrate scan
parallelism. This script makes the parallelism claim measurable:

- builds the 10x replicated corpus via
  scripts/registry_scale_receipts.build_replica_dir (every table written
  as 32 parquet files -> >=32 independent scan splits);
- times the requested HEADLINE entries (default: the heaviest
  compute-bound ones) with the bench's own methodology (noop sink,
  min-of-N) at local[32] and local[8], each in its OWN subprocess (one
  JVM per master — the session factory only sets master when no active
  session exists, and a same-process restart would inherit warmed JIT
  unevenly between the arms);
- prints one JSON line with per-entry seconds and the 8-core/32-core
  ratio (ideal compute-bound scaling = 4.0; ~1 means fixed costs still
  dominate that entry; SCALING.md carries the table + per-entry notes).

Usage:
  python scripts/core_scaling_receipts.py [replicas] [runs] [entry ...]
  python scripts/core_scaling_receipts.py --worker <cpus> <sf_dir> <runs> <out> <entry ...>

Writes replicas under /tmp only. One Spark JVM at a time.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# compute-heavy headline entries whose work is spreadable by design
DEFAULT_ENTRIES = [
    "docs_remove_duplicate_spans",
    "docs_duplicate_spans",
    "docs_bpe_encode",
    "docs_nb_classify",
    "docs_minhash_lsh",
    "docs_hashed_tfidf",
    "docs_text_stats",
    "native_proto_roundtrip",
    "syslog_roundtrip",
    "multimodal_features",
    "zstd_entropy_decode",
    "tag_cardinality_limit",
]


def _steal() -> int:
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) if len(parts) > 8 else 0
    except Exception:
        return 0


def worker(cpus: int, sf_dir: str, runs: int, out_path: str,
           entries: list[str]) -> None:
    from vector_spark import clear_caches
    from vector_spark.plans.queries import QUERIES
    from vector_spark.session import get_spark

    spark = get_spark(f"core-scaling-{cpus}", cpus=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # same warmups as bench.py
    QUERIES["filter"].fn(spark, sf_dir).count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    out: dict = {}
    for name in entries:
        fn = QUERIES[name].fn
        best, best_steal = None, 0
        for _ in range(runs):
            clear_caches(blocking=True)
            s0 = _steal()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            st = _steal() - s0
            if best is None or dt < best:
                best, best_steal = dt, st
        out[name] = {"sec": round(best, 3), "steal": best_steal}
        print(f"# [{cpus}c] {name}: {best:.3f}s steal={best_steal}",
              file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(out, f)


def main() -> None:
    if sys.argv[1:2] == ["--worker"]:
        cpus, sf_dir, runs, out_path = (
            int(sys.argv[2]), sys.argv[3], int(sys.argv[4]), sys.argv[5]
        )
        worker(cpus, sf_dir, runs, out_path, sys.argv[6:])
        return

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    replicas = int(args[0]) if len(args) > 0 else 10
    runs = int(args[1]) if len(args) > 1 else 3
    entries = args[2:] or DEFAULT_ENTRIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # build the replica corpus once (32 files per table)
    from registry_scale_receipts import build_replica_dir
    from vector_spark.session import get_spark

    spark = get_spark("core-scaling-build", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    big_dir = build_replica_dir(spark, sf_dir, replicas)
    spark.stop()

    results = {}
    for cpus in (32, 8):
        out_path = f"/tmp/core_scaling_{cpus}.json"
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               str(cpus), big_dir, str(runs), out_path] + entries
        subprocess.run(cmd, check=True)
        with open(out_path) as f:
            results[cpus] = json.load(f)

    report = {
        "sf_dir": sf_dir, "replicas": replicas, "runs": runs,
        "entries": {
            name: {
                "sec_32c": results[32][name]["sec"],
                "sec_8c": results[8][name]["sec"],
                "ratio_8c_over_32c": round(
                    results[8][name]["sec"] / results[32][name]["sec"], 2
                ),
                "steal_32c": results[32][name]["steal"],
                "steal_8c": results[8][name]["steal"],
            }
            for name in entries
        },
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
