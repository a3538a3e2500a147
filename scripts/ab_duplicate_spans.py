"""A/B receipt for the duplicate_spans shuffle shape at ~sf1.

Builds a 10x-replicated documents table (sf0.1 x 10; doc_ids offset per
replica AND every word tagged with a per-replica suffix, so each
replica's internal duplicate-span structure is preserved exactly while
replicas share no spans — the corpus-growth model where the
survivors/corpus ratio stays constant, which is what real growth does;
naive replication without the suffix makes EVERY span a survivor, a
distribution no real corpus has) and times, cold (cache registry
cleared before each arm):

  A. strategy="string" — one corpus-wide shuffle keyed on the RAW SPAN
     STRING (count_distinct(doc) grouped by span text; the r4 shape
     plus the repartition guard);
  B. strategy="hash" — corpus-wide shuffle keyed on xxhash64(span)
     (fixed-width rows + collision witness + representative doc),
     survivor-sized text recovery, collision-gated recount.

Both from vector_spark.dataops.curation.duplicate_spans. Shuffle BYTES
per arm come from the status REST API — the quantity the hash shape
optimizes; shuffle compression is why string wins at k=5 (short English
spans compress to near hash width; hash/witness longs don't compress).

Also asserts both arms return identical results, so the speed claim is
not trading correctness. Usage:

    python scripts/ab_duplicate_spans.py [replicas] [runs]

Writes nothing outside /tmp; prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_spark import cache  # noqa: E402
from vector_spark.dataops.curation import duplicate_spans  # noqa: E402
from vector_spark.session import get_spark  # noqa: E402


def string_arm(docs: DataFrame) -> DataFrame:
    return duplicate_spans(docs, strategy="string")


def hash_arm(docs: DataFrame) -> DataFrame:
    return duplicate_spans(docs, strategy="hash")


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # UI on: the receipt needs per-arm SHUFFLE BYTES (the quantity the
    # hash shape optimizes), read from the status REST API
    spark = get_spark(
        "ab_duplicate_spans",
        cpus=32,
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "40411"},
    )

    def total_shuffle_bytes() -> int:
        import urllib.request

        try:
            apps = json.load(
                urllib.request.urlopen(
                    "http://localhost:40411/api/v1/applications", timeout=10
                )
            )
            app_id = apps[0]["id"]
            stages = json.load(
                urllib.request.urlopen(
                    f"http://localhost:40411/api/v1/applications/{app_id}/stages",
                    timeout=10,
                )
            )
            return sum(s.get("shuffleWriteBytes", 0) for s in stages)
        except Exception:
            return -1

    big_path = f"/tmp/ab_docs_x{replicas}.parquet"
    if not os.path.exists(big_path):
        base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        n = base.count()
        reps = [
            base.withColumn(
                "doc_id", (F.col("doc_id") + F.lit(i * n)).cast("long")
            ).withColumn(
                "text",
                F.regexp_replace(F.col("text"), r"(\S+)", rf"$1•{i}"),
            )
            for i in range(replicas)
        ]
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.repartition(32).write.mode("overwrite").parquet(big_path)
    docs = spark.read.parquet(big_path)
    n_docs_total = docs.count()

    def bench(fn) -> tuple[float, int, int]:
        best, rows = None, 0
        sb0 = total_shuffle_bytes()
        for _ in range(runs):
            cache.clear_caches(blocking=True)
            t0 = time.perf_counter()
            rows = fn(docs).count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        sb1 = total_shuffle_bytes()
        per_run = (sb1 - sb0) // runs if sb0 >= 0 and sb1 >= 0 else -1
        return round(best, 3), rows, per_run

    t_string, rows_string, shuf_string = bench(string_arm)
    t_hash, rows_hash, shuf_hash = bench(hash_arm)

    # value identity: the hash shape must return exactly the string
    # shape's rows (collision-gated recount preserves exactness). Each
    # arm emits one row per span, so multiset equality == every
    # (span, n_docs) appearing exactly twice in the union. (exceptAll
    # hits a Spark 4.1 INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND on these
    # subplans — its replicate-and-sum rewrite loses the span attr.)
    diff = (
        hash_arm(docs)
        .unionByName(string_arm(docs))
        .groupBy("span", "n_docs")
        .count()
        .where(F.col("count") != 2)
        .count()
    )
    print(
        json.dumps(
            {
                "replicas": replicas,
                "n_docs": n_docs_total,
                "string_keyed_sec": t_string,
                "hash_keyed_sec": t_hash,
                "speedup": round(t_string / t_hash, 2),
                "string_keyed_shuffle_mb": round(shuf_string / 1e6, 1),
                "hash_keyed_shuffle_mb": round(shuf_hash / 1e6, 1),
                "rows_string": rows_string,
                "rows_hash": rows_hash,
                "value_diff_rows": diff,
            }
        )
    )


if __name__ == "__main__":
    main()
