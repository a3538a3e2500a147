"""A/B receipt for the remove_duplicate_spans shuffle keys at ~sf1.

Same corpus-growth model as scripts/ab_duplicate_spans.py: sf0.1 x N
suffix-tagged replicas (doc_ids offset per replica, every word tagged
with a per-replica suffix so each replica keeps its internal
duplicate-span structure while replicas share no spans — survivor/corpus
ratio stays constant, which is what real growth does). Arms, timed cold
(cache registry cleared before each run, min-of-`runs`):

  A. strategy="string" — two-level aggregation and the
     occurrence-marking join all keyed on the RAW SPAN STRING;
  B. strategy="hash" — xxhash64(span) proxy keys + witness-hash
     collision detection + in-plan AQE-pruned exact recount arm.

Unlike duplicate_spans (where the string arm additionally avoids a
text-recovery pass), remove_duplicate_spans never recovers text — the
hash is pure key narrowing, so this measures the key-width question in
isolation. Shuffle BYTES per arm come from the status REST API. A
secondary forced-SMJ pass (autoBroadcastJoinThreshold=-1, the
survivors-too-big-to-broadcast regime a real corpus hits) shows the
probe-side shuffle too. MEASURED (x10 corpus): k=5 min-of-4 — string
12.16 s / 164.7 MB vs hash 19.86 s / 305.7 MB (string wins at short k:
shuffle compression shrinks short spans to near hash width; the
hash+witness longs are incompressible). k=50 min-of-3 — hash shuffles
3.0x FEWER bytes (90.8 vs 211.6 MB; 103.7 vs 311.4 forced-SMJ) at a
12% forced-SMJ CPU delta (12.69 vs 11.34 s), local AQE-default
wall-clock still string (6.26 vs 13.48 s: tiny wide-k survivor sets
broadcast everywhere and the hash plan's extra stages dominate). Hence
the operator's auto threshold: string k<=12, hash above (bytes are the
cluster currency; local[32] has no network to show it).

Also asserts both arms return identical (doc_id, clean_text) rows, so
the speed claim is not trading correctness. Usage:

    python scripts/ab_remove_dup_spans.py [replicas] [runs] [k]

k defaults to 5 (the registry entry's value — where the string arm wins
on shuffle compression); k=50 measures the wide-span regime that
justifies the auto-strategy crossover. Writes nothing outside /tmp;
prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_spark import cache  # noqa: E402
from vector_spark.dataops.curation import remove_duplicate_spans  # noqa: E402
from vector_spark.session import get_spark  # noqa: E402


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    def string_arm(docs):
        return remove_duplicate_spans(docs, k=k, strategy="string")

    def hash_arm(docs):
        return remove_duplicate_spans(docs, k=k, strategy="hash")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "ab_remove_dup_spans",
        cpus=32,
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "40412"},
    )

    def total_shuffle_bytes() -> int:
        import urllib.request

        try:
            apps = json.load(
                urllib.request.urlopen(
                    "http://localhost:40412/api/v1/applications", timeout=10
                )
            )
            app_id = apps[0]["id"]
            stages = json.load(
                urllib.request.urlopen(
                    f"http://localhost:40412/api/v1/applications/{app_id}/stages",
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

    def bench(fn) -> tuple[float, int]:
        best = None
        sb0 = total_shuffle_bytes()
        for _ in range(runs):
            cache.clear_caches(blocking=True)
            t0 = time.perf_counter()
            fn(docs).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        sb1 = total_shuffle_bytes()
        per_run = (sb1 - sb0) // runs if sb0 >= 0 and sb1 >= 0 else -1
        return round(best, 3), per_run

    t_string, shuf_string = bench(string_arm)
    t_hash, shuf_hash = bench(hash_arm)

    # forced sort-merge pass: the survivors-exceed-broadcast regime a
    # real corpus hits (Lee et al.: duplicate text at corpus-fraction
    # scale) — here the occurrence-marking join's PROBE side shuffles,
    # and the key width is the whole game
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    t_string_smj, shuf_string_smj = bench(string_arm)
    t_hash_smj, shuf_hash_smj = bench(hash_arm)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    # value identity: multiset equality via union + count-per-row == 2
    # (each arm emits exactly one row per doc_id)
    diff = (
        hash_arm(docs)
        .unionByName(string_arm(docs))
        .groupBy("doc_id", "clean_text")
        .count()
        .where(F.col("count") != 2)
        .count()
    )
    print(
        json.dumps(
            {
                "replicas": replicas,
                "n_docs": n_docs_total,
                "k": k,
                "string_keyed_sec": t_string,
                "hash_keyed_sec": t_hash,
                "speedup": round(t_string / t_hash, 2),
                "string_keyed_shuffle_mb": round(shuf_string / 1e6, 1),
                "hash_keyed_shuffle_mb": round(shuf_hash / 1e6, 1),
                "string_keyed_smj_sec": t_string_smj,
                "hash_keyed_smj_sec": t_hash_smj,
                "smj_speedup": round(t_string_smj / t_hash_smj, 2),
                "string_keyed_smj_shuffle_mb": round(shuf_string_smj / 1e6, 1),
                "hash_keyed_smj_shuffle_mb": round(shuf_hash_smj / 1e6, 1),
                "value_diff_rows": diff,
            }
        )
    )


if __name__ == "__main__":
    main()
