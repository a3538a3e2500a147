"""Measured REJECTION receipt (r12, VERDICT r11 #7): fusing the
distributed k-means Lloyd iteration (assign + centroid update) into a
single mapInPandas partial-stats pass.

Two fusion arms were prototyped against the shipped shape
(`assign_clusters` Column argmin -> posexplode -> groupBy(cluster, dim)
.avg -> collect):

  B  — FULL numpy fusion: per-batch matmul distances + argmin + per-
       cluster partial sums, one job, no explode. Interleaved min-of-4
       at sf0.1/local[32]: 0.240 s vs 0.653 s per iteration (2.3x) and
       centroids came back IDENTICAL after 2 iterations on this data.
       REJECTED on a correctness hazard, not speed: the assignment
       distance is round(d, 6) with ties to the lower cluster id, and
       Spark's `round` is BigDecimal HALF_UP while numpy's is IEEE
       HALF_EVEN — a distance landing exactly on a 5e-7 boundary flips
       its 6th decimal differently, silently reassigning a vector and
       changing centroid values the DuckDB oracle (which replays the
       Column/SQL form) would not reproduce. Closing the gap needs a
       per-element Decimal fix-up pass whose cost eats the win.
  B2 — SAFE fusion: keep the EXACT Column assignment, fuse only the
       update (mapInPandas per-cluster sums/counts instead of the 2M-row
       explode + hash agg). Interleaved min-of-4: 0.496 s vs 0.568 s —
       within host noise (one rep LOST), because the explode+agg was
       never the cost; the Column argmin scan dominates both arms.
       REJECTED as not a win (VERDICT #7's own criterion).

This script reproduces the B2 measurement (the safe arm) plus the
centroid-identity check; the full-fusion arm is kept for reference with
its hazard documented above. Usage:
  python scripts/ab_kmeans_fusion.py [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    import numpy as np

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from vector_spark.dataops.clustering import _ROUND, assign_clusters
    from vector_spark.session import get_spark
    from vector_spark.tables import load_table

    spark = get_spark("ab_kmeans_fusion", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    emb.count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    k = 8

    def arm_a(centroids):
        assigned = assign_clusters(emb, centroids)
        per_dim = (
            assigned.select(
                "cluster",
                F.posexplode(
                    F.transform(F.col("embedding"), lambda x: x.cast("double"))
                ).alias("dim", "val"),
            )
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = {c: list(cent) for c, cent in enumerate(centroids)}
        for r in per_dim:
            new[r["cluster"]][r["dim"]] = round(float(r["m"]), _ROUND)
        return [new[c] for c in range(k)]

    def arm_b2(centroids):
        import pandas as pd  # noqa: F401

        nk = len(centroids)
        assigned = (
            assign_clusters(emb, centroids)
            .select("cluster", F.col("embedding").cast("array<double>").alias("_v"))
            .where(F.col("_v").isNotNull())
        )

        def gen(batches):
            import numpy as np
            import pandas as pd

            sums = None
            counts = np.zeros(nk, dtype=np.int64)
            for pdf in batches:
                a = pdf["cluster"].to_numpy()
                V = np.array(pdf["_v"].tolist(), dtype=np.float64)
                if sums is None:
                    sums = np.zeros((nk, V.shape[1]))
                for c in np.unique(a):
                    sel = V[a == c]
                    sums[c] += sel.sum(axis=0)
                    counts[c] += len(sel)
            if sums is not None:
                yield pd.DataFrame(
                    {"cluster": range(nk), "count": counts,
                     "sums": [s.tolist() for s in sums]}
                )

        parts = assigned.mapInPandas(
            gen, schema="cluster int, count long, sums array<double>"
        ).collect()
        dim = len(centroids[0])
        sums = np.zeros((nk, dim))
        counts = np.zeros(nk, dtype=np.int64)
        for r in parts:
            sums[r["cluster"]] += np.asarray(r["sums"])
            counts[r["cluster"]] += r["count"]
        new = [list(c) for c in centroids]
        for c in range(nk):
            if counts[c]:
                for dd in range(dim):
                    new[c][dd] = round(float(sums[c][dd] / counts[c]), _ROUND)
        return new

    init_rows = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(k).collect()
    )
    init = [[round(float(x), _ROUND) for x in r["embedding"]] for r in init_rows]
    same = arm_a(arm_a(init)) == arm_b2(arm_b2(init))
    ta = tb = None
    for _ in range(reps):
        t0 = time.perf_counter()
        arm_a(init)
        t1 = time.perf_counter()
        arm_b2(init)
        t2 = time.perf_counter()
        ta = min(ta or 9e9, t1 - t0)
        tb = min(tb or 9e9, t2 - t1)
    print(json.dumps({
        "explode_agg_sec": round(ta, 3),
        "safe_fusion_sec": round(tb, 3),
        "speedup": round(ta / tb, 2),
        "centroids_identical_2_iters": same,
    }))


if __name__ == "__main__":
    main()
