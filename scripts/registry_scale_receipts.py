"""Registry-wide scaling receipts: the standing sf0.1 → ~sf1 gate.

The per-op receipts in sf1_receipts.py cover hand-picked heavy
operators; this script turns the check into a ROUND-INVARIANT gate
over the registry itself: time every `queries()` entry at sf0.1, take
the N slowest, re-run them on a REPLICAS×-replicated copy of ALL ten
tables, and assert the wall-clock ratio stays ≲ MAX_RATIO (linear
plus a constant — an entry whose cost curve bends quadratic shows up
as a ratio far above the replication factor).

Replication model (each table keeps its internal structure; replicas
share no keys, so join fan-out and group cardinality scale linearly —
the corpus-growth model sf1_receipts.py uses for documents, extended
to the whole schema):
- region/nation: fixed dimension tables, copied once (scale-invariant
  at any SF, like TPC-H).
- customer/supplier/part/orders/lineitem: every key column offsets by
  replica × (max_key + 1) of its key FAMILY, so lineitem→orders→
  customer joins stay intra-replica and referential integrity holds.
- events: event_id and user_id offset (10× events over 10× users —
  per-user density constant, matching how event volume actually
  grows).
- documents: doc_id offset AND every word suffix-tagged per replica —
  internal duplicate/span structure survives, replicas share no
  vocabulary, so dedup/LM outputs scale linearly instead of
  degenerating.
- embeddings: vec_id offset and each dimension multiplied by a
  DETERMINISTIC per-replica ±1 sign (a Rademacher pattern keyed on
  (replica, dim)) — within a replica every pairwise cosine is EXACTLY
  preserved (signs square away), while cross-replica cosines become
  sign-scrambled sums with expectation ~0 even for structured/
  clustered embeddings (a circular rotation, the first attempt, let
  clustered dims line back up and near-dup pairs grew superlinearly).

Usage:
  python scripts/registry_scale_receipts.py [N_slowest] [replicas] \
      [max_ratio] [entry ...]
Prints one JSON line; exits 1 if any swept entry exceeds max_ratio.
Writes replicas under /tmp only. One Spark JVM — do not run alongside
another gate.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

# TPC-H-style key families: column → the table whose max defines the
# per-replica offset stride.
_KEY_FAMILIES = {
    "c_custkey": "customer", "o_custkey": "customer",
    "s_suppkey": "supplier", "l_suppkey": "supplier",
    "p_partkey": "part", "l_partkey": "part",
    "o_orderkey": "orders", "l_orderkey": "orders",
    "event_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}
_USER_STRIDE_COL = "user_id"  # events: offset by max(user_id)+1
_DIM_TABLES = ("region", "nation")

# Entries whose documented contract makes the WORK quadratic. Their
# receipts are reported but not held to the linear gate; asserting a
# linear ratio on a quadratic contract would just ban exactness.
# - docs_text_near_dup / embedding_near_dup: EXACT all-pairs verify
#   (O(n²) by definition — the dense tiled arm's T² block pairs).
# - embedding_near_dup_lsh / embedding_dedup_components: recall-1
#   oracle configs at threshold 0.4 — MEASURED on the 10× replica
#   corpus, the TRUE pair count grows 105× (920 → 97,337) because at
#   dim 64 a 0.4 threshold sits ~3σ into the background-cosine tail,
#   so the OUTPUT is quadratic in n; wall grew only ~20× for 105×
#   output (sublinear per output row). The linear-scale regime is
#   high thresholds (0.9+) with planes scaled to corpus size
#   (cosine_near_dup_pairs target_bucket_rows).
QUADRATIC_BY_CONTRACT = {
    "docs_text_near_dup",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "embedding_dedup_components",
}


def build_replica_dir(spark, sf_dir: str, replicas: int) -> str:
    from vector_spark.tables import TABLE_NAMES, load_table

    tag = sf_dir.rstrip("/").replace("/", "_")
    out_dir = f"/tmp/registry_scale{tag}_x{replicas}"
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    strides: dict[str, int] = {}
    for fam in set(_KEY_FAMILIES.values()):
        key = next(k for k, v in _KEY_FAMILIES.items()
                   if v == fam and not k.startswith(("l_", "o_c")))
        strides[fam] = (
            load_table(spark, sf_dir, fam).agg(
                F.max(key)
            ).collect()[0][0] + 1
        )
    user_stride = load_table(spark, sf_dir, "events").agg(
        F.max(_USER_STRIDE_COL)
    ).collect()[0][0] + 1
    for name in TABLE_NAMES:
        base = load_table(spark, sf_dir, name)
        path = os.path.join(out_dir, f"{name}.parquet")
        if name in _DIM_TABLES:
            base.write.mode("overwrite").parquet(path)
            continue
        reps = []
        for i in range(replicas):
            r = base
            for col in base.columns:
                if col in _KEY_FAMILIES:
                    r = r.withColumn(
                        col,
                        (F.col(col)
                         + F.lit(i * strides[_KEY_FAMILIES[col]]))
                        .cast("long"),
                    )
            if name == "events":
                r = r.withColumn(
                    _USER_STRIDE_COL,
                    (F.col(_USER_STRIDE_COL)
                     + F.lit(i * user_stride)).cast("long"),
                )
            if name == "documents":
                r = r.withColumn(
                    "text",
                    F.regexp_replace(
                        F.col("text"), r"(\S+)", rf"$1•{i}"
                    ),
                )
            if name == "embeddings" and i:
                r = r.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, d: x * (
                            F.pmod(
                                F.xxhash64(F.lit(i), d), F.lit(2)
                            ).cast("double") * 2.0 - 1.0
                        ),
                    ),
                )
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.repartition(32).write.mode("overwrite").parquet(path)
    with open(done, "w") as f:
        f.write("ok")
    return out_dir


def time_entry(fn, spark, sf_dir: str, runs: int) -> float:
    from vector_spark import clear_caches

    best = None
    for _ in range(runs):
        clear_caches(blocking=True)
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return best


def sweep(spark, sf_dir: str, n_slowest: int, replicas: int,
          max_ratio: float, only: set[str]) -> dict:
    import __spark_entry__ as entry

    qs = entry.queries()
    if only:
        ranked = [(name, 0.0) for name in only if name in qs]
    else:
        timings = {}
        for name, fn in qs.items():
            try:
                timings[name] = time_entry(fn, spark, sf_dir, runs=1)
            except Exception as e:  # pragma: no cover - diagnostics
                print(f"# {name}: rank error {e}", file=sys.stderr)
        ranked = sorted(
            timings.items(), key=lambda kv: -kv[1]
        )[:n_slowest]
        print(f"# slowest at {sf_dir}: {ranked}", file=sys.stderr)
    big_dir = build_replica_dir(spark, sf_dir, replicas)
    out: dict = {"sf_dir": sf_dir, "replicas": replicas,
                 "max_ratio": max_ratio, "entries": {}}
    failures = []
    for name, _t in ranked:
        fn = qs[name]
        try:
            t1 = time_entry(fn, spark, sf_dir, runs=2)
            tn = time_entry(fn, spark, big_dir, runs=2)
        except Exception as e:
            # an entry that ERRORS at scale is the worst failure mode
            # (r9: the tiled-cosine ambiguous-self-join) — record it
            # and keep sweeping the rest
            out["entries"][name] = {"error": str(e)[:200]}
            failures.append(name)
            print(f"# {name}: ERROR {str(e)[:120]}", file=sys.stderr)
            continue
        ratio = round(tn / max(t1, 1e-9), 1)
        exempt = name in QUADRATIC_BY_CONTRACT
        ok = exempt or ratio <= max_ratio
        out["entries"][name] = {
            "x1_s": round(t1, 2), f"x{replicas}_s": round(tn, 2),
            "ratio": ratio, "ok": ok,
            **({"quadratic_by_contract": True} if exempt else {}),
        }
        if not ok:
            failures.append(name)
        print(f"# {name}: {out['entries'][name]}", file=sys.stderr)
    out["failures"] = failures
    return out


def main() -> None:
    from vector_spark.session import get_spark

    n_slowest = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    max_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0
    only = set(sys.argv[4:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("registry-scale", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = sweep(spark, sf_dir, n_slowest, replicas, max_ratio, only)
    print(json.dumps(out))
    sys.exit(1 if out["failures"] else 0)


if __name__ == "__main__":
    main()
