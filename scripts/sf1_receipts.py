"""sf1 receipts for the round-6/7/8 heavy multi-shuffle ops.

Benchmarks nb_classify, bigram_lm_score, dedup_keep_best (the three new
multi-shuffle pipelines) and remove_duplicate_spans (the de-forced-
broadcast rewrite) at 1x (sf0.1) and Nx (default 10x ~ sf1), using the
same corpus-growth model as ab_duplicate_spans: doc_ids offset per
replica AND every word suffix-tagged per replica, so each replica keeps
its internal duplicate/language structure while replicas share no
spans/vocab — the survivors/corpus and vocab/corpus ratios stay at the
real distribution instead of degenerating.

Per op and scale: min-of-N cold wall time (cache registry cleared each
run), per-run shuffle WRITE bytes from the status REST API, and the
plan-shape predicates each op's docstring claims (no cartesian product;
scan count). The receipt SCALING.md wants is the 10x/1x ratio table:
linear-ish shuffle growth = the claimed shape holds at scale; a
quadratic jump or an OOM = it does not.

Usage: python scripts/sf1_receipts.py [replicas] [runs] [op ...]
Prints one JSON line. Writes only under /tmp.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from vector_spark import cache  # noqa: E402
from vector_spark.dataops.curation import (  # noqa: E402
    cap_per_source,
    chunk_sequences,
    dsir_select,
    pack_shards,
    rank_buckets,
    remove_duplicate_spans,
)
from vector_spark.dataops.dedup import (  # noqa: E402
    dedup_keep_best,
    minhash_lsh_pairs,
)
from vector_spark.dataops.text import (  # noqa: E402
    bigram_lm_score,
    bpe_encode_docs,
    bpe_train,
    nb_classify,
    normalize_text,
    token_count,
)
from vector_spark.session import get_spark  # noqa: E402

UI_PORT = 40412


def total_shuffle_bytes() -> int:
    import urllib.request

    try:
        apps = json.load(
            urllib.request.urlopen(
                f"http://localhost:{UI_PORT}/api/v1/applications", timeout=10
            )
        )
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages",
                timeout=10,
            )
        )
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def replicated_docs(spark, sf_dir: str, replicas: int) -> DataFrame:
    # cache key carries the source dir, so switching SPARK_GRAFT_SF_DIR
    # can't silently reuse a prior corpus's replicas
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = f"/tmp/sf1_docs{tag}_x{replicas}.parquet"
    if not os.path.exists(path):
        base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        n = base.count()
        reps = [
            base.withColumn(
                "doc_id", (F.col("doc_id") + F.lit(i * n)).cast("long")
            ).withColumn(
                "text", F.regexp_replace(F.col("text"), r"(\S+)", rf"$1•{i}")
            )
            for i in range(replicas)
        ]
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.repartition(32).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _tokenizer_pipeline(docs):
    """The registry's six-stage flow, on the given corpus (same constants
    as docs_tokenizer_pipeline, cap scaled out of the way — replicated
    sources all have the same size so a fixed cap would just truncate)."""
    norm = docs.select(
        "doc_id", "source", "n_chars",
        normalize_text(F.col("text")).alias("text"),
    )
    kept = cap_per_source(norm, 10**9)
    capped = cache.track_persist(norm.join(kept.select("doc_id"), "doc_id"))
    cleaned = cache.track_persist(
        remove_duplicate_spans(capped, k=5, min_docs=2)
    )
    merges = bpe_train(cleaned, text_col="clean_text", n_merges=12)
    encoded = bpe_encode_docs(cleaned, merges, text_col="clean_text")
    with_src = encoded.join(capped.select("doc_id", "source"), "doc_id")
    return pack_shards(
        with_src, token_budget=200, group_col="source", tokens_col="n_tokens"
    )


OPS = {
    "nb_classify": lambda docs: nb_classify(docs),
    "bigram_lm_score": lambda docs: bigram_lm_score(docs),
    "dedup_keep_best": lambda docs: dedup_keep_best(
        docs,
        minhash_lsh_pairs(docs, num_hashes=64, bands=32, exact_verify=True),
        score_col="n_chars",
    ),
    "remove_duplicate_spans": lambda docs: remove_duplicate_spans(
        docs, k=5, min_docs=2
    ),
    # round-7 additions
    "tokenizer_pipeline": _tokenizer_pipeline,
    "dsir_select": lambda docs: dsir_select(
        docs, 100, F.col("lang") == "en"
    ),
    "ccnet_buckets": lambda docs: rank_buckets(
        bigram_lm_score(docs).select("doc_id", "avg_nll"), n_buckets=3
    ),
    "chunk_sequences": lambda docs: chunk_sequences(
        docs.select(
            "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
        ),
        seq_len=256,
    ),
    # round-8 additions
    "dedup_paragraphs": lambda docs: __import__(
        "vector_spark.dataops.dedup",
        fromlist=["remove_duplicate_paragraphs"],
    ).remove_duplicate_paragraphs(docs),
    "line_repetition": lambda docs: __import__(
        "vector_spark.dataops.curation",
        fromlist=["line_repetition_stats"],
    ).line_repetition_stats(docs),
}


def bench(fn, docs: DataFrame, runs: int) -> dict:
    best, rows, plan = None, 0, ""
    sb0 = total_shuffle_bytes()
    for _ in range(runs):
        cache.clear_caches(blocking=True)
        t0 = time.perf_counter()
        df = fn(docs)
        # force EVERY column: a bare count() lets Catalyst eliminate
        # unique-key left joins and prune the computed columns — e.g.
        # remove_duplicate_spans' whole span pipeline vanished and the
        # receipt timed a parquet count
        agg = df.agg(
            F.count(F.lit(1)),
            # pmod bounds the per-row term so the ANSI sum can't overflow
            F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_003))),
        ).collect()[0]
        rows = agg[0]
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best = dt
        plan = df._jdf.queryExecution().executedPlan().toString()
    sb1 = total_shuffle_bytes()
    per_run = (sb1 - sb0) // runs if sb0 >= 0 and sb1 >= 0 else -1
    return {
        "wall_s": round(best, 2),
        "rows": rows,
        "shuffle_mb": round(per_run / 1e6, 1) if per_run >= 0 else -1,
        "cartesian": "CartesianProduct" in plan,
    }


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "sf1_receipts",
        cpus=32,
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    big = replicated_docs(spark, sf_dir, replicas)

    out: dict = {
        "sf_dir": sf_dir,
        "replicas": replicas,
        "runs": runs,
        "loadavg_start": round(os.getloadavg()[0], 2),
        "ops": {},
    }
    for name, fn in OPS.items():
        if only and name not in only:
            continue
        r1 = bench(fn, base, runs)
        rN = bench(fn, big, runs)
        out["ops"][name] = {
            "x1": r1,
            f"x{replicas}": rN,
            "wall_ratio": round(rN["wall_s"] / max(r1["wall_s"], 1e-9), 1),
            "shuffle_ratio": (
                round(rN["shuffle_mb"] / max(r1["shuffle_mb"], 1e-9), 1)
                if r1["shuffle_mb"] > 0 and rN["shuffle_mb"] > 0
                else -1
            ),
        }
        print(f"# {name}: {out['ops'][name]}", file=sys.stderr)
    out["loadavg_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
