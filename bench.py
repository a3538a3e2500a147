"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

METHODOLOGY CHANGE (r11, "bench_method": "noop_full_eval"): timings
force FULL evaluation via `df.write.format("noop")` instead of
`df.count()`. count() lets Catalyst prune any column the count does
not need — projection-shaped queries (remap, the codec roundtrips,
syslog encode+parse) were timing little more than the scan, and even
TPC-H aggregates kept only their grouping keys (q1's sums/avgs were
never computed: 0.29 s counted vs 0.76 s real at sf0.1). Per-entry
numbers r1-r10 under-measure wherever work was prunable; r11 numbers
are the honest cost and NOT comparable 1:1 with earlier artifacts for
the affected entries (NOTES_r11 has a measured count-vs-noop table).
The canonical-pipeline events/s metrics got the same fix (their JSON
parse stage was pruned under count()).

MEASUREMENT ROBUSTNESS (r11 optimization round): this host is a
Firecracker guest on an oversubscribed hypervisor — /proc/stat steal
shows storms of 100-550 stolen ticks/s (1-5.5 full cores) lasting
minutes, inflating individual runs 2-20x with zero code change
(measured: the same query 2.3 s and 39 s back to back). Timings remain
min-over-N full-evaluation runs, N>=3 exactly as before; when the BEST
run saw nonzero steal while executing, up to 2 extra runs try for an
uncontaminated sample (_timed_min). The artifact carries the total
steal ticks observed across the bench as context.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_top_orders",
    "tpch_q5_local_volume",
    "tpch_q6_forecast_revenue",
    "tag_cardinality_limit",
    "pipeline_log_to_metric",
    "line_agg_multiline",
    "syslog_roundtrip",
    "vrl_program",
    "remap_dropped_output",
    "geoip_range_enrich",
    "summary_quantiles",
    "ddsketch_quantiles",
    "filter",
    "route_exclusive",
    "sample_keyed",
    "dedupe",
    "throttle",
    "aggregate",
    "window_context",
    "reduce_merge",
    "reduce_sessions",
    "log_to_metric",
    "remap",
    "enrich",
    "incremental_to_absolute",
    "docs_exact_dedup",
    "docs_text_stats",
    "docs_minhash_lsh",
    "docs_simhash",
    "ann_cosine_topk",
    # round-2 additions
    "vrl_program_v2",
    "otlp_logs_roundtrip",
    "memory_table_enrich",
    # round-3 additions
    "mmdb_geoip_enrich",
    "multimodal_features",
    "docs_dedup_components",
    "ann_pq_topk",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    # round-4 additions
    "vrl_emit_multi",
    "asof_join_enrich",
    "native_proto_roundtrip",
    "docs_duplicate_spans",
    "docs_redact_pii",
    "docs_bpe_train",
    # round-6 additions
    "embeddings_kmeans",
    "embeddings_semantic_dedup",
    "docs_tfidf_top_terms",
    "docs_unigram_lm",
    "docs_remove_duplicate_spans",
    "docs_source_cap",
    "docs_bpe_encode",
    "docs_nb_classify",
    "docs_bigram_lm",
    "docs_sample_exact_k",
    "docs_dedup_keep_best",
    "docs_normalize_text",
    # round-7 additions
    "docs_tokenizer_pipeline",
    "docs_dsir_select",
    "docs_chunk_sequences",
    "docs_ccnet_buckets",
    "docs_hashed_tfidf",
    "docs_text_near_dup",
    "docs_temperature_mixture",
    "multimodal_frame_sample",
    "multimodal_audio_windows",
    # round-9 additions
    "prometheus_rw_roundtrip",
    "datadog_series_v2_roundtrip",
    "datadog_trace_roundtrip",
    "influx_logs_roundtrip",
    # round-10 additions
    "vrl_codec_chain_roundtrip",
    "multimodal_image_dhash",
    "multimodal_audio_fingerprint",
    "multimodal_scene_changes",
    # round-11 additions
    "zstd_entropy_decode",
    "membership_filter_enrich",
    "codec_compress_roundtrip",
    "vrl_timezone_parse",
    "vrl_wave5_functions",
    "arrow_ipc_roundtrip",
    "docs_c4_filters",
    "streaming_window_agg",
]


LOAD_START = round(os.getloadavg()[0], 2)
STEAL_START = None  # set in main() after _steal_ticks is defined


def _steal_ticks() -> int:
    """Cumulative hypervisor CPU-steal ticks (field 8 of /proc/stat cpu
    line); 0 where unavailable. Used to flag timing runs that a noisy
    neighbor contaminated — measured on this host: storms of 100-550
    stolen ticks/s (1-5.5 cores) lasting minutes inflate individual runs
    2-20x with zero change in the code under test."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) if len(parts) > 8 else 0
    except Exception:
        return 0


def _timed_min(run, runs: int = 3, max_extra: int = 2, pre=None) -> float:
    """min-of-N timing with steal-aware retries: the base `runs`
    timings are taken as always; if the BEST run saw hypervisor CPU
    steal while it executed (contamination, not engine cost), up to
    `max_extra` further runs try for a clean sample. The metric is
    unchanged (min over >=3 full-evaluation runs) — the retries only
    make the recorded number the engine's, not the neighbor's.
    Documented in OPTIMIZATION_r11.md."""
    best, best_steal = None, 0
    attempts = 0
    while True:
        if pre is not None:
            pre()  # untimed per-run setup (e.g. cold-entry cache clear)
        s0 = _steal_ticks()
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        stolen = _steal_ticks() - s0
        attempts += 1
        if best is None or dt < best:
            best, best_steal = dt, stolen
        if attempts < runs:
            continue
        if best_steal > 50 and attempts < runs + max_extra:
            continue
        return best


def main() -> None:
    global STEAL_START
    STEAL_START = _steal_ticks()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from vector_spark.plans.queries import QUERIES
    from vector_spark.session import get_spark

    spark = get_spark("vector-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers + python workers once (the baseline's
    # lading harness likewise measures sustained throughput, not cold start)
    QUERIES["filter"].fn(spark, sf_dir).count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    # ...and the two driver-side first-touch costs the size-gated
    # iterative ops (bpe_train's merge loop) would otherwise absorb into
    # their first timing (r6 verdict "what's wrong #3", measured here:
    # first collect ~0.3s, first createDataFrame ~2.1s of one-time
    # conversion setup — session overhead, not operator cost; the
    # remaining ~3s first-run tokenize codegen is per-query and already
    # removed by min-of-3):
    spark.range(4).collect()
    spark.createDataFrame([(0, "w")], "i long, s string").count()

    # three runs per query, keep the min: the first run pays codegen/JIT
    # and absorbs host noise; min-of-3 measures the engine, not the
    # neighbor (r2→r3 lesson: min-of-2 still recorded 2-4× cold/contended
    # outliers on sub-second queries that a third run removes)
    def run_full(df) -> None:
        # noop sink: full evaluation of EVERY output column, no collect
        # transfer skew, nothing for Catalyst to prune (module docstring)
        df.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name].fn
        best = _timed_min(lambda: run_full(fn(spark, sf_dir)))
        # 3 digits: shrinks the JSON line so more receipts survive the
        # driver recorder's head-truncation window
        timings[name] = round(best, 3)
        n = fn(spark, sf_dir).count()  # rows for the receipt, untimed
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    # cold-build entries for the memoized queries (r4 verdict "what's
    # wrong #3": min-of-3 over a memoized DataFrame measures the cache,
    # not the operator). Each iteration clears the session cache registry
    # first, so the timing is the full signature-build + self-join (the
    # number a first-run user pays); the warm entries above keep
    # measuring the memoized re-serve a long-lived session gets.
    from vector_spark import clear_caches

    # r12 additions (VERDICT r11 "what's wrong" #3): cold twins for the
    # remaining entries whose headline numbers re-serve registry persists
    # created inside the build (LM count tables, hashed-tfidf tf table,
    # semantic-dedup assignment, keep-best's component persists) — the
    # warm entries keep measuring the long-lived-session re-serve; these
    # measure the first-build cost. New keys FIRST: the driver recorder
    # truncates the HEAD of the JSON line, so the newest (most
    # expendable) receipts sit nearest the head and every pre-existing
    # key keeps its distance from the cut.
    COLD = {
        "embeddings_semantic_dedup_cold": "embeddings_semantic_dedup",
        "docs_dedup_keep_best_cold": "docs_dedup_keep_best",
        "docs_unigram_lm_cold": "docs_unigram_lm",
        "docs_bigram_lm_cold": "docs_bigram_lm",
        "docs_hashed_tfidf_cold": "docs_hashed_tfidf",
        "docs_minhash_lsh_cold": "docs_minhash_lsh",
        "docs_dedup_components_cold": "docs_dedup_components",
    }
    for cold_name, name in COLD.items():
        fn = QUERIES[name].fn
        best = _timed_min(
            lambda fn=fn: run_full(fn(spark, sf_dir)),
            pre=lambda: clear_caches(blocking=True),
        )
        timings[cold_name] = round(best, 3)
        n = fn(spark, sf_dir).count()
        print(
            f"# {cold_name}: {timings[cold_name]:.3f}s ({n} rows)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    # BASELINE.md comparable: events/s through the reference's canonical
    # filter → remap(parse) → aggregate path (it reports 1e5–1e6 ev/s on
    # ~4 cores for this shape). Steady-state: second run of a warm plan.
    from vector_spark.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()

    def pipeline(src):
        # ONE definition of the canonical shape — the legacy and
        # sustained numbers must measure the same pipeline. Forced via
        # the noop sink: under count() the optimizer pruned avg(k) and
        # with it the get_json_object PARSE stage — the r1-r10 ev/s
        # numbers measured filter→window-agg only (module docstring).
        p = src.where(F.col("value") > 0).select(
            "event_id", "ts", "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
            F.col("value"),
        )
        (
            p.groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"),
                 F.avg("k").alias("ak"))
            .write.format("noop").mode("overwrite").save()
        )

    def min_of(src, runs: int) -> float:
        pipeline(src)  # warm
        return _timed_min(lambda: pipeline(src), runs=runs)

    # the un-replicated job finishes in ~0.2 s at sf0.1 — scheduler
    # noise dominates a sample that small (the r9 "-24% regression"
    # was exactly this: 371k and 536k back-to-back on an idle host).
    # min-of-7 tightens the tail for ~1 s of extra wall clock.
    events_per_sec = round(n_events / min_of(ev, 7), 1)

    # SUSTAINED throughput: at sf0.1 the 100k-row job finishes in ~0.2 s,
    # of which roughly half is fixed scheduling/codegen overhead — the
    # ev/s above underestimates steady state (the quantity the reference's
    # lading harness reports). Replicate the stream 30× via a broadcast
    # crossJoin (parse + window-agg run per replicated row, so the work is
    # real) and report the amortized rate alongside the legacy number.
    mult = 30
    # repartition the replicated stream to 2×cores: the crossJoin
    # inherits range(30)'s layout (≤30 skewed partitions), which
    # leaves cores idle — measured 390k → 860k ev/s at sf0.1 on
    # local[32]. This measures the engine across the node's cores,
    # which is what the reference's single-node numbers report.
    big = (spark.range(mult).select(F.col("id").alias("_rep"))
           .crossJoin(ev)
           .repartition(2 * spark.sparkContext.defaultParallelism))
    sustained_eps = round(n_events * mult / min_of(big, 3), 1)

    # Key order matters: the driver's recorder truncates the HEAD of this
    # line (r7-r10 artifacts' `tail` starts mid-key), so the most
    # important keys go LAST. r10's blanket reversal got this backwards —
    # it put the OLDEST headline entries nearest the tail and the newest
    # round's receipts got eaten. Correct order: cold-build receipts
    # first (oldest news), then HEADLINE in chronological-addition order
    # (newest round's entries nearest the tail), then headline scalars
    # at the very end. HEADLINE itself keeps per-round blocks appended
    # chronologically for the same reason.
    ordered_timings = {k: timings[k] for k in COLD}
    ordered_timings.update((k, timings[k]) for k in HEADLINE)
    print(
        json.dumps(
            {
                "queries": ordered_timings,
                "sf": sf_val,
                "unit": "sec",
                # r11: full-evaluation timings (noop sink) — per-entry
                # numbers are NOT 1:1 comparable with r10-and-earlier
                # count()-based artifacts (module docstring)
                "bench_method": "noop_full_eval",
                # host-noise context (r2 verdict #5: make the artifact
                # carry the evidence): 1-min loadavg before/after, plus
                # hypervisor CPU-steal ticks accumulated across the whole
                # bench (r11 opt: storms of 1-5.5 stolen cores inflate
                # runs 2-20x; _timed_min retries contaminated best runs)
                "loadavg_start": LOAD_START,
                "loadavg_end": round(os.getloadavg()[0], 2),
                "steal_ticks": _steal_ticks() - (STEAL_START or 0),
                "pipeline_n_events": n_events,
                "metric": "headline_queries_total_time",
                "value": total,
                "pipeline_events_per_sec": events_per_sec,
                "pipeline_events_per_sec_sustained": sustained_eps,
            }
        )
    )


if __name__ == "__main__":
    main()
