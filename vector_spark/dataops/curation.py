"""Corpus-curation operators for pretraining-data pipelines.

The four ops here are the standard curation stages that sit between raw
crawl and tokenizer in an LLM data pipeline (Gopher/MassiveText §A1.1,
C4, The Pile, Dolma — public papers; none of this exists in the reference,
it is part of the driver's training-data mandate):

- repetition_stats  — Gopher-style within-document repetition signals
  (top-n-gram char fraction, duplicated-n-gram fraction) used to drop
  boilerplate/spam.
- contamination_check — n-gram collision scan of the training corpus
  against a benchmark/eval set (the standard decontamination step).
- stratified_sample — deterministic per-stratum (e.g. language) sampling
  to hit a target mixture; hash-based so reruns and engines agree.
- pack_shards — greedy token-budget packing of documents into training
  shards, parallel per group.

Scale notes (100 TB): repetition is computed with explode + two-level
aggregation — the shuffle key is (doc_id, ngram), which is high-cardinality
and skew-free, and Spark's partial (map-side) aggregation collapses
within-document duplicates before the exchange. A per-document O(L²)
higher-order-function formulation was rejected: it avoids the shuffle but
degrades quadratically on long documents. Contamination broadcasts the
benchmark n-gram set (eval suites are tiny vs the corpus). Sampling is a
scan-only filter. Packing windows are partitioned by the shard group —
never a global single-task window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth multiplicative hash — portable across engines (same constant as
# operators/sample.py:consistent_hash; the DuckDB oracles reproduce it).
_KNUTH = 2654435761
_MOD = 2**31


def _words(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def _ngrams(words: Column, n: int) -> Column:
    """Word n-grams as space-joined strings; empty array when the document
    has fewer than n words. Pure Column (no UDF)."""
    if n == 1:
        return words
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_sizes: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Within-document repetition signals per Gopher §A1.1:

    - ``top{n}_frac``: characters in the single most frequent word n-gram
      as a fraction of the document's characters (ties broken by longer,
      then lexicographically larger n-gram — deterministic and portable).
    - ``dup{n}_frac``: fraction of n-gram occurrences whose n-gram occurs
      more than once in the document.

    Returns one row per document: (id, n_chars, top1_frac, dup1_frac,
    top2_frac, ...). Documents full of repeated phrases score high and are
    dropped by the downstream threshold filter.

    Plan shape: one explode per n unioned → groupBy(id, n, gram) with
    map-side partial agg → groupBy(id, n) → conditional-agg pivot to one
    row per doc. Two shuffles total, both on high-cardinality skew-free
    keys.
    """
    t = F.col(text_col)
    base = df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        _words(t).alias("w"),
    )
    per_n = None
    for n in ngram_sizes:
        e = base.select(
            id_col,
            "n_chars",
            F.lit(n).alias("n"),
            F.explode(_ngrams(F.col("w"), n)).alias("gram"),
        )
        per_n = e if per_n is None else per_n.unionByName(e)

    counted = per_n.groupBy(id_col, "n_chars", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # top gram per (doc, n) via max(struct): (cnt, len, gram) lexicographic
    agg = counted.groupBy(id_col, "n_chars", "n").agg(
        F.max(
            F.struct(
                F.col("cnt"), F.length("gram").alias("glen"), F.col("gram")
            )
        ).alias("top"),
        F.sum("cnt").alias("total"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("dup"),
    )
    frac = lambda c: F.round(c, 6)  # noqa: E731
    per_doc = agg.select(
        F.col(id_col),
        "n_chars",
        "n",
        frac(
            (F.col("top.cnt") * F.col("top.glen")).cast("double")
            / F.col("n_chars")
        ).alias("top_frac"),
        frac(F.col("dup").cast("double") / F.col("total")).alias("dup_frac"),
    )
    out = per_doc.groupBy(id_col).agg(
        F.first("n_chars").alias("n_chars"),
        *[
            F.max(F.when(F.col("n") == n, F.col(c))).alias(f"{c[:3]}{n}_frac")
            for n in ngram_sizes
            for c in ("top_frac", "dup_frac")
        ],
    )
    return out


def contamination_check(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any word
    n-gram with the benchmark/eval set (the standard 13-gram check from
    GPT-3 appendix C scaled to the corpus's document length).

    Returns (id, n_collisions) for contaminated documents only, where
    n_collisions counts DISTINCT colliding n-grams. The benchmark n-gram
    set is broadcast — eval suites are megabytes against a 100 TB corpus —
    so the scan side never shuffles.
    """
    bench_grams = (
        benchmark.select(
            F.explode(_ngrams(_words(F.col(text_col)), n)).alias("gram")
        )
        .distinct()
    )
    doc_grams = df.select(
        F.col(id_col),
        F.explode_outer(_ngrams(_words(F.col(text_col)), n)).alias("gram"),
    ).dropDuplicates([id_col, "gram"])
    hits = doc_grams.join(F.broadcast(bench_grams), "gram")
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_collisions")
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic mixture sampling: keep a per-stratum fraction of
    documents (e.g. per-language rates to hit a target training mixture).
    The keep decision is a pure hash of the id — rerun-stable, partition-
    independent, and reproducible in any engine (Knuth multiplicative
    hash, same scheme as the sample transform). Scan-only: no shuffle."""
    rate = None
    for k, v in sorted(rates.items()):
        cond = F.col(strata_col) == k
        rate = F.when(cond, v) if rate is None else rate.when(cond, v)
    rate = (rate.otherwise(default_rate) if rate is not None
            else F.lit(default_rate))
    h = F.pmod(F.col(id_col).cast("long") * _KNUTH, F.lit(_MOD))
    return df.where(h <= (rate * _MOD).cast("long"))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    boundaries: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Deterministic train/val/test assignment by content-stable hash —
    the canonical held-out-split op for a training corpus: a document's
    split never changes across reruns, engines, partitionings, or corpus
    growth (no global sort, no RNG state).

    The assignment key is `md5(id)` compared lexicographically against
    hex boundaries (fixed-width lowercase hex sorts identically to its
    numeric value in every engine, so a DuckDB/Trino/Spark pipeline
    agrees byte-for-byte). Default boundaries: train < 'fa' (250/256),
    val < 'fd' (3/256), else test. Scan-only: the split column is one
    codegen'd expression, no shuffle."""
    boundaries = boundaries or [("train", "fa"), ("val", "fd")]
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    expr = None
    for name, upper in boundaries:
        cond = h < upper
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr.otherwise("test"))


def pack_shards(
    df: DataFrame,
    token_budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy token-budget packing: assign documents to training shards of
    ~token_budget tokens each, within each group (source/dump/language —
    real pipelines shard per input bucket so packing parallelizes).

    Deterministic: documents pack in id order within their group; a
    document's shard is the budget bucket its starting token offset falls
    in. The window is PARTITIONED by the group — this never degenerates to
    a global single-task sort (cf. tests/test_plans.py invariant).
    """
    from vector_spark.dataops.text import token_count

    toks = df.select(
        F.col(id_col),
        F.col(group_col),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return toks.select(
        id_col,
        group_col,
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / token_budget).alias("shard"),
        (cum - F.col("n_tokens")).alias("start_offset"),
    )


def duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated passages: every k-word span that occurs in
    >= min_docs DISTINCT documents, with its document frequency — the
    n-gram-window approximation of exact substring dedup (Lee et al.
    2021, "Deduplicating Training Data Makes Language Models Better";
    the suffix-array formulation finds arbitrary-length repeats, the
    fixed-k window finds every repeat of length >= k at ~1/k the cost
    and is the standard first pass at corpus scale).

    Scale shape: explode spans (narrow), then count over
    ``xxhash64(span)`` so the ONLY corpus-wide shuffle carries 16-byte
    (hash, doc) rows with map-side partial dedup — the per-hash
    ``n_docs`` it yields is already EXACT unless two distinct surviving
    spans collide in 64 bits (~1e-6 even at 100 TB span cardinality).
    Span text is recovered from a second narrow explode semi-joined
    against the (tiny, boilerplate-bounded) survivor hash set and
    reduced to DISTINCT (hash, span) pairs — map-side combine collapses
    every partition to at most one row per surviving pair, so the
    string-keyed exchange moves ~|survivors| rows, not occurrences.
    Collisions are detected on that distinct table (a hash mapping to
    >1 span); clean hashes — in practice all of them — take pass-1's
    count directly, and only colliding hashes pay an exact text-keyed
    recount (a bounded driver-side existence check gates that third
    scan, so the expected plan never re-reads the corpus for it).

    The span explode is compute-heavy (split + per-position concat) but
    narrow, so its parallelism is capped by the SCAN's split count. A
    small corpus in one single-row-group file scans as ONE task and the
    whole explode serializes onto one core (measured: 3.0 s → 0.58 s on
    local[32] at sf0.1 after splitting); at 100 TB the input is
    thousands of splits and the guard below is a no-op. When the scan
    under-splits relative to cluster parallelism, round-robin
    repartition the (raw, pre-explode — so the exchange moves each doc
    once, not k× spans) documents first.
    Returns (span, n_docs) with n_docs >= min_docs."""
    from .. import cache

    target = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)
    spans = docs.select(
        F.col(id_col).alias("_doc"),
        F.explode(_ngrams(_words(F.col(text_col)), k)).alias("span"),
    )
    # pass 1: EXACT doc-frequency per span hash — the one corpus-wide
    # shuffle, 16 bytes/row
    # persisted: referenced by both the text-recovery semi-join and the
    # final count join — without the persist the corpus shuffle would
    # re-execute for each. Survivor-sized (boilerplate-bounded), so the
    # cache cost is rows-that-matter, not the corpus.
    pass1 = cache.track_persist(
        spans.select("_doc", F.xxhash64("span").alias("_h"))
        .groupBy("_h")
        .agg(F.count_distinct("_doc").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )
    # pass 2: recover span text for survivors only. The semi-join's
    # build side is the survivor hash set (AQE broadcasts it when
    # small, shuffle-join fallback for pathological corpora); distinct
    # (hash, span) collapses map-side, so the exchange here is
    # survivor-sized, not occurrence-sized.
    pairs = cache.track_persist(
        spans.select(F.xxhash64("span").alias("_h"), "span")
        .join(pass1.select("_h"), "_h", "leftsemi")
        .dropDuplicates(["_h", "span"])
    )
    from pyspark.sql.window import Window

    tagged = pairs.withColumn(
        "_nspans", F.count("*").over(Window.partitionBy("_h"))
    )
    clean = (
        tagged.where(F.col("_nspans") == 1)
        .join(pass1, "_h")
        .select("span", "n_docs")
    )
    colliders = tagged.where(F.col("_nspans") > 1).select("_h").distinct()
    # bounded control-flow check on the aggregated (tiny) table: the
    # exact-recount corpus re-scan only enters the plan when a 64-bit
    # collision actually occurred
    if colliders.isEmpty():
        return clean
    recount = (
        spans.select("_doc", F.xxhash64("span").alias("_h"), "span")
        .join(F.broadcast(colliders), "_h", "leftsemi")
        .groupBy("span")
        .agg(F.count_distinct("_doc").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )
    return clean.unionByName(recount)
