"""Corpus-curation operators for pretraining-data pipelines.

The ops here are the curation stages that sit between raw crawl and
tokenizer in an LLM data pipeline (Gopher/MassiveText §A1.1, C4, The
Pile, Dolma, RefinedWeb, CCNet, Lee et al. 2021, Xie et al. 2023 —
public papers; none of this exists in the reference, it is part of the
driver's training-data mandate):

- repetition_stats  — Gopher-style within-document repetition signals
  (top-n-gram char fraction, duplicated-n-gram fraction) used to drop
  boilerplate/spam.
- contamination_check — n-gram collision scan of the training corpus
  against a benchmark/eval set (the standard decontamination step).
- stratified_sample / sample_exact_k / hash_split — deterministic
  mixture sampling, exact-k per-group eval subsets, content-stable
  train/val/test assignment; hash-based so reruns and engines agree.
- duplicate_spans / remove_duplicate_spans — cross-document duplicated
  k-word passages: find them, then rewrite the corpus keeping only the
  canonical occurrence (Lee et al. §4).
- cap_per_source — RefinedWeb/Gopher per-domain caps.
- dsir_select — DSIR hashed-ngram importance selection toward a target
  domain (Xie et al. 2023).
- rank_buckets — CCNet head/middle/tail quality bucketing by LM rank.
- pack_shards / chunk_sequences — token-budget shard packing and
  GPT-style concat-and-chunk fixed-length sequence manifests.

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


def temperature_mixture(
    df: DataFrame,
    alpha: float = 0.7,
    target_frac: float = 0.5,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based mixture sampling (the multilingual-training
    standard, Arivazhagan et al. 2019): per-stratum keep rates are
    DERIVED from the data so the kept mix follows n_s^alpha — alpha=1
    preserves the natural distribution, alpha→0 flattens it, and
    target_frac scales the total kept mass. rate_s =
    min(1, target_frac · N · (n_s^alpha / Σ n^alpha) / n_s), applied
    with the same Knuth-hash keep decision as :func:`stratified_sample`
    (rerun-stable, partition-independent, engine-replayable). Rates
    round to 9 decimals before the hash threshold so engines whose
    pow() differs in the last ulp cannot flip a boundary row. Returns
    kept rows (id, stratum, keep_rate).

    Scale shape: one S-row count aggregate, rates broadcast back, keep
    decision rides the scan — no corpus shuffle anywhere."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    # rename before the rollup: tot shares counts' lineage, and the
    # crossJoin back would otherwise make `_n` ambiguous (self-join)
    tot = counts.select(F.col("_n").alias("_cn")).agg(
        F.sum("_cn").alias("_N"),
        F.sum(F.pow("_cn", F.lit(alpha))).alias("_W"),
    )
    rates = counts.alias("c").crossJoin(
        F.broadcast(tot.alias("t"))
    ).select(
        F.col(f"c.{strata_col}").alias(strata_col),
        F.round(
            F.least(
                F.lit(1.0),
                F.pow(F.col("c._n"), F.lit(alpha)) / F.col("t._W")
                * F.lit(target_frac) * F.col("t._N") / F.col("c._n"),
            ),
            9,
        ).alias("_rate"),
    )
    h = F.pmod(F.col(id_col).cast("long") * _KNUTH, F.lit(_MOD))
    return (
        df.join(F.broadcast(rates), strata_col)
        .where(h <= (F.col("_rate") * _MOD).cast("long"))
        .select(
            F.col(id_col),
            F.col(strata_col),
            F.round(F.col("_rate"), 6).alias("keep_rate"),
        )
    )


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
    tokens_col: str | None = None,
) -> DataFrame:
    """Greedy token-budget packing: assign documents to training shards of
    ~token_budget tokens each, within each group (source/dump/language —
    real pipelines shard per input bucket so packing parallelizes).

    Deterministic: documents pack in id order within their group; a
    document's shard is the budget bucket its starting token offset falls
    in. The window is PARTITIONED by the group — this never degenerates to
    a global single-task sort (cf. tests/test_plans.py invariant).

    With *tokens_col*, packs on a precomputed per-document token count
    (e.g. the REAL tokenizer's output from bpe_encode_docs) instead of
    the whitespace token_count of *text_col* — the tokenizer-pipeline
    composition path.
    """
    from vector_spark.dataops.text import token_count

    toks = df.select(
        F.col(id_col),
        F.col(group_col),
        (
            F.col(tokens_col) if tokens_col is not None
            else token_count(F.col(text_col))
        ).alias("n_tokens"),
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
    strategy: str = "auto",
) -> DataFrame:
    """Cross-document repeated passages: every k-word span that occurs in
    >= min_docs DISTINCT documents, with its document frequency — the
    n-gram-window approximation of exact substring dedup (Lee et al.
    2021, "Deduplicating Training Data Makes Language Models Better";
    the suffix-array formulation finds arbitrary-length repeats, the
    fixed-k window finds every repeat of length >= k at ~1/k the cost
    and is the standard first pass at corpus scale).

    Two exact strategies, picked by MEASUREMENT, not intuition
    (scripts/ab_duplicate_spans.py; sf1-scale = sf0.1 x 10 suffix-tagged
    replicas, min-of-3 cold, local[32]):

    - ``"string"`` — ONE explode, ONE exchange keyed on the span string
      with map-side (span, doc) dedup. 3.2 s / 129.5 MB shuffled.
    - ``"hash"`` — ONE explode, ONE corpus-wide exchange keyed on
      ``xxhash64(span)`` carrying fixed-width (hash, doc, witness, rep)
      rows; span text recovered by re-exploding only each surviving
      hash's representative document (~0.5% of the corpus); collisions
      detected EXACTLY via a second hash witness (min==max over
      ``xxhash64(span, 1)``; a silent miss needs a simultaneous 2-hash
      collision, P ~ 2^-128) and repaired by a gated corpus recount
      that never runs in practice. 4.6 s / 140.4 MB shuffled.
    - (the round-5 two-explode hash shape measured 6.5 s / 71.9 MB —
      fewest bytes but it re-scans and re-explodes the whole corpus,
      doubling CPU; retired.)

    Why string-keyed wins at k=5 — and when it stops winning: shuffle
    compression. Short English spans compress to near hash width, so
    the hash shape's byte saving evaporates (129.5 vs 140.4 MB —
    LARGER, because two 8-byte hashes + witness + rep doc are
    incompressible entropy) while its text-recovery pass still costs
    joins. ``"auto"`` therefore picks ``"string"`` for k <= 12 and
    ``"hash"`` beyond, where span keys grow linearly (a 50-word span is
    ~300 B/row pre-compression) but the hash row stays 40 B. Both
    strategies return identical rows (the A/B asserts it).

    The span explode is compute-heavy (split + per-position concat) but
    narrow, so its parallelism is capped by the SCAN's split count. A
    small corpus in one single-row-group file scans as ONE task and the
    whole explode serializes onto one core (this under-split, not the
    shuffle key, was the real r5 8.3 s regression); at 100 TB the input
    is thousands of splits and the guard below is a no-op. When the
    scan under-splits relative to cluster parallelism, round-robin
    repartition the (raw, pre-explode — so the exchange moves each doc
    once, not k x spans) documents first.
    Returns (span, n_docs) with n_docs >= min_docs."""
    if strategy == "auto":
        strategy = "string" if k <= 12 else "hash"
    target = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)
    spans = docs.select(
        F.col(id_col).alias("_doc"),
        F.explode(_ngrams(_words(F.col(text_col)), k)).alias("span"),
    )
    if strategy == "string":
        # one exchange, keyed on span, (span, doc) dedup map-side
        return (
            spans.groupBy("span")
            .agg(F.count_distinct("_doc").alias("n_docs"))
            .where(F.col("n_docs") >= min_docs)
        )
    return _duplicate_spans_hashed(docs, spans, text_col, id_col, k, min_docs)


def _duplicate_spans_hashed(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    min_docs: int,
) -> DataFrame:
    """The hash-keyed arm of :func:`duplicate_spans` (see its docstring
    for the full design + receipts). Single corpus explode; fixed-width
    corpus shuffle; witness-hash collision detection; representative-doc
    text recovery."""
    from .. import cache

    hashed = spans.select(
        F.xxhash64("span").alias("_h"),
        "_doc",
        F.xxhash64("span", F.lit(1)).alias("_h2"),
        # separate attribute for the representative-doc min: Catalyst
        # 4.1 miscompiles count_distinct(x) mixed with min(x) on the
        # SAME attribute under exceptAll reuse (ATTRIBUTE_NOT_FOUND)
        F.col("_doc").alias("_doc_rep"),
    )
    # the one corpus-wide shuffle: partial (hash, doc) dedup map-side,
    # exchange keyed on _h, fixed-width rows. count_distinct is exact;
    # the witness min/max and representative doc ride the same exchange.
    # Persisted: referenced by the collision check, the recovery join
    # and the final count join — survivor-sized after the filter.
    survivors = cache.track_persist(
        hashed.groupBy("_h")
        .agg(
            F.count_distinct("_doc").alias("n_docs"),
            F.min("_h2").alias("_w_lo"),
            F.max("_h2").alias("_w_hi"),
            F.min("_doc_rep").alias("_rep_doc"),
        )
        .where(F.col("n_docs") >= min_docs)
    )
    clean = survivors.where(F.col("_w_lo") == F.col("_w_hi"))
    # text recovery: explode ONLY the representative documents. rep ids
    # are bounded by the survivor count (shared across boilerplate), the
    # semi-joins broadcast under AQE, and dropDuplicates(_h) is
    # survivor-sized with a hash key.
    rep_ids = clean.select(F.col("_rep_doc").alias(id_col)).distinct()
    rec_spans = (
        docs.join(rep_ids, id_col, "leftsemi")
        .select(F.explode(_ngrams(_words(F.col(text_col)), k)).alias("span"))
        .select(F.xxhash64("span").alias("_h"), "span")
        .join(clean.select("_h"), "_h", "leftsemi")
        .dropDuplicates(["_h"])
    )
    out_clean = (
        rec_spans.join(clean.select("_h", "n_docs"), "_h")
        .select("span", "n_docs")
    )
    colliders = survivors.where(F.col("_w_lo") != F.col("_w_hi")).select("_h")
    # bounded control-flow check on the aggregated (tiny) table: the
    # exact-recount corpus re-scan only enters the plan when a 64-bit
    # collision actually occurred
    if colliders.isEmpty():
        return out_clean
    recount = (
        spans.select("_doc", F.xxhash64("span").alias("_h"), "span")
        .join(F.broadcast(colliders), "_h", "leftsemi")
        .groupBy("span")
        .agg(F.count_distinct("_doc").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )
    return out_clean.unionByName(recount)


def _removed_occurrences_string(spans: DataFrame, min_docs: int) -> DataFrame:
    """(doc, pos) of every non-canonical duplicated-span occurrence,
    string-keyed (see :func:`remove_duplicate_spans` for the measured
    strategy choice). Two-level aggregation: (span, doc) -> min pos is a
    plain hash aggregate with map-side combine; the span-level count +
    lexicographic-min canonical key then runs over the deduplicated
    rows (the one-level count_distinct/struct-min form compiled to an
    Expand + three SortAggregates with two sorted exchanges)."""
    per_doc = spans.groupBy("span", "_doc").agg(F.min("pos").alias("_minpos"))
    survivors = (
        per_doc.groupBy("span")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(F.struct(F.col("_doc"), F.col("_minpos"))).alias("first"),
        )
        .where(F.col("n_docs") >= min_docs)
        .select(
            "span",
            F.col("first._doc").alias("_fdoc"),
            F.col("first._minpos").alias("_fpos"),
        )
    )
    return (
        spans.join(survivors, "span")
        .where(
            ~((F.col("_doc") == F.col("_fdoc")) & (F.col("pos") == F.col("_fpos")))
        )
        .select("_doc", "pos")
    )


def _removed_occurrences_hashed(spans: DataFrame, min_docs: int) -> DataFrame:
    """(doc, pos) of every non-canonical duplicated-span occurrence,
    xxhash64-proxy-keyed with exact witness-hash collision repair (see
    :func:`remove_duplicate_spans` for the strategy choice + collision
    analysis). Span text is dropped before any exchange; the recount
    arm is in-plan and AQE-deleted at runtime while no collision
    exists."""
    hspans = spans.select(
        "_doc",
        "pos",
        F.xxhash64("span").alias("_h"),
        F.xxhash64("span", F.lit(1)).alias("_h2"),
    )
    per_doc = hspans.groupBy("_h", "_doc").agg(
        F.min("pos").alias("_minpos"),
        F.min("_h2").alias("_wlo"),
        F.max("_h2").alias("_whi"),
    )
    survivors = (
        per_doc.groupBy("_h")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(F.struct(F.col("_doc"), F.col("_minpos"))).alias("first"),
            F.min("_wlo").alias("_lo"),
            F.max("_whi").alias("_hi"),
        )
        .where(F.col("n_docs") >= min_docs)
    )
    # clean groups (witness agrees): exactly one distinct span each, so
    # hash-keyed removal decisions are the text-keyed ones
    clean = survivors.where(F.col("_lo") == F.col("_hi")).select(
        "_h",
        F.col("first._doc").alias("_fdoc"),
        F.col("first._minpos").alias("_fpos"),
    )
    removed = (
        hspans.select("_doc", "pos", "_h")
        .join(clean, "_h")
        .where(
            ~((F.col("_doc") == F.col("_fdoc")) & (F.col("pos") == F.col("_fpos")))
        )
        .select("_doc", "pos")
    )
    # collision-repair arm, IN-PLAN: colliding hash groups re-resolve
    # with exact text keys over ONLY the rows whose hash matched. The
    # broadcast of `colliders` reuses the survivor aggregation's
    # exchange (ReusedExchange) and, when empty, AQE's empty-relation
    # propagation deletes both recount scans at runtime.
    colliders = survivors.where(F.col("_lo") != F.col("_hi")).select("_h")
    cspans = spans.join(
        F.broadcast(colliders),
        F.xxhash64("span") == F.col("_h"),
        "leftsemi",
    )
    cper_doc = cspans.groupBy("span", "_doc").agg(
        F.min("pos").alias("_minpos")
    )
    csurv = (
        cper_doc.groupBy("span")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(F.struct(F.col("_doc"), F.col("_minpos"))).alias("first"),
        )
        .where(F.col("n_docs") >= min_docs)
        .select(
            "span",
            F.col("first._doc").alias("_fdoc"),
            F.col("first._minpos").alias("_fpos"),
        )
    )
    crem = (
        cspans.join(csurv, "span")
        .where(
            ~((F.col("_doc") == F.col("_fdoc")) & (F.col("pos") == F.col("_fpos")))
        )
        .select("_doc", "pos")
    )
    return removed.unionByName(crem)


def remove_duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_docs: int = 2,
    strategy: str = "auto",
) -> DataFrame:
    """REWRITE the corpus with cross-document duplicate spans removed —
    the removal side of :func:`duplicate_spans` (Lee et al. 2021 §4:
    after finding duplicated passages, all but one occurrence are cut
    from the training set). Contract, fully deterministic:

    - a k-word span duplicated across >= min_docs distinct docs keeps
      ONLY its canonical occurrence — the minimum (doc_id, position) —
      and every other occurrence's word positions [pos, pos+k-1] are
      dropped (overlapping removals union);
    - output text is the surviving words joined by single spaces after
      the same lowercase/trim normalization the span scan uses, so a
      document with nothing removed comes back normalized, not verbatim.

    Scale shape: one span-explode scan feeding a two-level aggregation
    ((key, doc) -> min pos, map-side combined, then key-level count +
    lexicographic-min canonical occurrence — hash aggregates, no
    Expand); the survivor table joins back onto a second span scan to
    mark removed occurrences — with NO broadcast hint: survivor
    cardinality is corpus-dependent (Lee et al. found duplicate text at
    corpus-fraction scale), so AQE broadcasts it when it measures small
    and sort-merges otherwise; covered positions aggregate per doc
    (duplicated-volume-sized shuffle); the rewrite is a pure-Column
    projection over the original docs (kept positions via ONE
    array_except) — the corpus text never enters a shuffle.

    Two exact strategies for the AGGREGATION/JOIN KEY, picked by
    MEASUREMENT exactly like :func:`duplicate_spans`'s
    (scripts/ab_remove_dup_spans.py; sf0.1 x 10 suffix-tagged replicas,
    min-of-4 cold, local[32], shuffle bytes from the status REST API):

    - ``"string"`` — keys are the raw span text. At k=5: 12.16 s /
      164.7 MB shuffled (and 16.25 s / 250.4 MB under forced
      sort-merge).
    - ``"hash"`` — keys are ``xxhash64(span)`` proxies (the removal
      output never needs span text back, so unlike duplicate_spans
      there is NO recovery pass), with an independent witness
      ``xxhash64(span, 1)`` riding both aggregation levels; a group
      whose witness min != max holds >= 2 distinct spans and diverts
      to an exact text-keyed recount arm over only the rows matching
      the collider hashes. The recount arm is IN-PLAN behind a
      broadcast of the collider set: with zero colliders AQE's
      empty-relation propagation deletes both its scans at runtime
      (verified: the executed adaptive plan has no Union and 2 parquet
      scans — plans/r12/docs_remove_duplicate_spans_hash_final_adaptive.txt).
      At k=5: 19.86 s / 305.7 MB — the hash arm LOSES at short k for
      the same measured reason the duplicate_spans hash arm did:
      shuffle compression shrinks short English span strings to near
      hash width while the two 64-bit hashes + witness min/max are
      incompressible entropy, and every occurrence pays two xxhash64
      evaluations. At k=50 (span strings ~300 B/row pre-compression vs
      the fixed 28 B proxy) the BYTES verdict flips decisively —
      hash 90.8 MB vs string 211.6 MB under AQE defaults, 103.7 vs
      311.4 MB under forced sort-merge (3.0x) — while LOCAL wall-clock
      still favors string (6.26 vs 13.48 s AQE-default, where tiny
      wide-k survivor sets make everything broadcast-cheap and the
      hash plan's extra query stages dominate; 11.34 vs 12.69 s forced
      SMJ — within 12%). The ``"auto"`` threshold k<=12 -> string
      mirrors duplicate_spans': on a CLUSTER the wide-k regime is
      sort-merge territory with the shuffle crossing NICs (guide
      §2.2-2.3), where 3x fewer bytes buys ~3x stage time against a
      12% CPU delta; on local[32] the network is free, so the local
      bench cannot show that win and the k=5 registry entry stays on
      the measured-faster string path either way.

    Collision analysis for the hash arm (exactness): expected colliding
    64-bit groups at n distinct spans ~ n^2/2^65 — zero until ~2^32
    spans, ~3e6 repaired groups at 100 TB span counts (~1e13), each
    repaired EXACTLY by the recount arm (one bounded extra pass whose
    shuffle holds only collider-matched rows); a silent miss needs a
    simultaneous collision in both independent hashes, P ~ n^2/2^129
    (~3e-13 at 1e13 spans). Sub-min_docs merged groups need no repair
    (a merged group's doc count upper-bounds every constituent
    span's). Both strategies return identical rows (asserted by the
    A/B receipt and the randomized golden test). Returns
    (doc_id, clean_text)."""
    if strategy == "auto":
        strategy = "string" if k <= 12 else "hash"
    target = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)
    spans = docs.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(_ngrams(_words(F.col(text_col)), k)).alias(
            "pos", "span"
        ),
    )
    if strategy == "string":
        removed = _removed_occurrences_string(spans, min_docs)
    else:
        removed = _removed_occurrences_hashed(spans, min_docs)
    covered = (
        removed.select(
            "_doc",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("p"),
        )
        .groupBy("_doc")
        .agg(F.collect_set("p").alias("_cov"))
    )
    arr = _words(F.col(text_col))
    cov = F.coalesce(F.col("_cov"), F.array().cast("array<int>"))
    # kept positions in ONE linear array_except (hash-set lookup) instead
    # of an array_contains scan per word (quadratic when most of a long
    # doc is covered); sequence order survives array_except, so the
    # surviving words stay in document order. split() never returns an
    # empty array for non-null text, so sequence(0, size-1) is ascending.
    kept = F.array_except(F.sequence(F.lit(0), F.size(arr) - 1), cov)
    return (
        docs.join(
            covered, docs[id_col] == covered["_doc"], "left"
        )
        .select(
            F.col(id_col),
            F.array_join(
                F.transform(kept, lambda p: F.get(arr, p)), " "
            ).alias("clean_text"),
        )
    )


def cap_per_source(
    docs: DataFrame,
    n: int,
    source_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain document cap (the RefinedWeb / Gopher curation rule:
    no single domain may dominate the training mix): keep at most *n*
    documents per source, preferring larger ``order_col`` with id as the
    deterministic tiebreak. Returns the kept docs (id, source, order).

    Scale shape: a global row_number window would sort EVERY source's
    documents; instead a counts aggregate (one map-side-combined
    shuffle, K rows out) finds the sources OVER the cap — a tiny set by
    the operator's purpose — and only their documents pay the ranking
    shuffle; everything else passes through scan-only via a broadcast
    anti-join. Skew note: the ranked side is per-hot-source by
    construction, and a single pathological source's ranking is ONE
    task holding that source's rows — AQE cannot help here (it splits
    skewed *join* partitions; a row_number window partition must stay
    whole). The exposure is bounded because only over-cap sources are
    ranked at all; if a single source can exceed task memory, cap it
    with the hash-threshold pre-filter pattern in
    :func:`sample_exact_k` (keep-largest needs an order-statistic
    threshold rather than a rate, e.g. an approx quantile of
    ``order_col`` within the hot source)."""
    from pyspark.sql.window import Window

    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    over = counts.where(F.col("_n") > n).select(
        F.col(source_col).alias("_src")
    )
    # null-safe join keys: groupBy and the window treat NULL source as one
    # group, so the semi/anti joins must too — a plain equi-join never
    # matches NULL and would let an over-cap NULL-source group bypass the
    # cap entirely
    on = F.col(source_col).eqNullSafe(F.col("_src"))
    under_docs = docs.join(F.broadcast(over), on, "left_anti")
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.col(order_col).desc(), F.col(id_col).asc())
    )
    capped = (
        docs.join(F.broadcast(over), on, "leftsemi")
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n)
        .drop("_rk")
    )
    cols = [id_col, source_col, order_col]
    return under_docs.select(*cols).unionByName(capped.select(*cols))


def chunk_sequences(
    df: DataFrame,
    seq_len: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Concat-and-chunk: the OTHER packing mode pretraining pipelines use
    (GPT-style): within each group, concatenate the documents' token
    streams in id order and cut fixed *seq_len* training sequences; a
    document crossing a boundary lands in every sequence it overlaps.
    Returns one row per (document × overlapped sequence):
    (id, group, seq_id, tok_start, tok_end) where [tok_start, tok_end)
    is the slot the doc's tokens occupy WITHIN that sequence (0-based,
    end exclusive) — the manifest a sequence-builder assembles from.

    Scale shape: one cumulative window per group (partitioned — never a
    global sort) gives each doc its stream offset; the per-doc explode
    emits exactly ceil(span/seq_len)+overlap rows (bounded by the doc's
    own length), and everything stays in the scan stage after the
    window. Zero-token docs emit nothing (no token mass to place)."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(tokens_col).over(w) - F.col(tokens_col)).alias("_start")
    base = df.select(
        F.col(id_col), F.col(group_col), F.col(tokens_col), start
    ).where(F.col(tokens_col) > 0)
    first_seq = F.floor(F.col("_start") / seq_len)
    last_seq = F.floor((F.col("_start") + F.col(tokens_col) - 1) / seq_len)
    return base.select(
        id_col,
        group_col,
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
        "_start",
        tokens_col,
    ).select(
        id_col,
        group_col,
        "seq_id",
        F.greatest(
            F.col("_start") - F.col("seq_id") * seq_len, F.lit(0)
        ).alias("tok_start"),
        F.least(
            F.col("_start") + F.col(tokens_col) - F.col("seq_id") * seq_len,
            F.lit(seq_len),
        ).alias("tok_end"),
    )


def _ranked_parts(
    df: DataFrame, score_col: str, id_col: str
) -> DataFrame:
    """Range-partition (score, id) into globally ordered partitions and
    stamp each row with its partition id and a within-partition
    monotonically increasing id (evaluated after the in-partition sort,
    so it follows sorted order). Shared by :func:`_exact_rank_rows`;
    factored out so plan tests can assert its shape."""
    spark = df.sparkSession
    n_parts = max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    return (
        df.select(score_col, id_col)
        .repartitionByRange(n_parts, F.col(score_col), F.col(id_col))
        .sortWithinPartitions(F.col(score_col), F.col(id_col))
        .select(
            score_col,
            id_col,
            F.spark_partition_id().alias("_p"),
            F.monotonically_increasing_id().alias("_mid"),
        )
    )


def _exact_rank_rows(
    df: DataFrame, score_col: str, id_col: str, ranks
) -> dict[int, tuple]:
    """Exact distributed selection: the (score, id) pair at each 1-based
    rank in *ranks* under ascending (score, id) order, computed WITHOUT
    ever funneling O(n) rows through one task or the driver.

    *ranks* is a list of ranks, or a callable n -> list of ranks: the
    callable form derives the ranks from the total row count n that the
    per-partition address aggregate already computes, which lets callers
    that need count-dependent ranks (rank_buckets' n·b/k cuts) skip
    their own df.count() — one fewer full pass over the scored input.
    With a callable the return is (by_rank, n) instead of by_rank.

    Plan: one range shuffle puts partitions in global key order; a
    P-row aggregate (count, min/max mid per partition) comes back to the
    driver to turn each global rank into a (partition, local offset)
    address; one filter scan over the cached two-column projection then
    extracts exactly len(ranks) rows. Contrast with ``orderBy.limit(k)``:
    its merge funnels k rows into a single partition, and here k is a
    constant fraction of the corpus.

    The local offset arithmetic relies on monotonically_increasing_id
    being CONSECUTIVE within a partition (true of Spark's documented
    partition-id-in-upper-bits layout); the P-row aggregate verifies
    max−min+1 == count per partition and raises if the engine ever
    breaks that, rather than silently mis-ranking."""
    from vector_spark import cache

    parts = cache.track_persist(_ranked_parts(df, score_col, id_col))
    stats = (
        parts.groupBy("_p")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.min("_mid").alias("_lo"),
            F.max("_mid").alias("_hi"),
        )
        .collect()
    )
    for r in stats:
        if r["_hi"] - r["_lo"] + 1 != r["_c"]:
            raise RuntimeError(
                "monotonically_increasing_id not consecutive within "
                f"partition {r['_p']}; exact-rank addressing unsafe"
            )
    derive = callable(ranks)
    n_total = sum(r["_c"] for r in stats)
    if derive:
        ranks = ranks(n_total)
    wanted = []  # (pid, mid) for each rank
    by_rank: dict[int, tuple] = {}
    cum = 0
    for r in sorted(stats, key=lambda r: r["_p"]):
        for k in ranks:
            if cum < k <= cum + r["_c"]:
                wanted.append((k, r["_p"], r["_lo"] + (k - cum - 1)))
        cum += r["_c"]
    if not wanted:
        return (by_rank, n_total) if derive else by_rank
    cond = None
    for _k, p, m in wanted:
        c = (F.col("_p") == p) & (F.col("_mid") == m)
        cond = c if cond is None else cond | c
    hit = {
        (row["_p"], row["_mid"]): (row[score_col], row[id_col])
        for row in parts.where(cond).collect()
    }
    for k, p, m in wanted:
        by_rank[k] = hit[(p, m)]
    return (by_rank, n_total) if derive else by_rank


def rank_buckets(
    df: DataFrame,
    n_buckets: int = 3,
    score_col: str = "avg_nll",
    id_col: str = "doc_id",
    labels: list[str] | None = None,
) -> DataFrame:
    """CCNet-style quality bucketing: split documents into n rank-equal
    buckets by a score (CCNet buckets the corpus into head/middle/tail
    by LM perplexity and trains on the head). Deterministic: ranking is
    by (score, id), bucket b holds ranks (floor(n·b/k), floor(n·(b+1)/k)].

    Scale shape: NEVER a global row_number window (one task sorting the
    corpus), and — since r8 — never an ``orderBy.limit(n·b/k)`` funnel
    either (the limit's merge pushes a third of the corpus through one
    task). The k−1 boundary pairs come from :func:`_exact_rank_rows`:
    one range shuffle, a P-row per-partition count aggregate, and a
    filter scan that extracts exactly k−1 rows. Bucket assignment is
    then a pure-Column struct comparison riding the scan. The scored
    input persists through the session cache registry (rank-helper
    source + final projection; the helper's address aggregate also
    supplies the total count, so rank_buckets runs no df.count() pass of
    its own); the two-column ranked projection persists separately
    inside the rank helper."""
    from vector_spark import cache

    labels = labels or (
        ["head", "middle", "tail"] if n_buckets == 3
        else [f"b{i}" for i in range(n_buckets)]
    )
    if len(labels) != n_buckets:
        raise ValueError("labels must match n_buckets")
    df = cache.track_persist(df)
    key = F.struct(F.col(score_col), F.col(id_col))
    # ranks derived from the count the rank helper's address aggregate
    # already produces — no separate df.count() pass over the scored input
    by_rank, n = _exact_rank_rows(
        df,
        score_col,
        id_col,
        lambda n: sorted(
            {(n * b) // n_buckets for b in range(1, n_buckets)} - {0}
        ),
    )
    bounds = []
    for b in range(1, n_buckets):
        k = (n * b) // n_buckets
        bounds.append(by_rank[k] if k > 0 else None)
    expr = None
    for label, bound in zip(labels[:-1], bounds):
        if bound is None:
            continue
        lit = F.struct(
            F.lit(bound[0]).alias(score_col), F.lit(bound[1]).alias(id_col)
        )
        cond = key <= lit
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    bucket = (
        F.lit(labels[-1]) if expr is None else expr.otherwise(labels[-1])
    )
    return df.select(id_col, score_col, bucket.alias("bucket"))


def dsir_select(
    docs: DataFrame,
    k: int,
    target_filter: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_chars: int = 3,
    alpha: float = 1.0,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
    pick the *k* raw documents whose hashed-n-gram distribution looks
    most like a target domain. Features are unigrams + bigrams hashed
    into 16^hash_chars buckets (the paper's hashing trick — collisions
    are part of the estimator, not a defect); the importance weight is

        log w(d) = Σ_b c_db · (ln p_target(b) − ln p_raw(b))

    with add-α smoothed bucket probabilities estimated from the corpus
    itself (target = rows matching *target_filter*, raw = everything).
    The paper resamples ∝ w; this implements the deterministic top-k
    variant (select-highest-weight, id tiebreak) so two engines agree
    row-for-row. Returns (id, score, selected-k rows only).

    Engine portability: the bucket id is the first *hash_chars* hex
    chars of md5(feature) — a STRING key both Spark and any SQL oracle
    compute identically (same trick as :func:`hash_split`), no
    engine-specific hash.

    Scale shape: ONE tokenize scan explodes (doc, feature) pairs into a
    per-doc bucket-count aggregate (map-side combined, high-cardinality
    skew-free key) that is persisted via the session cache registry and
    feeds EVERY downstream consumer — the plan is a diamond (bucket
    table, totals, and per-doc scoring all reuse it), and without the
    persist Catalyst re-runs the corpus explode once per arm (audited:
    4 scans -> 1). The global bucket table is at most 16^h rows
    (bounded by construction — AQE broadcasts it); per-doc scoring is
    one bucket-keyed join + (doc)-rollup; the final top-k is a parallel
    partial TakeOrderedAndProject, never a global single-partition
    window."""
    return (
        _dsir_scored(docs, target_filter, text_col, id_col, hash_chars,
                     alpha)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def _dsir_scored(
    docs: DataFrame,
    target_filter: Column,
    text_col: str,
    id_col: str,
    hash_chars: int,
    alpha: float,
) -> DataFrame:
    """(id, score) for EVERY doc — the shared DSIR importance-weight
    pipeline behind :func:`dsir_select` (top-k) and
    :func:`dsir_resample` (Gumbel-top-k). See dsir_select for the math
    and the scale shape."""
    from vector_spark import cache

    ws = _words(F.col(text_col))
    feats = F.concat(ws, _ngrams(ws, 2))
    n_buckets = 16 ** hash_chars
    pairs = (
        docs.select(
            F.col(id_col).alias("_id"),
            target_filter.alias("_is_target"),
            F.explode(feats).alias("_f"),
        )
        .where(F.length("_f") >= 1)
        .select(
            "_id", "_is_target",
            F.substring(F.md5(F.col("_f")), 1, hash_chars).alias("_b"),
        )
    )
    doc_counts = cache.track_persist(
        pairs.groupBy("_id", "_is_target", "_b").agg(
            F.count(F.lit(1)).alias("_n")
        )
    )
    bucket = doc_counts.groupBy("_b").agg(
        F.sum("_n").alias("_raw"),
        F.sum(F.when(F.col("_is_target"), F.col("_n")).otherwise(0)).alias(
            "_tgt"
        ),
    )
    totals = bucket.agg(
        F.sum("_raw").alias("_traw"), F.sum("_tgt").alias("_ttgt")
    )
    # ln p_t(b) - ln p_r(b) with add-alpha smoothing over the FIXED
    # bucket space (16^h), so unseen-in-target buckets still score
    ratio = bucket.crossJoin(F.broadcast(totals)).select(
        "_b",
        (
            F.log(F.col("_tgt") + alpha)
            - F.log(F.col("_ttgt") + alpha * n_buckets)
            - F.log(F.col("_raw") + alpha)
            + F.log(F.col("_traw") + alpha * n_buckets)
        ).alias("_lr"),
    )
    scored = (
        doc_counts.join(ratio, "_b")
        .groupBy("_id")
        .agg(F.round(F.sum(F.col("_n") * F.col("_lr")), 6).alias("score"))
    )
    return docs.join(
        scored, docs[id_col] == scored["_id"], "left"
    ).select(
        F.col(id_col),
        F.coalesce(F.col("score"), F.lit(0.0)).alias("score"),
    )


def unimax_allocation(
    counts: list[tuple], budget: float, epoch_cap: float = 4.0
) -> list[tuple]:
    """UniMax budget allocation (Chung et al. 2023): given per-group
    token counts [(group, n)], a total token budget, and a per-group
    epoch cap, allocate ascending-by-size — each group gets
    min(cap·n_g, remaining_budget / remaining_groups). Small groups cap
    out at `epoch_cap` epochs; the rest split the remainder equally
    (once the cap stops binding the fair share is constant, so the
    allocation has the closed form the oracle replays with window
    functions). Pure driver-side math over the GROUP table — groups are
    bounded by contract (languages/domains), never corpus rows.

    Returns [(group, n, alloc, epochs)] with alloc/epochs rounded to 6
    (epochs additionally floor-stable for the expander's hash
    threshold)."""
    rows = sorted(counts, key=lambda r: (r[1], r[0]))
    L = len(rows)
    # closed form (same float ops as the SQL oracle, so the rounded
    # epochs can never diverge): the capped set is the maximal prefix —
    # once the fair share undercuts cap*n it stays undercut, and every
    # uncapped group receives the SAME share (subtracting an equal share
    # leaves the per-remaining-group share unchanged)
    cum, m = 0, 0
    for j, (_g, n) in enumerate(rows, start=1):
        if epoch_cap * n <= (budget - epoch_cap * cum) / (L - j + 1):
            cum += n
            m = j
        else:
            break
    share = (budget - epoch_cap * cum) / (L - m) if m < L else 0.0
    out = []
    for j, (g, n) in enumerate(rows, start=1):
        alloc = epoch_cap * n if j <= m else share
        epochs = alloc / n if n else 0.0
        out.append((g, n, round(alloc, 6), round(epochs, 9)))
    return out


def unimax_expand(
    docs: DataFrame,
    budget: float | None = None,
    epoch_cap: float = 4.0,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_frac: float | None = None,
) -> DataFrame:
    """Materialize the UniMax training stream: every document appears
    floor(epochs_g) times, plus one extra copy for the deterministic
    frac(epochs_g) fraction of its group (Knuth hash threshold — the
    engine's replayable uniform, same floor-truncated comparison as the
    mixture samplers). Returns (id, group, copy, epochs).

    Scale shape: ONE tokenize-count aggregate produces the G-row group
    table; the allocation is driver-side over those G rows (bounded by
    contract); rates broadcast back as a literal CASE riding the scan;
    the explode emits ceil(epochs) ≤ ceil(epoch_cap) rows per doc —
    output size is the allocated budget by construction, and no shuffle
    follows the aggregate."""
    from vector_spark.dataops.text import token_count

    if (budget is None) == (budget_frac is None):
        raise ValueError("pass exactly one of budget / budget_frac")
    counts = [
        (r["_g"], r["_n"])
        for r in docs.groupBy(F.col(group_col).alias("_g"))
        .agg(F.sum(token_count(F.col(text_col))).alias("_n"))
        .collect()
    ]
    if budget is None:
        budget = budget_frac * sum(n for _g, n in counts)
    alloc = unimax_allocation(counts, budget, epoch_cap)
    emap = {g: e for g, _n, _a, e in alloc}
    epochs = None
    for g, e in emap.items():
        cond = (
            F.col(group_col).isNull()
            if g is None
            else (F.col(group_col) == g)
        )
        epochs = (
            F.when(cond, F.lit(e))
            if epochs is None
            else epochs.when(cond, F.lit(e))
        )
    epochs = (
        epochs.otherwise(F.lit(0.0)) if epochs is not None else F.lit(0.0)
    )
    h = F.pmod(F.col(id_col).cast("long") * F.lit(_KNUTH), F.lit(_MOD))
    whole = F.floor(epochs).cast("long")
    frac = epochs - F.floor(epochs)
    n_copies = F.ceil(epochs).cast("long")
    return (
        docs.select(
            F.col(id_col), F.col(group_col), epochs.alias("epochs"),
            whole.alias("_w"), frac.alias("_f"),
        )
        .where(n_copies > 0)
        .select(
            id_col, group_col, "epochs", "_w", "_f",
            F.explode(
                F.sequence(F.lit(0).cast("long"), n_copies - 1)
            ).alias("copy"),
        )
        .where(
            (F.col("copy") < F.col("_w"))
            | (h <= F.floor(F.col("_f") * _MOD).cast("long"))
        )
        .select(
            id_col, group_col, "copy", F.round("epochs", 6).alias("epochs")
        )
    )


def dsir_resample(
    docs: DataFrame,
    k: int,
    target_filter: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_chars: int = 3,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR's actual SAMPLING mode (Xie et al. 2023 §2: resample k docs
    with probability ∝ w(d)): Gumbel-top-k — drawing k items without
    replacement with probability ∝ exp(log w) is exactly taking the top
    k of log w(d) + G(d) where G = −ln(−ln U) and U is uniform(0,1)
    (Gumbel-max trick, Yellott 1977). U comes from the engine's
    deterministic Knuth hash of the id ((h + 0.5)/2³¹, the same
    hash-as-uniform replayability contract as the mixture samplers), so
    two engines — and two runs — draw the identical sample.

    Returns (id, score, gkey) for the k selected docs, gkey the rounded
    Gumbel-perturbed key the selection ordered by. Scale shape:
    identical to :func:`dsir_select` (one tokenize scan into a persisted
    per-doc bucket aggregate, 16^h-bounded bucket table) — the perturbed
    key rides the final projection and the top-k stays a parallel
    partial TakeOrderedAndProject. Rounded to 6 decimals before the
    comparison (id tiebreak) so cross-engine libm ulp differences can't
    reorder the cut."""
    u = (
        F.pmod(F.col(id_col).cast("long") * F.lit(_KNUTH), F.lit(_MOD))
        + F.lit(0.5)
    ) / F.lit(float(_MOD))
    gumbel = -F.log(-F.log(u))
    all_scored = _dsir_scored(
        docs, target_filter, text_col, id_col, hash_chars, alpha
    )
    return (
        all_scored.select(
            id_col,
            "score",
            F.round(F.col("score") + gumbel, 6).alias("gkey"),
        )
        .orderBy(F.col("gkey").desc(), F.col(id_col))
        .limit(k)
    )


def sample_exact_k(
    docs: DataFrame,
    k: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic EXACT-k per-group sample — the fixed-size eval-set
    maker (:func:`stratified_sample` keeps an expected *rate*; eval
    subsets and per-class probes need exactly k rows per group). Rank
    each group by the Knuth multiplicative hash of the id (the engine's
    portable consistent hash — same constant the sample operator and its
    oracles replay) with the raw id as tiebreak, keep the k smallest:
    rerun-stable, partitioning-independent, engine-replayable.

    Scale note: a per-group row_number window puts EVERY row of a group
    through one task — and AQE cannot split a window partition (it
    splits skewed *join* partitions; window correctness requires the
    whole group in one task), so a pathologically hot group (one
    language at 40% of a 100 TB corpus) would be one task sorting it.
    The window here therefore never sees the full group: a loose hash
    threshold t_g ≈ (4k+64)/n_g·MOD pre-filters each group to an
    expected 4k+64 survivors first (the k smallest hashes are all below
    t_g whenever ≥k rows survive, so exact-k is preserved), and a lazy
    fallback re-ranks the FULL group only for the rare group whose
    survivors undershoot k (P[Binom(n, (4k+64)/n) < k] is negligible).
    Everything is G-row broadcast aggregates + scan-riding filters; the
    windowed input is O(k) per group regardless of group size."""
    from pyspark.sql.window import Window

    # same formulation as consistent_sample above: pmod + long cast, so
    # negative ids rank by non-negative remainders and the multiply can't
    # hit ANSI int overflow (the signed % operator diverges on both)
    h = F.pmod(F.col(id_col).cast("long") * F.lit(_KNUTH), F.lit(_MOD))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    m = 4 * k + 64  # expected survivors per group under the pre-filter
    cnts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    thresh = F.when(
        F.col("_n") > m,
        F.ceil(F.lit(m) / F.col("_n") * _MOD).cast("long"),
    ).otherwise(F.lit(_MOD))
    # null-safe keys throughout: groupBy and the window treat NULL group
    # as one stratum, so every join must too (cap_per_source precedent)
    pre = (
        docs.join(
            F.broadcast(cnts.select(F.col(group_col).alias("_g"), "_n")),
            F.col(group_col).eqNullSafe(F.col("_g")),
        )
        .where(h < thresh)
        .drop("_g", "_n")
    )
    surv = pre.groupBy(group_col).agg(F.count(F.lit(1)).alias("_s"))
    fb_groups = (
        cnts.join(
            surv.select(F.col(group_col).alias("_g"), "_s"),
            F.col(group_col).eqNullSafe(F.col("_g")),
            "left",
        )
        .where(
            (F.coalesce(F.col("_s"), F.lit(0)) < k)
            & (F.col("_n") > F.coalesce(F.col("_s"), F.lit(0)))
        )
        .select(F.col(group_col).alias("_fg"))
    )
    on_fb = F.col(group_col).eqNullSafe(F.col("_fg"))
    main = pre.join(F.broadcast(fb_groups), on_fb, "left_anti")
    fb = docs.join(F.broadcast(fb_groups), on_fb, "leftsemi")
    return (
        main.unionByName(fb)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def line_repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The four line-structure rows of Gopher §A1.1's repetition table
    (completing :func:`repetition_stats`' word-n-gram rows):

    - ``dup_line_frac``: fraction of (non-blank, trimmed) lines that
      are duplicates of an earlier-or-later line in the SAME document
      (occurrences beyond the first, over total lines).
    - ``dup_line_char_frac``: characters in those duplicate occurrences
      over total line characters.
    - ``dup_para_frac`` / ``dup_para_char_frac``: the same over
      blank-line-separated paragraphs.

    Plan shape: two explodes (lines, paragraphs) → groupBy(doc, unit,
    hash) with map-side combine → per-doc aggregate. Both shuffles key
    on (doc_id, content-hash) — high-cardinality, skew-free.
    """
    t = F.col(text_col)

    def frac_stats(split_pattern: str, unit: str) -> DataFrame:
        units = (
            df.select(
                F.col(id_col),
                F.explode(F.split(t, split_pattern)).alias("_u"),
            )
            .withColumn("_u", F.trim("_u"))
            .where(F.length("_u") > 0)
        )
        per_value = units.groupBy(
            id_col, F.md5("_u").alias("_h")
        ).agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.first(F.length("_u")).alias("_len"),
        )
        return per_value.groupBy(id_col).agg(
            F.round(
                F.sum(F.col("_cnt") - 1)
                / F.sum("_cnt"), 6
            ).alias(f"dup_{unit}_frac"),
            F.round(
                F.sum((F.col("_cnt") - 1) * F.col("_len"))
                / F.sum(F.col("_cnt") * F.col("_len")), 6
            ).alias(f"dup_{unit}_char_frac"),
        )

    lines = frac_stats(r"\n", "line")
    paras = frac_stats(r"\n\s*\n", "para")
    return (
        df.select(id_col)
        .join(lines, id_col, "left")
        .join(paras, id_col, "left")
        .fillna(0.0)
    )


def url_filter(
    df: DataFrame,
    blocked_domains: list[str],
    blocked_words: list[str] | None = None,
    url_col: str = "url",
) -> DataFrame:
    """URL-level filtering (the RefinedWeb/C4 front gate that runs
    before any text is fetched or scored): extract the registrable
    host from the URL, drop documents whose host IS a blocked domain
    or any SUBDOMAIN of one (suffix match on dot boundaries — 'bad.com'
    blocks 'x.bad.com' but never 'notbad.com'), and flag URLs whose
    lowercased path/query contains a blocked word. Emits the decision
    columns (host, domain_blocked, word_blocked, keep) so a pipeline
    can audit WHY a URL fell out — same per-rule-matrix contract as
    gopher_quality_flags.

    Scale shape: everything rides the scan (one regexp host extract +
    a bounded OR-chain over the blocklist literals — blocklists are
    config, bounded by contract, compiled into the plan; a 100k-domain
    blocklist would become a broadcast join on the host instead, noted
    here so nobody scales the literal chain)."""
    url = F.col(url_col)
    # Real crawl URL lists carry three shapes: absolute
    # (`https://h/p`), protocol-relative (`//h/p`), and bare
    # (`h/p`). The scheme-anchored extract handles only the first;
    # when it comes back empty, fall back to an authority-first
    # extract so the other two still hit the domain gate instead of
    # silently passing with an empty host.
    scheme_host = F.regexp_extract(
        url, r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1
    )
    bare_host = F.regexp_extract(url, r"^(?://)?([^/:?#]+)", 1)
    host = F.lower(
        F.when(scheme_host != F.lit(""), scheme_host).otherwise(bare_host)
    )
    dom_blocked = F.lit(False)
    for d in blocked_domains:
        d = d.lower()
        dom_blocked = dom_blocked | (host == d) | host.endswith("." + d)
    scheme_rest = F.regexp_extract(
        url, r"^[a-z][a-z0-9+.-]*://[^/]*(.*)$", 1
    )
    bare_rest = F.regexp_extract(url, r"^(?://)?[^/]*(.*)$", 1)
    rest = F.lower(
        F.when(scheme_host != F.lit(""), scheme_rest).otherwise(bare_rest)
    )
    word_blocked = F.lit(False)
    for w in blocked_words or []:
        word_blocked = word_blocked | rest.contains(w.lower())
    return df.select(
        "*",
        host.alias("host"),
        dom_blocked.alias("domain_blocked"),
        word_blocked.alias("word_blocked"),
        (~dom_blocked & ~word_blocked).alias("keep"),
    )


def c4_filters(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    bad_words: list[str] | None = None,
) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020, §2.2 — the public
    heuristics behind the C4 corpus, the counterpart to
    gopher_quality_flags' Gopher rules):

    line level — keep only lines that end in terminal punctuation
    (. ! ? or a closing quote), carry at least `min_words_per_line`
    words, and do not contain the word "javascript";
    page level — drop pages with fewer than `min_sentences` sentences
    (counted over the KEPT lines), any page containing "lorem ipsum"
    or a curly brace `{`, and any page containing a configured bad
    word.

    Emits the decision matrix (cleaned_text, n_lines_kept,
    n_sentences, has_lorem, has_brace, has_bad_word, keep) so a
    pipeline can audit why a page fell out. Everything is a Column
    expression riding the scan — per-line work is higher-order
    functions over the split array, zero shuffles, zero Python."""
    text = F.col(text_col)

    def _line_ok(line: Column) -> Column:
        t = F.trim(line)
        words = F.filter(F.split(t, r"\s+"), lambda w: w != "")
        return (
            t.rlike(r'[.!?"]$')
            & (F.size(words) >= min_words_per_line)
            & ~F.lower(t).contains("javascript")
        )

    kept = F.filter(F.split(text, "\n"), _line_ok)
    cleaned = F.array_join(F.transform(kept, F.trim), "\n")
    # sentence proxy: terminal-punctuation marks in the kept text
    # (C4 counted sentences; the mark count is the deterministic,
    # oracle-recomputable equivalent)
    n_sentences = F.length(F.regexp_replace(cleaned, r"[^.!?]", ""))
    lower_all = F.lower(text)
    has_lorem = lower_all.contains("lorem ipsum")
    has_brace = text.contains("{")
    has_bad = F.lit(False)
    for w in bad_words or []:
        has_bad = has_bad | lower_all.contains(str(w).lower())
    keep = (
        (n_sentences >= min_sentences)
        & ~has_lorem & ~has_brace & ~has_bad
    )
    return df.select(
        "*",
        cleaned.alias("cleaned_text"),
        F.size(kept).alias("n_lines_kept"),
        n_sentences.alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        has_bad.alias("has_bad_word"),
        keep.alias("keep"),
    )
