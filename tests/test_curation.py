"""Corpus-curation ops (dataops/curation.py): value-level unit tests on
hand-computable fixtures, plus plan-shape checks for the scale invariants
(partitioned packing window, broadcast contamination join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.dataops.curation import (
    contamination_check,
    pack_shards,
    repetition_stats,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 1: "spam spam spam spam" — maximal repetition
        (1, "spam spam spam spam", "en", "s0"),
        # doc 2: all-distinct words
        (2, "alpha beta gamma delta", "en", "s0"),
        # doc 3: repeated bigram "a b": "a b a b c"
        (3, "a b a b c", "zh", "s1"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_repetition_stats_values(docs):
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    # doc 1: top 1-gram "spam" covers 4*4=16 chars of 19; every word dup'd
    assert out[1]["top1_frac"] == round(16 / 19, 6)
    assert out[1]["dup1_frac"] == 1.0
    # its top 2-gram "spam spam" occurs 3x -> 3*9/19
    assert out[1]["top2_frac"] == round(27 / 19, 6)
    assert out[1]["dup2_frac"] == 1.0
    # doc 2: no repetition at any n
    assert out[2]["dup1_frac"] == 0.0
    assert out[2]["dup2_frac"] == 0.0
    # top1 is the longest word on count ties: "delta"/"gamma"/"alpha" (5);
    # tie-break is (cnt, len, gram) lexicographic -> "gamma"
    assert out[2]["top1_frac"] == round(5 / 22, 6)
    # doc 3: "a b" occurs twice among 4 bigrams -> dup2 = 2/4
    assert out[3]["dup2_frac"] == 0.5
    assert out[3]["top2_frac"] == round(2 * 3 / 9, 6)


def test_contamination_check_values(spark, docs):
    bench = spark.createDataFrame(
        [(99, "beta gamma delta epsilon", "en", "s9")],
        "doc_id long, text string, lang string, source string",
    )
    got = {
        r["doc_id"]: r["n_collisions"]
        for r in contamination_check(docs, bench, n=2).collect()
    }
    # doc 2 shares bigrams "beta gamma" and "gamma delta"; others none
    assert got == {2: 2}


def test_contamination_broadcasts_benchmark(docs, spark):
    bench = docs.limit(1)
    plan = contamination_check(docs, bench, n=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_stratified_sample_deterministic_and_stratified(spark):
    docs = spark.range(10000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"),
    )
    out = stratified_sample(docs, rates={"en": 0.2, "zh": 0.8})
    a = out.groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in a}
    assert abs(counts["en"] / 5000 - 0.2) < 0.05
    assert abs(counts["zh"] / 5000 - 0.8) < 0.05
    # rerun-stable
    b = stratified_sample(docs, rates={"en": 0.2, "zh": 0.8}).collect()
    assert sorted(r["doc_id"] for r in b) == sorted(
        r["doc_id"] for r in out.collect()
    )


def test_pack_shards_budget_and_order(spark):
    docs = spark.createDataFrame(
        [(i, "w " * 40, "g0") for i in range(10)]
        + [(i, "w " * 10, "g1") for i in range(10, 14)],
        "doc_id long, text string, source string",
    )
    out = pack_shards(docs, token_budget=100, group_col="source").collect()
    by_id = {r["doc_id"]: r for r in out}
    # g0: 40 tokens each -> docs 0,1 start at 0,40 (shard 0); doc 2 starts
    # at 80 (shard 0); doc 3 starts at 120 (shard 1)
    assert [by_id[i]["shard"] for i in range(5)] == [0, 0, 0, 1, 1]
    assert by_id[3]["start_offset"] == 120
    # g1 packs independently from offset 0
    assert by_id[10]["shard"] == 0 and by_id[10]["start_offset"] == 0


def test_pack_shards_window_is_partitioned(spark):
    docs = spark.createDataFrame(
        [(1, "a b", "g0")], "doc_id long, text string, source string"
    )
    plan = pack_shards(docs, 100)._jdf.queryExecution().executedPlan().toString()
    # the cumulative window must be partitioned by the shard group —
    # never a global single-task sort
    assert "partitionBy" not in plan  # physical plan spells it differently
    assert "Window" in plan and "source" in plan.split("Window", 1)[1][:400]


def test_bpe_pair_counts_values(spark):
    from vector_spark.dataops.text import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "aba ab"), (2, "aba")], "doc_id long, text string"
    )
    out = {(r["left"], r["right"]): r["pair_count"]
           for r in bpe_pair_counts(docs, top_n=10).collect()}
    # word freqs: aba=2, ab=1 → pairs: (a,b): 2*1 + 1*1 = 3; (b,a): 2*1 = 2
    assert out == {("a", "b"): 3, ("b", "a"): 2}


def test_duplicate_spans(spark):
    """k-word spans shared by >= min_docs distinct docs, df counted once
    per doc (a doc repeating a span internally counts once)."""
    from vector_spark.dataops.curation import duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "x alpha beta gamma delta y"),          # shares a 4-run
            (3, "alpha beta gamma delta epsilon other"),
            (4, "alpha beta gamma delta alpha beta gamma delta"),  # internal repeat
            (5, "totally different words here entirely"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.span: r.n_docs
        for r in duplicate_spans(docs, k=4, min_docs=2).collect()
    }
    assert out["alpha beta gamma delta"] == 4  # doc 4 counts ONCE
    assert out["beta gamma delta epsilon"] == 2  # docs 1 and 3
    assert "totally different words here" not in out
    # min_docs filter: raising it drops the 2-doc span
    out3 = {
        r.span
        for r in duplicate_spans(docs, k=4, min_docs=3).collect()
    }
    assert out3 == {"alpha beta gamma delta"}
    # both strategies are exact and identical (the hash arm's witness
    # detection + representative-doc recovery must reproduce the
    # string arm bit-for-bit)
    for strategy in ("string", "hash"):
        got = {
            (r.span, r.n_docs)
            for r in duplicate_spans(
                docs, k=4, min_docs=2, strategy=strategy
            ).collect()
        }
        assert got == set(out.items()), strategy


def test_remove_duplicate_spans(spark):
    """Removal contract: the canonical (min doc, min pos) occurrence
    survives; every other occurrence's k word positions are cut; docs
    with nothing removed come back whitespace-normalized."""
    from vector_spark.dataops.curation import remove_duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d x"),
            (2, "p a b c d"),
            (3, "a b c d"),
            (4, "Totally   Different"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.clean_text
        for r in remove_duplicate_spans(docs, k=4, min_docs=2).collect()
    }
    assert out[1] == "a b c d x"  # canonical occurrence kept
    assert out[2] == "p"  # positions 1-4 removed
    assert out[3] == ""  # fully covered
    assert out[4] == "totally different"  # normalized, untouched


def test_remove_duplicate_spans_overlap_union(spark):
    """Overlapping removed occurrences union their covered positions
    (doc 2 repeats the span back-to-back: both occurrences are removed,
    covering the whole text)."""
    from vector_spark.dataops.curation import remove_duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "a b a b z"),
            (2, "a b a b a b"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.clean_text
        for r in remove_duplicate_spans(docs, k=2, min_docs=2).collect()
    }
    # span "a b" canonical at (1,0); "b a" canonical at (1,1); every
    # occurrence in doc 2 is non-canonical -> fully covered
    assert out[2] == ""
    # doc 1 keeps its canonical occurrences but loses the repeat at
    # pos 2-3 ("a b") -> positions 0,1 kept via canonicals, 2,3 cut, z kept
    assert out[1] == "a b z"


def test_cap_per_source(spark):
    from vector_spark.dataops.curation import cap_per_source

    docs = spark.createDataFrame(
        [
            (1, "s1", 10),
            (2, "s1", 20),
            (3, "s1", 30),
            (4, "s1", 30),
            (5, "s2", 5),
        ],
        "doc_id long, source string, n_chars long",
    )
    kept = {
        r.doc_id
        for r in cap_per_source(docs, 2).collect()
    }
    # s1 over the cap: keep largest n_chars, id tiebreak -> 3, 4;
    # s2 under the cap: passes through untouched
    assert kept == {3, 4, 5}


def test_cap_per_source_null_source_group(spark):
    """NULL source is a group like any other: groupBy and the ranking
    window treat NULLs as one partition, so the semi/anti joins must be
    null-safe — a plain equi-join never matches NULL and an over-cap
    NULL-source group would bypass the cap entirely (the oracle's
    QUALIFY-over-all-partitions semantics cap it)."""
    from vector_spark.dataops.curation import cap_per_source

    docs = spark.createDataFrame(
        [
            (1, None, 10),
            (2, None, 20),
            (3, None, 30),
            (4, "s1", 5),
        ],
        "doc_id long, source string, n_chars long",
    )
    kept = {r.doc_id for r in cap_per_source(docs, 2).collect()}
    assert kept == {2, 3, 4}


def test_rank_buckets_threshold_semantics(spark):
    """Rank-equal bucketing: with n=7 and 3 buckets the cuts fall at
    floor(7/3)=2 and floor(14/3)=4 (remainder goes to the LAST bucket,
    unlike NTILE), ties break by id, and repartitioning cannot move a
    document across buckets."""
    from vector_spark.dataops.curation import rank_buckets

    rows = [(i, float(s)) for i, s in enumerate([5, 1, 3, 3, 9, 2, 7])]
    df = spark.createDataFrame(rows, "doc_id long, avg_nll double")
    out = {r.doc_id: r.bucket for r in rank_buckets(df).collect()}
    # rank order by (score, id): 1->1.0, 5->2.0 | 2->3.0, 3->3.0 | rest
    assert out == {1: "head", 5: "head", 2: "middle", 3: "middle",
                   0: "tail", 6: "tail", 4: "tail"}
    again = {
        r.doc_id: r.bucket
        for r in rank_buckets(df.repartition(5)).collect()
    }
    assert again == out


def test_chunk_sequences_boundaries(spark):
    """Concat-and-chunk manifest against hand-computed intervals: docs
    concatenate in id order per group, a doc crossing a boundary appears
    in both sequences with the correct in-sequence slots, zero-token
    docs vanish, groups chunk independently."""
    from vector_spark.dataops.curation import chunk_sequences

    df = spark.createDataFrame(
        [
            (1, "a", 6),   # [0,6)   -> seq 0 slots [0,6)
            (2, "a", 8),   # [6,14)  -> seq 0 [6,10) + seq 1 [0,4)
            (3, "a", 0),   # no mass -> absent
            (4, "a", 10),  # [14,24) -> seq 1 [4,10) + seq 2 [0,4)
            (5, "b", 3),   # own group: seq 0 [0,3)
        ],
        "doc_id long, source string, n_tokens long",
    )
    rows = {
        (r.doc_id, r.seq_id): (r.tok_start, r.tok_end)
        for r in chunk_sequences(df, seq_len=10).collect()
    }
    assert rows == {
        (1, 0): (0, 6),
        (2, 0): (6, 10),
        (2, 1): (0, 4),
        (4, 1): (4, 10),
        (4, 2): (0, 4),
        (5, 0): (0, 3),
    }


def test_temperature_mixture_rates_and_flattening(spark):
    """Temperature sampling: keep rates follow n^alpha exactly (checked
    against an independent computation), alpha flattens the skew (the
    minority stratum keeps a HIGHER fraction than the majority), and
    alpha=1 with target 1.0 keeps everything at rate 1."""
    from vector_spark.dataops.curation import temperature_mixture

    rows = [(i, "en" if i < 160 else "fr") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mixture(docs, alpha=0.5, target_frac=0.5).collect()
    got_rates = {r.lang: r.keep_rate for r in out}
    n = {"en": 160, "fr": 40}
    w = {k: v ** 0.5 for k, v in n.items()}
    tw, tn = sum(w.values()), sum(n.values())
    for k in n:
        want = round(min(1.0, 0.5 * tn * (w[k] / tw) / n[k]), 6)
        assert abs(got_rates[k] - want) < 2e-6, k
    assert got_rates["fr"] > got_rates["en"]  # flattening
    # keep decision is the shared Knuth hash: per-stratum kept counts
    # match an independent replay of the same rule
    kept = {(r.doc_id, r.lang) for r in out}
    for i, lang in rows:
        rate = round(min(1.0, 0.5 * tn * (w[lang] / tw) / n[lang]), 9)
        h = (i * 2654435761) % (2 ** 31)
        assert ((i, lang) in kept) == (h <= int(rate * 2 ** 31)), i
    # alpha=1, target 1.0 -> natural distribution, everything kept
    all_out = temperature_mixture(docs, alpha=1.0, target_frac=1.0)
    assert all_out.count() == 200


def test_dsir_select_matches_reference_math(spark):
    """DSIR importance weights equal an independent pure-Python
    implementation of the same hashed-ngram log-ratio estimator, and
    the top-k is deterministic under repartitioning."""
    import hashlib
    import math
    from collections import Counter

    from vector_spark.dataops.curation import dsir_select
    from pyspark.sql import functions as F

    rows = [
        (1, "en", "the quick brown fox"),
        (2, "en", "the lazy dog sleeps"),
        (3, "xx", "zorg blip zorg blip"),
        (4, "xx", "the quick brown cat"),
        (5, "xx", ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r.doc_id: r.score
        for r in dsir_select(docs, 5, F.col("lang") == "en").collect()
    }

    def feats(text):
        ws = text.lower().strip().split()
        return [w for w in ws] + [
            f"{a} {b}" for a, b in zip(ws, ws[1:])
        ]

    def bucket(f):
        return hashlib.md5(f.encode()).hexdigest()[:3]

    raw, tgt = Counter(), Counter()
    per_doc = {}
    for doc_id, lang, text in rows:
        c = Counter(bucket(f) for f in feats(text))
        per_doc[doc_id] = c
        raw.update(c)
        if lang == "en":
            tgt.update(c)
    traw, ttgt, B = sum(raw.values()), sum(tgt.values()), 16 ** 3
    for doc_id, c in per_doc.items():
        want = round(
            sum(
                n * (
                    math.log(tgt[b] + 1) - math.log(ttgt + B)
                    - math.log(raw[b] + 1) + math.log(traw + B)
                )
                for b, n in c.items()
            ),
            6,
        )
        assert abs(got[doc_id] - want) < 1e-6, doc_id
    # the en docs and the en-like xx doc outrank the gibberish one
    assert got[1] > got[3] and got[4] > got[3]
    # exact-k + determinism under repartitioning
    top2 = dsir_select(docs, 2, F.col("lang") == "en")
    top2_ids = [r.doc_id for r in top2.collect()]
    assert len(top2_ids) == 2
    again = [
        r.doc_id
        for r in dsir_select(
            docs.repartition(7), 2, F.col("lang") == "en"
        ).collect()
    ]
    assert again == top2_ids


def test_tokenizer_pipeline_composes(spark):
    """The end-to-end flow (normalize -> cap -> de-span -> BPE train/
    encode -> pack on the real tokenizer counts) composes on a corpus
    engineered so every stage acts: accents normalize, the cap drops a
    doc, the duplicated span is cut from the non-canonical doc, and the
    packing offsets accumulate the ENCODED token counts in id order."""
    from vector_spark.dataops.curation import (
        cap_per_source,
        pack_shards,
        remove_duplicate_spans,
    )
    from vector_spark.dataops.text import (
        bpe_encode_docs,
        bpe_train,
        normalize_text,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "s1", 30, "Héllo wörld alpha beta gamma delta"),
            (2, "s1", 20, "hello world alpha beta gamma none"),
            (3, "s1", 10, "tiny"),  # smallest: dropped by cap=2
            (4, "s2", 25, "solo doc over here"),
        ],
        "doc_id long, source string, n_chars long, text string",
    )
    norm = docs.select(
        "doc_id", "source", "n_chars",
        normalize_text(F.col("text")).alias("text"),
    )
    kept = cap_per_source(norm, 2)
    capped = norm.join(kept.select("doc_id"), "doc_id")
    cleaned = remove_duplicate_spans(capped, k=5, min_docs=2)
    texts = {r.doc_id: r.clean_text for r in cleaned.collect()}
    assert set(texts) == {1, 2, 4}  # doc 3 capped away
    # normalization folded the accents, so docs 1 and 2 share the 5-word
    # span "hello world alpha beta gamma"; canonical (doc 1, pos 0) stays
    assert texts[1] == "hello world alpha beta gamma delta"
    assert texts[2] == "none"
    merges = bpe_train(cleaned, text_col="clean_text", n_merges=4)
    enc = bpe_encode_docs(cleaned, merges, text_col="clean_text")
    manifest = pack_shards(
        enc.join(capped.select("doc_id", "source"), "doc_id"),
        token_budget=10, group_col="source", tokens_col="n_tokens",
    ).collect()
    rows = {r.doc_id: r for r in manifest}
    n1 = rows[1].n_tokens
    assert rows[1].start_offset == 0 and rows[2].start_offset == n1
    assert rows[2].shard == n1 // 10 and rows[4].start_offset == 0


def test_remove_duplicate_spans_no_forced_broadcast(spark):
    """The survivor table's size is corpus-dependent (every span
    duplicated across >= min_docs docs — corpus-fraction scale per Lee
    et al.), so the occurrence-marking join must carry NO broadcast
    hint: AQE picks broadcast only when the measured size fits,
    sort-merge otherwise, instead of a forced hint OOMing at 100 TB.
    In the hash strategy the ONE allowed hint is the collision-repair
    arm's broadcast of the collider hash set, which is bounded by the
    64-bit birthday rate (~n²/2^65 groups — ~22 MB of keys even at
    10^13 spans), not by corpus fraction."""
    from vector_spark.dataops.curation import remove_duplicate_spans

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
    )
    out = remove_duplicate_spans(docs, k=4, min_docs=2)  # auto -> string
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    assert "UnresolvedHint" not in analyzed
    hashed = remove_duplicate_spans(docs, k=4, min_docs=2, strategy="hash")
    analyzed_h = hashed._jdf.queryExecution().analyzed().toString()
    # the collider broadcast is the hash plan's ONLY hint; it prints
    # twice because the collider-matched span subtree is referenced by
    # both the recount aggregation and its occurrence-marking join
    # (the analyzed plan is a tree, not a DAG)
    assert analyzed_h.count("ResolvedHint") == 2
    assert "UnresolvedHint" not in analyzed_h


def test_exact_rank_rows_matches_sorted_collect(spark):
    """_exact_rank_rows (range shuffle + P-row address aggregate + k-row
    filter scan) must agree with the ground-truth sorted collect at every
    requested rank, including ranks that straddle range-partition
    boundaries, on a skewed score distribution."""
    import random

    from vector_spark.dataops.curation import _exact_rank_rows

    rng = random.Random(7)
    rows = [
        (i, float(rng.choice([0.0] * 50 + [1.0, 2.0]) + rng.random()))
        for i in range(997)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, avg_nll double"
    ).repartition(13)
    truth = sorted(rows, key=lambda r: (r[1], r[0]))
    ranks = [1, 2, 331, 332, 664, 900, 997]
    got = _exact_rank_rows(df, "avg_nll", "doc_id", ranks)
    for k in ranks:
        score, doc = truth[k - 1][1], truth[k - 1][0]
        assert got[k] == (score, doc), (k, got[k], (score, doc))


def test_rank_buckets_boundary_plan_has_no_corpus_funnel(spark):
    """The r7 boundary plan funneled n·b/3 rows through orderBy().limit()'s
    single-partition merge. The r8 plan must show: NO GlobalLimit anywhere,
    and the only single-partition exchange belongs to the P-row partition
    stats aggregate — the corpus-bearing exchange is the parallel range
    repartition."""
    import io
    import contextlib

    from vector_spark.dataops.curation import _ranked_parts

    df = spark.range(0, 10_000).selectExpr(
        "id AS doc_id", "CAST(id % 97 AS DOUBLE) AS avg_nll"
    )
    parts = _ranked_parts(df, "avg_nll", "doc_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        parts.explain("formatted")
    plan = buf.getvalue()
    assert "GlobalLimit" not in plan and "TakeOrdered" not in plan
    assert "rangepartitioning(avg_nll" in plan
    assert "SinglePartition" not in plan


def test_sample_exact_k_hot_group_prefilter_and_fallback(spark):
    """r7 verdict #3: sample_exact_k must not window a hot group in full.
    (a) On a corpus where one group holds 99% of rows, the result still
    equals the brute-force k-smallest-hash set, and the plan pre-filters
    with the hash threshold BELOW the window. (b) A group engineered so
    every row's hash clears the loose threshold (survivors < k) takes
    the fallback path and still returns the exact k."""
    from vector_spark.dataops.curation import sample_exact_k

    KNUTH, MOD = 2654435761, 2**31
    hv = lambda i: (i * KNUTH) % MOD

    # (a) hot group: 9900 rows in 'en', 100 in 'fr'
    rows = [(i, "en") for i in range(9900)] + [
        (i, "fr") for i in range(10_000, 10_100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    k = 5
    out = sample_exact_k(df, k)
    got = {(r.lang, r.doc_id) for r in out.collect()}
    exp = set()
    for g in ("en", "fr"):
        ids = [i for i, gg in rows if gg == g]
        exp |= {
            (g, i)
            for i in sorted(ids, key=lambda i: (hv(i), i))[:k]
        }
    assert got == exp
    # the window's input must carry the hash-threshold pre-filter
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "pmod" in plan and "Window" in plan

    # (b) fallback: 1000 ids whose hash all exceeds the loose threshold
    # t = ceil((4k+64)/n * MOD); survivors = 0 < k forces the full-group
    # re-rank, which must still return the exact k smallest
    m = 4 * k + 64
    big = [i for i in range(100_000) if hv(i) > (m / 1000) * MOD * 2][:1000]
    assert len(big) == 1000
    df2 = spark.createDataFrame(
        [(i, "z") for i in big], "doc_id long, lang string"
    )
    got2 = {r.doc_id for r in sample_exact_k(df2, k).collect()}
    exp2 = set(sorted(big, key=lambda i: (hv(i), i))[:k])
    assert got2 == exp2


def test_dsir_resample_gumbel_draw_replayable(spark):
    """dsir_resample's Gumbel-top-k draw must equal an independent
    Python replay: u from the Knuth hash, g = -ln(-ln u), key =
    round(score + g, 6), top-k by (key desc, id) — and differ from the
    plain top-k selection (the perturbation actually draws)."""
    import math

    from pyspark.sql import functions as F

    from vector_spark.dataops.curation import (
        _dsir_scored,
        dsir_resample,
        dsir_select,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tgt = F.col("lang") == "en"
    scores = {
        r.doc_id: r.score
        for r in _dsir_scored(docs, tgt, "text", "doc_id", 3, 1.0).collect()
    }
    KNUTH, MOD = 2654435761, 2**31

    def key(i):
        u = ((i * KNUTH) % MOD + 0.5) / MOD
        return round(scores[i] + -math.log(-math.log(u)), 6)

    k = 50
    exp = sorted(scores, key=lambda i: (-key(i), i))[:k]
    got = dsir_resample(docs, k, tgt).collect()
    assert [r.doc_id for r in got] == exp
    for r in got:
        assert abs(r.gkey - key(r.doc_id)) < 1e-9
    plain = {r.doc_id for r in dsir_select(docs, k, tgt).collect()}
    assert set(exp) != plain


def test_unimax_allocation_math():
    """Closed-form check: ascending allocation with cap 2.0, budget 100
    over sizes 10/20/50 — smallest caps out (20 <= 33.3), next caps
    (40 <= 40.0), largest splits the remainder (100-60=40 -> 0.8
    epochs); a huge budget caps everyone."""
    from vector_spark.dataops.curation import unimax_allocation

    out = unimax_allocation([("a", 10), ("b", 20), ("c", 50)], 100.0, 2.0)
    assert out == [
        ("a", 10, 20.0, 2.0), ("b", 20, 40.0, 2.0), ("c", 50, 40.0, 0.8)
    ]
    out2 = unimax_allocation([("a", 10), ("b", 20)], 1000.0, 2.0)
    assert [(g, e) for g, _n, _a, e in out2] == [("a", 2.0), ("b", 2.0)]
    # >= 2 uncapped groups: both take the SAME share and the total
    # matches the budget (regression: a per-step loop that failed to
    # subtract uncapped shares inflated later groups past the budget)
    out3 = unimax_allocation(
        [("a", 10), ("b", 100), ("c", 100)], 150.0, 2.0
    )
    assert out3 == [
        ("a", 10, 20.0, 2.0), ("b", 100, 65.0, 0.65),
        ("c", 100, 65.0, 0.65),
    ]
    assert abs(sum(a for _g, _n, a, _e in out3) - 150.0) < 1e-9


def test_unimax_expand_copies_and_fraction(spark):
    """Expansion: capped groups emit exactly floor(epochs) copies per
    doc; the fractional group emits floor+1 copies for the hash-selected
    subset only, and the selected fraction tracks frac(epochs)."""
    from pyspark.sql import functions as F

    from vector_spark.dataops.curation import unimax_expand

    rows = [(i, "small", "w " * 10) for i in range(20)] + [
        (1000 + i, "big", "w " * 10) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    # budget = 1.5x total = 3300; small caps at 2.0 (400), big gets
    # 2900/2000 = 1.45 epochs
    out = unimax_expand(df, budget_frac=1.5, epoch_cap=2.0)
    per = {
        (r["lang"], r["copy"]): r["cnt"]
        for r in out.groupBy("lang", "copy")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert per[("small", 0)] == 20 and per[("small", 1)] == 20
    assert ("small", 2) not in per
    assert per[("big", 0)] == 200
    # fractional copy: ~45% of big docs, hash-deterministic
    assert 0.30 * 200 < per[("big", 1)] < 0.60 * 200
    again = unimax_expand(df, budget_frac=1.5, epoch_cap=2.0)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_line_repetition_stats(spark):
    """dup line/para fractions per Gopher's repetition table: counts
    beyond the first occurrence over totals, by unit and by chars."""
    from vector_spark.dataops.curation import line_repetition_stats

    rows = [
        # 4 lines: 'aa' x3 + 'b' -> dup_line 2/4; chars (2*2)/(3*2+1)
        (1, "aa\naa\naa\nb"),
        (2, "one\ntwo\nthree"),                  # no dups
        # paragraphs: 'p q' twice + 'solo' -> dup_para 1/3
        (3, "p q\n\np q\n\nsolo"),
        (4, ""),                                  # empty -> zeros
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in line_repetition_stats(df).collect()}
    assert out[1].dup_line_frac == 0.5
    assert out[1].dup_line_char_frac == round(4 / 7, 6)
    assert out[2].dup_line_frac == 0.0
    assert out[3].dup_para_frac == round(1 / 3, 6)
    assert out[3].dup_para_char_frac == round(3 / 10, 6)
    # within one paragraph the lines 'p q'+'p q' also count as dup lines
    assert out[3].dup_line_frac == round(1 / 3, 6)
    assert out[4].dup_line_frac == 0.0 and out[4].dup_para_char_frac == 0.0


def test_url_filter(spark):
    """Domain suffix matching on dot boundaries, path keyword flags,
    and the keep conjunction."""
    from vector_spark.dataops.curation import url_filter

    rows = [
        (1, "https://good.example.org/page"),
        (2, "https://bad.com/home"),
        (3, "http://x.y.bad.com/a?b=1"),
        (4, "https://notbad.com/fine"),          # no false suffix hit
        (5, "https://ok.net/casino-bonus"),      # word hit in path
        (6, "https://casino.example.org/"),      # word NOT in host check
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {
        r.doc_id: r
        for r in url_filter(
            df, ["bad.com"], blocked_words=["casino"]
        ).collect()
    }
    assert out[1].keep is True and out[1].host == "good.example.org"
    assert out[2].domain_blocked is True and out[2].keep is False
    assert out[3].domain_blocked is True  # subdomain of bad.com
    assert out[4].domain_blocked is False and out[4].keep is True
    assert out[5].word_blocked is True and out[5].keep is False
    # blocked word in the HOST doesn't trip the path check
    assert out[6].word_blocked is False and out[6].keep is True


def test_c4_filters_rules(spark):
    """Each C4 rule verified on crafted pages (Raffel et al. 2020 §2.2:
    terminal punctuation, min words, javascript lines, sentence count,
    lorem ipsum, braces, bad words)."""
    from vector_spark.dataops.curation import c4_filters

    good = "\n".join(
        [f"this is a good sentence number {i}." for i in range(6)])
    pages = [
        (0, good),                                     # passes everything
        (1, good + "\nshort line."),                   # 2-word line dropped
        (2, good + "\nenable javascript to view this page."),
        (3, good + "\nno terminal punctuation on this line"),
        (4, "one sentence only here."),                # < 5 sentences
        (5, good + "\nlorem ipsum dolor sit amet."),
        (6, good + "\nfunction f() { return 1; }"),
        (7, good + "\nthis page mentions badword sadly."),
    ]
    df = spark.createDataFrame(pages, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           c4_filters(df, bad_words=["badword"]).collect()}

    assert out[0]["keep"] is True and out[0]["n_lines_kept"] == 6
    assert out[1]["keep"] is True          # the short line just drops
    assert out[1]["n_lines_kept"] == 6
    assert out[2]["keep"] is True          # javascript line drops
    assert "javascript" not in out[2]["cleaned_text"]
    assert out[3]["n_lines_kept"] == 6     # unpunctuated line drops
    assert out[4]["keep"] is False         # sentence-count gate
    assert out[5]["keep"] is False and out[5]["has_lorem"] is True
    assert out[6]["keep"] is False and out[6]["has_brace"] is True
    assert out[7]["keep"] is False and out[7]["has_bad_word"] is True


def test_remove_duplicate_spans_hash_keys_match_reference(spark):
    """r12 focused test: BOTH key strategies must agree with a
    pure-Python reference of the documented contract on a randomized
    corpus with heavy cross-document span duplication (the regime the
    xxhash64 key + witness-hash recount arm must keep exact)."""
    import random

    from vector_spark.dataops.curation import remove_duplicate_spans

    rng = random.Random(12)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 40))))
        for d in range(120)
    ]
    k, min_docs = 3, 2

    words = {d: t.lower().strip().split() for d, t in rows}
    occs: dict[tuple, list] = {}
    for d, ws in sorted(words.items()):
        for i in range(len(ws) - k + 1):
            occs.setdefault(tuple(ws[i:i + k]), []).append((d, i))
    cov: dict[int, set] = {d: set() for d in words}
    for occ in occs.values():
        if len({d for d, _ in occ}) < min_docs:
            continue
        canon = min(occ)  # (min doc, its min pos): the canonical key
        for d, p in occ:
            if (d, p) != canon:
                cov[d].update(range(p, p + k))
    expected = {
        d: " ".join(w for i, w in enumerate(ws) if i not in cov[d])
        for d, ws in words.items()
    }

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for strategy in ("string", "hash"):
        got = {
            r.doc_id: r.clean_text
            for r in remove_duplicate_spans(
                docs, k=k, min_docs=min_docs, strategy=strategy
            ).collect()
        }
        assert got == expected, strategy
