"""Distributed k-means + SemDeDup (dataops/clustering.py) and the
corpus-LM text ops (tfidf_top_terms, unigram_lm_score).

The clustering fit is engineered for determinism (lowest-id init,
6-decimal rounding, centroid-id tie-breaks) so the DuckDB oracle can
replay it; these tests pin that contract locally — identical results
under repartitioning — plus the semantic invariants (keep-one-per-
component, cluster-blocked recall trade) the oracle can't express.
"""
from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from vector_spark.dataops.clustering import (
    assign_clusters,
    kmeans_fit,
    kmeans_summary,
    semantic_dedup,
)
from vector_spark.dataops.text import tfidf_top_terms, unigram_lm_score


@pytest.fixture(scope="module")
def tiny_vectors(spark):
    # two well-separated blobs in 4-d, ids interleaved so the lowest-k
    # init spans both blobs
    rows = []
    for i in range(10):
        base = [10.0, 10.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 0.0, 10.0, 10.0]
        rows.append(
            Row(vec_id=i, embedding=[x + (i % 3) * 0.1 for x in base])
        )
    return spark.createDataFrame(rows)


def test_kmeans_separates_blobs(tiny_vectors):
    cents = kmeans_fit(tiny_vectors, 2, iters=3)
    assigned = {
        r.vec_id: r.cluster
        for r in assign_clusters(tiny_vectors, cents).collect()
    }
    evens = {assigned[i] for i in range(0, 10, 2)}
    odds = {assigned[i] for i in range(1, 10, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds


def test_kmeans_deterministic_under_repartition(tiny_vectors):
    c1 = kmeans_fit(tiny_vectors, 2, iters=2)
    c2 = kmeans_fit(tiny_vectors.repartition(7), 2, iters=2)
    assert c1 == c2  # bit-identical: rounding absorbs sum-order noise


def test_kmeans_summary_counts_and_norms(tiny_vectors):
    out = {r.cluster: (r.n, r.centroid_norm) for r in
           kmeans_summary(tiny_vectors, 2, iters=3).collect()}
    assert sum(n for n, _ in out.values()) == 10
    for _, norm in out.values():
        # both blob centroids sit near (10,10,·,·): norm ≈ sqrt(2)*10
        assert math.isclose(norm, math.sqrt(2) * 10, rel_tol=0.05)


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # k=3 over 3 identical + 1 distant vector: one init centroid ends up
    # owning nothing after round 1 and must survive unchanged (standard
    # Lloyd's degenerate-case handling), not crash or go NaN
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.0, 1.0]) for i in range(3)]
        + [Row(vec_id=3, embedding=[50.0, 50.0])]
    )
    cents = kmeans_fit(df, 3, iters=2)
    assert len(cents) == 3
    assert all(all(not math.isnan(x) for x in c) for c in cents)


def test_semantic_dedup_keeps_one_per_component(spark):
    # 6 vectors: ids 0/1/2 identical (one component), 3/4 identical,
    # 5 unique — exactly 3 keepers, component = min id
    vecs = {0: [1.0, 0.0], 1: [1.0, 0.0], 2: [1.0, 0.0],
            3: [0.0, 1.0], 4: [0.0, 1.0], 5: [-1.0, -1.0]}
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in vecs.items()]
    )
    out = {r.id: r for r in
           semantic_dedup(df, k=2, iters=2, threshold=0.99).collect()}
    assert out[0].keep and not out[1].keep and not out[2].keep
    assert out[1].component == 0 and out[2].component == 0
    assert out[3].keep and not out[4].keep and out[4].component == 3
    assert out[5].keep and out[5].component == 5


def test_tfidf_rare_term_outranks_common(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="common common common zebra"),
        Row(doc_id=2, text="common common filler words"),
        Row(doc_id=3, text="common other filler tokens"),
    ])
    out = tfidf_top_terms(df, k_per_doc=1)
    top = {r.doc_id: r.term for r in out.collect()}
    # 'common' appears in every doc (df=3) — tf=3 keeps it on top for
    # doc 1, but its idf is the floor; the doc-unique 'zebra' must beat
    # any OTHER shared term for rank-1 in no doc but stay in doc 1's
    # top-3 with a higher score than 'common' would get at tf=1
    rows1 = {r.term: r.score for r in
             tfidf_top_terms(df, k_per_doc=4).where(F.col("doc_id") == 1).collect()}
    assert rows1["zebra"] > rows1["common"] / 3  # idf lifts the rare term
    assert top[1] in ("common", "zebra")


def test_unigram_lm_rare_tokens_score_higher(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="the the the the"),          # all-common
        Row(doc_id=2, text="xylophone quixotic zephyr"),  # all-rare
    ])
    out = {r.doc_id: r for r in unigram_lm_score(df).collect()}
    assert out[2].avg_nll > out[1].avg_nll
    assert out[2].ppl > out[1].ppl
    assert out[1].n_tokens == 4 and out[2].n_tokens == 3
    # ppl is exp of the (rounded) mean NLL
    assert math.isclose(out[1].ppl, round(math.exp(out[1].avg_nll), 4))


def test_unigram_lm_deterministic_under_repartition(documents):
    a = sorted(map(tuple, unigram_lm_score(documents).collect()))
    b = sorted(map(tuple, unigram_lm_score(documents.repartition(9)).collect()))
    assert a == b
