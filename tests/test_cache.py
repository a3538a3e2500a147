"""Session cache lifecycle (vector_spark.cache).

Round-4 finding: operator-internal persists (minhash signature tables)
and per-(session, sf_dir) plan memos had no eviction path, so a
long-lived session accumulated persisted RDDs + memoized lineage
unboundedly — reproduced as a driver GC death-spiral during a full
single-session test run. These tests pin the lifecycle contract:
persisted-RDD count returns to baseline after clear_caches(), memos are
emptied, the LRU bound caps registry growth, and an evicted query
rebuilds correctly (cold) afterwards.
"""
from __future__ import annotations

import pytest

from vector_spark import cache, clear_caches, persisted_rdd_count


@pytest.fixture(autouse=True)
def _clean_registry():
    clear_caches()
    yield
    clear_caches()


def test_persisted_rdd_count_returns_to_baseline(spark, documents):
    documents.count()  # materialize the fixture's (untracked) table cache
    baseline = persisted_rdd_count(spark)
    from vector_spark.dataops.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        documents, text_col="text", id_col="doc_id",
        num_hashes=16, bands=8, shingle_k=3, threshold=0.5,
    )
    n = pairs.count()
    assert n >= 0
    # the signature persist is internal — the caller never saw the handle,
    # only the registry can release it
    assert persisted_rdd_count(spark) > baseline
    freed = clear_caches(blocking=True)
    assert freed >= 1
    assert persisted_rdd_count(spark) == baseline


def test_memos_are_registered_and_cleared(spark):
    from vector_spark.plans import queries as q

    sf = "/root/testdata/sf0.001"
    df1 = q.q_minhash_lsh(spark, sf)
    assert q._MINHASH_MEMO  # memoized
    assert q.q_minhash_lsh(spark, sf) is df1  # warm re-serve is identity
    clear_caches()
    assert not q._MINHASH_MEMO and not q._DEDUP_MEMO
    # cold rebuild after eviction: new object, same answer shape
    df2 = q.q_minhash_lsh(spark, sf)
    assert df2 is not df1
    assert df2.columns == df1.columns


def test_lru_bound_caps_registry_growth(spark):
    baseline = persisted_rdd_count(spark)
    dfs = [
        spark.range(i + 1, numPartitions=1).toDF("v") for i in range(cache.MAX_PERSISTED + 3)
    ]
    for df in dfs:
        cache.track_persist(df).count()
    # registry holds at most MAX_PERSISTED; the overflow was unpersisted.
    # JVM-side unpersist of the evicted 3 is async (blocking=False), so
    # assert the registry bound (exact) and the JVM count (bounded).
    assert len(cache._PERSISTED) == cache.MAX_PERSISTED
    clear_caches(blocking=True)
    assert persisted_rdd_count(spark) == baseline


def test_track_persist_dedups_semantically_equal_plans(spark):
    """r12: rebuilding an operator re-persists the SAME logical plan;
    Spark's CacheManager keys cached data by canonicalized plan, so the
    duplicate registry entry shared one cache entry with the original
    and its eviction unpersisted blocks still in use. track_persist must
    return the already-tracked handle and refresh it to MRU instead."""
    base = spark.range(100, numPartitions=1).toDF("v")
    first = cache.track_persist(base.where("v % 2 = 0"))
    first.count()
    n_entries = len(cache._PERSISTED)
    # a fresh, semantically identical build dedups onto the tracked handle
    again = cache.track_persist(base.where("v % 2 = 0"))
    assert again is first
    assert len(cache._PERSISTED) == n_entries
    # dedup refreshes LRU position: fill the registry to one below the
    # bound with distinct plans, re-track the first plan, then overflow —
    # the refreshed entry must survive the eviction sweep
    for i in range(cache.MAX_PERSISTED - 1):
        cache.track_persist(spark.range(i + 2, numPartitions=1).toDF("w"))
    assert cache.track_persist(base.where("v % 2 = 0")) is first
    cache.track_persist(spark.range(999, numPartitions=1).toDF("z"))
    assert any(t is first for _, t in cache._PERSISTED.values())
    # a semantically DIFFERENT plan still gets its own entry
    other = cache.track_persist(base.where("v % 2 = 1"))
    assert other is not first


def test_clear_caches_is_idempotent_and_safe_when_empty():
    assert clear_caches() == 0
    assert clear_caches() == 0


def test_release_drops_registry_entry(spark):
    """A persist-then-drop loop (BPE fold chain) must free its LRU slot,
    not leave a stale handle that inflates clear_caches()'s count."""
    baseline = persisted_rdd_count(spark)
    df = cache.track_persist(spark.range(5, numPartitions=1).toDF("v"))
    df.count()
    assert cache.release(df) is True
    assert not any(t is df for _, t in cache._PERSISTED.values())
    assert clear_caches(blocking=True) == 0  # nothing left to free
    assert persisted_rdd_count(spark) == baseline
    # releasing an untracked DataFrame is safe and reports False
    assert cache.release(spark.range(1).toDF("v")) is False
