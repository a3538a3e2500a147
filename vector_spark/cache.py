"""Session cache lifecycle for long-lived Spark sessions.

A warm, always-on session (the 100 TB deployment model: one driver serving
many queries for days) accumulates three kinds of driver/executor state if
nothing evicts it:

- persisted DataFrames created INSIDE operators (e.g. the minhash signature
  table in ``dataops.dedup.minhash_lsh_pairs``) whose handle is never
  returned to the caller, so the caller *cannot* unpersist it;
- memoized result DataFrames (``plans.queries`` keeps per-(session, sf_dir)
  built plans so a repeat run re-serves the warm object instead of leaking
  a fresh persist per build);
- localCheckpoint block data pinned by those memoized references.

Individually each is justified; collectively a long-lived session grows
unboundedly — reproduced as a driver GC death-spiral during a full
single-session test run. This module is the missing lifecycle:

- :func:`track_persist` — persist a DataFrame AND record the handle in a
  bounded registry, so internal persists become evictable. The registry is
  LRU-bounded (:data:`MAX_PERSISTED`): inserting beyond the bound
  unpersists the oldest entry, so even a session that never calls
  :func:`clear_caches` has bounded persisted-RDD growth.
- :func:`register_memo` — register a memo dict (plan/DataFrame caches) for
  clearing.
- :func:`clear_caches` — evict everything: unpersist every tracked
  DataFrame and empty every registered memo. Safe to call at any time; the
  next query rebuilds (cold) and re-registers.
- :func:`persisted_rdd_count` — observability: how many RDDs the session
  currently holds persisted (the number ``clear_caches`` should return to
  baseline).

The reference engine ends every component with a shutdown/drain path
(``/root/reference/src/topology/running.rs`` — components are stopped and
their state dropped on reload); this is the Spark-session analog.
"""
from __future__ import annotations

import threading
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession

_LOCK = threading.RLock()

# insertion-ordered: key -> (semantic hash | None, persisted DataFrame
# handle), oldest first
_PERSISTED: "OrderedDict[int, tuple[int | None, DataFrame]]" = OrderedDict()
_NEXT_KEY = [0]

# memo dicts registered by plan/operator modules; cleared wholesale
_MEMOS: list[dict] = []

#: LRU bound on operator-internal persists. Each minhash signature table at
#: sf0.1 is ~10 MB; at 100 TB scale one entry can be much larger, so the
#: bound is deliberately small — eviction means recompute, not wrong answers.
MAX_PERSISTED = 8


def track_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + registry entry, LRU-bounded and
    SEMANTICALLY DEDUPLICATED.

    Use instead of a bare ``.persist()`` for intermediates whose handle
    does not escape to the caller. Returns the (persisted) DataFrame.

    Dedup (r12): operators that are not plan-memoized rebuild their
    internal persists on every call (the bench's min-of-N, any repeat
    query in a warm session), and Spark's CacheManager keys cached data
    by CANONICALIZED PLAN — so two registry entries for semantically
    equal plans share ONE cache entry, and evicting either handle
    unpersists the blocks the other still relies on. Measured on
    docs_text_near_dup at sf0.1: zero-steal warm runs alternated
    1.77 s / 3.3 s as repeated builds pushed duplicate handles through
    the 8-slot LRU and the eviction killed the live tf cache mid-use.
    Registering a semantically equal plan now refreshes the existing
    entry to MRU and returns the ORIGINAL tracked handle instead, so a
    warm re-serve stays warm and duplicate handles cannot evict
    genuinely distinct persists. Cold measurements are unaffected:
    :func:`clear_caches` empties the registry, and the first build
    after it persists fresh."""
    with _LOCK:
        try:
            h: int | None = df.semanticHash()
        except Exception:
            h = None  # unanalyzable / session gone: fall through, no dedup
        if h is not None:
            for key, (th, tracked) in reversed(list(_PERSISTED.items())):
                if th != h:
                    continue
                try:
                    same = df.sameSemantics(tracked)
                except Exception:
                    same = False  # stale session handle: treat as distinct
                if same:
                    _PERSISTED.move_to_end(key)
                    return tracked
        df = df.persist()
        _NEXT_KEY[0] += 1
        _PERSISTED[_NEXT_KEY[0]] = (h, df)
        while len(_PERSISTED) > MAX_PERSISTED:
            _, (_, old) = _PERSISTED.popitem(last=False)
            try:
                old.unpersist(blocking=False)
            except Exception:
                pass  # session may already be gone
        return df


def release(df: DataFrame) -> bool:
    """Unpersist *df* AND drop its registry entry.

    A bare ``df.unpersist()`` on a tracked DataFrame frees the blocks but
    leaves the stale handle occupying an LRU slot (hastening eviction of
    still-useful persists and inflating :func:`clear_caches`'s count).
    Operators that persist-then-drop inside a loop (the distributed BPE
    trainer's fold chain) must use this instead. Returns True if the
    handle was tracked."""
    with _LOCK:
        found = False
        for key, (_, tracked) in list(_PERSISTED.items()):
            if tracked is df:
                del _PERSISTED[key]
                found = True
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass
        return found


def register_memo(memo: dict) -> dict:
    """Register a memo dict so :func:`clear_caches` empties it. Returns
    the dict (usable as a decorator-ish inline registration)."""
    with _LOCK:
        # identity, not ==: two empty memo dicts compare equal
        if not any(m is memo for m in _MEMOS):
            _MEMOS.append(memo)
        return memo


def clear_caches(blocking: bool = False) -> int:
    """Evict all tracked persists and empty all registered memos.

    Returns the number of DataFrames unpersisted. Dropping the memo
    references also releases localCheckpoint lineage so the context
    cleaner can free those blocks.
    """
    with _LOCK:
        n = 0
        while _PERSISTED:
            _, (_, df) = _PERSISTED.popitem(last=False)
            try:
                df.unpersist(blocking=blocking)
                n += 1
            except Exception:
                pass
        for m in _MEMOS:
            m.clear()
        return n


def persisted_rdd_count(spark: SparkSession) -> int:
    """Number of RDDs the context currently holds persisted (JVM-side
    truth, includes ``.cache()`` done outside this registry)."""
    return spark.sparkContext._jsc.getPersistentRDDs().size()
