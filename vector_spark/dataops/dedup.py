"""Document deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the point of each variant):
- exact: hash-groupBy on a content digest — one shuffle of (digest, id),
  never of the document bodies. At 100 TB, project digest+id FIRST so the
  shuffle moves ~32 bytes/doc.
- minhash_lsh: shingle → K minhashes → B bands; candidate pairs come from
  a self-join on (band, band_hash) buckets, so cost is ~sum of bucket
  sizes squared, not N². Signatures are computed with xxhash64 (JVM,
  codegen) — no Python in the hot path.
- simhash: 64-bit near-dup fingerprint; hamming-ball candidates via
  block-permutation buckets (4 blocks of 16 bits → dups within hamming
  distance 3 share ≥1 block).
- ngram_jaccard: exact Jaccard on token n-gram sets for candidate pairs —
  the verifier stage after LSH blocking (or standalone with a cheap
  blocking key at small scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_spark import cache

# large Mersenne prime for minhash permutations
_MERSENNE = (1 << 61) - 1


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Exact dedup on an md5 digest of (optionally normalized) text.

    Returns one row per distinct content: keeper id (min id), dup count.
    """
    t = F.col(text_col)
    if normalize:
        t = F.lower(F.regexp_replace(t, r"\s+", " "))
    digest = F.md5(t)
    return (
        df.select(digest.alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _shingles_from_words(words: Column, k: int) -> Column:
    """Word k-shingles from an ALREADY-MATERIALIZED words-array column.

    ``words`` must be a bound column (projected in a previous select), not
    an inline `split(...)` expression: a lambda that closes over a compound
    expression re-evaluates it per array element (no subexpression
    elimination inside `transform`), turning shingling O(n²). Materializing
    the array first makes this a plain O(n·k) pass — measured 10× faster.
    """
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - F.lit(k), F.lit(0)))
    return F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, k), " "))


def _exploded_shingles(
    df: DataFrame,
    text_col: str,
    k: int,
    keep: list[str],
    distinct: bool = True,
    out: str = "shingle",
) -> DataFrame:
    """(keep..., shingle) — one row per (distinct) word k-shingle."""
    base = df.select(
        *keep, F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_w")
    )
    sh = _shingles_from_words(F.col("_w"), k)
    if distinct:
        sh = F.array_distinct(sh)
    return base.select(*keep, F.explode(sh).alias(out))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>) — minhash over word-shingle xxhash64 values.

    Permutations are (a_i * h + b_i) mod M (universal hashing), all Column
    arithmetic — no UDF. Shape: explode shingles once, then ONE hash-agg
    with `num_hashes` `min()` columns (map-side partial combine shrinks the
    shuffle to one 64-long row per doc per partition). The alternative —
    `num_hashes` × `array_min(transform(...))` in a single projection —
    re-walks the shingle array per permutation and overflows whole-stage
    codegen's method-size budget, falling back to interpreted eval.
    """
    import random

    rng = random.Random(seed)
    abs_ = [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE)) for _ in range(num_hashes)]
    # distinct=False: duplicates can't change a min, and skipping the
    # per-array dedup is cheaper than the rows it saves downstream
    exploded = _exploded_shingles(
        df, text_col, shingle_k, keep=[id_col], distinct=False, out="_sh"
    ).select(
        id_col,
        # fold into [0, 2^31) so a*h + b stays in signed-64 range
        F.pmod(F.xxhash64("_sh"), F.lit(2147483647)).alias("_h"),
    )
    # each agg as ONE F.expr (single JVM-side parse) instead of a tree of
    # ~6 Py4J calls: with 64 permutations the Column-by-Column form spent
    # multiple seconds of DRIVER time just constructing the plan (the
    # "cold constant" flagged two rounds running). `%` not pmod — both
    # operands are non-negative here.
    aggs = [
        F.expr(
            f"min((_h * {a % 2147483647}L + {b % _MERSENNE}L) % {_MERSENNE}L)"
        ).alias(f"_m{i}")
        for i, (a, b) in enumerate(abs_)
    ]
    g = exploded.groupBy(id_col).agg(*aggs)
    names = ",".join(f"_m{i}" for i in range(num_hashes))
    return g.select(F.col(id_col), F.expr(f"array({names})").alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
    exact_verify: bool = False,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH, verified by signature overlap.

    Output: (id_a, id_b, est_jaccard) with id_a < id_b, est_jaccard =
    fraction of matching minhashes (unbiased Jaccard estimate) >= threshold.

    exact_verify=True replaces the signature estimate with the TRUE shingle
    Jaccard computed on the candidate set only (the standard LSH→exact-verify
    dedup pipeline): output (id_a, id_b, jaccard). Cost stays bounded by the
    candidate count, not N² — this is the oracle-checkable form (equal to
    the all-pairs exact answer whenever LSH recall is 1, which the gate
    verifies).
    """
    rows_per_band = num_hashes // bands
    # persist: the signature table feeds the bucket self-join AND the two
    # verify joins below; without it Spark re-runs the whole
    # shingle→signature pipeline for every branch. At cluster scale this is
    # the standard "materialize signatures once, then block" shape
    # (persist here; checkpoint to storage for very large corpora).
    # track_persist, not bare .persist(): the handle never escapes this
    # function, so the session cache registry must own its lifecycle
    # (LRU-bounded + clear_caches) or a long-lived session leaks one
    # signature table per build — the round-4 GC-wedge finding.
    sigs = cache.track_persist(
        minhash_signatures(df, text_col, id_col, num_hashes, shingle_k, seed)
    )
    # blocking table carries ONLY (id, band, bucket) — the self-join and
    # the pair-dedup shuffle move 24-byte rows, never the 64-long sigs.
    # One F.expr for all bands (same driver-constant rationale as above).
    band_structs = ",".join(
        f"struct({b} as band, xxhash64(array_join(transform("
        f"slice(sig, {b * rows_per_band + 1}, {rows_per_band}),"
        f" x -> cast(x as string)), ',')) as bucket)"
        for b in range(bands)
    )
    buckets = sigs.select(
        F.col(id_col),
        F.explode(F.expr(f"array({band_structs})")).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    if exact_verify:
        # true Jaccard on candidates only: shingle-set intersection via an
        # equi-join restricted to candidate pairs, sizes from per-doc
        # counts. The candidate set is tiny (LSH output), so AQE
        # BROADCASTS it into both shingle joins — neither shingle-level
        # join shuffles the exploded table. A round-4 rewrite to
        # semi-join + collect_set + array_intersect was measured
        # INTERLEAVED against this shape and REVERTED: 2.34 s vs 1.03 s
        # warm at sf0.1 — packing per-doc shingle arrays costs more than
        # the broadcast-driven count join, and this shape's only wide
        # stage (the shingle explode) is shared by both.
        sh = _exploded_shingles(df, text_col, shingle_k, keep=[id_col], distinct=True)
        sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
        sha = sh.select(F.col(id_col).alias("id_a"), "shingle")
        shb = sh.select(F.col(id_col).alias("id_b"), "shingle")
        inter = (
            cand.join(sha, "id_a")
            .join(shb, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        za = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
        zb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
        return (
            inter.join(za, "id_a")
            .join(zb, "id_b")
            .withColumn(
                "jaccard",
                F.round(
                    F.col("inter")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                    6,
                ),
            )
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    # verify stage: fetch sigs for the (much smaller) candidate set
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        / F.lit(num_hashes)
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """SimHash over word tokens: bit i = sign of sum over tokens of
    (token_hash bit i ? +1 : -1). Pure Column program.

    Shape: tokens → explode bit indices → two-level hash agg
    ((id, bit) partial sums, then one sum per id). The alternative — one
    groupBy with `bits` independent sum(when(...)) columns — overflows
    whole-stage codegen's method-size budget (the r1 bench showed 3 s at
    sf0.1 from exactly that); the exploded form keeps every stage inside
    codegen and map-side combine caps the shuffle at docs×bits tiny rows.

    portable=True hashes tokens with md5-low-60-bits (reproducible in any
    engine with md5 — the DuckDB-oracle-checkable form, bits capped at 60);
    default is xxhash64 (faster, JVM-only).
    """
    if portable:
        bits = min(bits, 60)
        h = F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64("w")
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w"),
    ).select(F.col(id_col), h.alias("h"))
    contrib = toks.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
        F.col("h"),
    ).select(
        id_col,
        "b",
        F.when(F.expr("shiftrightunsigned(h, b) & 1") == 1, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("c"),
    )
    bit_sums = contrib.groupBy(id_col, "b").agg(F.sum("c").alias("s"))
    # two's complement: the top bit contributes -2^63 in a signed long
    weight = F.when(F.col("b") == 63, F.lit(-(1 << 63))).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), b)")
    )
    return (
        bit_sums.groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("s") > 0, weight).otherwise(F.lit(0)))
            .cast("long")
            .alias("simhash")
        )
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by simhash: split the 64-bit fingerprint into
    ``max_hamming + 1`` blocks (pigeonhole: any pair within the hamming
    budget shares at least one exact block) and self-join on block buckets."""
    n_blocks = min(max_hamming + 1, 16)
    bounds = [i * 64 // n_blocks for i in range(n_blocks)] + [64]
    fps = simhash(df, text_col, id_col)
    blocked = fps.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("simhash", bounds[i])
                        .bitwiseAND(F.lit((1 << (bounds[i + 1] - bounds[i])) - 1))
                        .alias("key"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", "bk.blk", "bk.key")
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: list[str] | None = None,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard over word n-gram sets for pairs sharing a blocking key.

    |A∩B| via an equi-join on exploded distinct shingles (shuffle moves
    (shingle, id) pairs only), |A|,|B| from per-doc counts, union by
    inclusion–exclusion. ``block_cols`` bounds the candidate space; pass
    None only at small scale (falls back to a shared-shingle join which is
    exact but hot-shingle-sensitive).
    """
    sh = _exploded_shingles(
        df, text_col, n, keep=[id_col, *(block_cols or [])], distinct=True
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    join_cond = [F.col("x.shingle") == F.col("y.shingle")]
    if block_cols:
        join_cond += [F.col(f"x.{c}") == F.col(f"y.{c}") for c in block_cols]
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), join_cond)
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .groupBy(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---- connected components over near-dup pairs ---------------------------

def _ckpt_fn(df_any: DataFrame, checkpoint_dir: str | None):
    """Round-boundary materialization. Durability contract:

    - checkpoint_dir=None → localCheckpoint: blocks live on EXECUTORS,
      non-replicated — fine single-node / for short jobs, but at real
      scale an executor loss severs the lineage escape hatch mid-run.
    - checkpoint_dir=<fault-tolerant path> → reliable checkpoint: rounds
      persist to the shared filesystem (HDFS/S3); an executor loss
      recomputes at most one round. This is the 100 TB setting.
    """
    if checkpoint_dir is not None:
        sc = df_any.sparkSession.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            sc.setCheckpointDir(checkpoint_dir)
        return df_any.checkpoint(eager=True)
    return df_any.localCheckpoint(eager=True)


def _star_components(
    edges: DataFrame, max_iter: int, checkpoint_dir: str | None
) -> DataFrame:
    """Alternating large-star/small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): converges in
    O(log^2 n) rounds regardless of diameter — the choice for
    CHAIN-shaped clusters where label propagation needs diameter rounds.

    large-star: every node points its LARGER neighbors at the min of its
    neighborhood (incl. itself); small-star: same for smaller-or-equal
    neighbors. Both preserve connectivity; the fixpoint is a star forest
    whose centers are component minima."""

    def star(E: DataFrame, large: bool) -> DataFrame:
        nb = E.union(
            E.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mins = nb.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        j = nb.join(mins, "src")
        if large:
            out = j.where(F.col("dst") > F.col("src")).select(
                F.col("dst").alias("src"), F.col("m").alias("dst")
            )
        else:
            out = (
                j.where(F.col("dst") < F.col("src"))
                .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
                .union(mins.select(F.col("src"), F.col("m").alias("dst")))
            )
        return out.where(F.col("src") != F.col("dst")).distinct()

    # ids = every vertex (incl. self-loop-only ones); the star iteration
    # works on canonical src<dst edges
    all_ids = edges.select("src").distinct()
    E = edges.where(F.col("src") < F.col("dst")).distinct()
    prev_sig = None
    for _ in range(max_iter):
        E = _ckpt_fn(star(star(E, large=True), large=False), checkpoint_dir)
        # convergence = edge set stable: one agg action per round over the
        # checkpointed (already materialized) round result
        sig = E.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-insensitive, overflow-free under ANSI mode
            # (edges are distinct, so xor-cancellation can't collide)
            F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # star forest → labels: each node's component is the min of itself
    # and its (single, center) neighbor; centers label themselves
    nb = E.union(E.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    comp = nb.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("component")
    )
    return all_ids.join(comp, "src", "left").select(
        F.col("src").alias("id"),
        F.coalesce("component", "src").alias("component"),
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    algorithm: str = "label",
    local_threshold: int = 100_000,
) -> DataFrame:
    """Union-find over a pair list — the canonical step between near-dup
    PAIR generation (minhash/simhash/embedding blocking) and dedup
    DECISIONS: transitively-linked docs form one duplicate cluster, from
    which one canonical survivor is kept.

    algorithm="label" (default): frontier-optimized label propagation —
    every vertex takes the min of its label and its neighbors'; after the
    first round only labels that CHANGED last round propagate (the BFS
    frontier), so late rounds shuffle a shrinking fraction of the graph.
    Rounds = cluster diameter — right for near-dup graphs, whose clusters
    are dense and shallow (pairs share content).

    algorithm="star": alternating large-star/small-star, O(log^2 n)
    rounds independent of diameter — right for chain-shaped graphs.

    checkpoint_dir: see _ckpt_fn — pass a fault-tolerant path at scale so
    per-round materialization survives executor loss.

    local_threshold: pair count at-or-below which the (already
    materialized) pair list is solved with a driver-side union-find
    instead of iterative cluster rounds — a graph this small costs more
    in per-round scheduling than compute (measured at sf0.1: 256 edges
    took 1.6 s of round latency, ~0 s locally). The gate is a
    limit(threshold+1) probe-collect over the REAL materialized pairs,
    not a guess, so a 100 TB run with billions of pairs always takes the
    distributed path (the probe stops after ~one partition); the result
    is broadcast-hinted since its size is proven bounded. Set 0 to
    disable.

    Returns (id, component) with component = min id reachable."""
    a, b = F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    # materialize the pair list ONCE, then derive both edge directions
    # from the materialized copy: a union of two selects straight off
    # `pairs` executes the upstream pair-producing pipeline (e.g. the
    # MinHash LSH self-join) TWICE in one job (no cross-branch plan
    # reuse) — measured 3.9 s → 2.0 s at sf0.1; at corpus scale it
    # halves the single heaviest stage. The second checkpoint (the
    # distinct'd bidirectional list every round joins) reads only the
    # materialized pairs, so it costs one small shuffle.
    #
    # Materialization mechanism (r11 optimization round): a registry
    # persist, not an EAGER localCheckpoint, when no checkpoint_dir is
    # given. Both guarantee the upstream pipeline executes once (the
    # first consumer fills the cache; every later consumer — the probe,
    # the edge build, the label rounds — reads the materialized copy),
    # but the eager checkpoint cost one extra driver-blocking job per
    # call before any consumer could run, and its blocks were pinned
    # outside the cache registry's LRU bound. The persist is lazy (the
    # small-graph probe below is usually the materializing consumer),
    # evictable (eviction = recompute, not wrong answers), and lets a
    # warm session re-serve the pair list across rebuilds of the same
    # plan instead of re-running the pairwise join every time
    # (interleaved A/B, semantic_dedup consumer at sf0.1, steal-quiet:
    # eager-checkpoint 4.1-4.7 s/run warm vs persist 2.0-2.1 s/run).
    # With a checkpoint_dir the reliable checkpoint stays: that mode
    # exists for fault tolerance at scale, which a cache entry with
    # recompute-lineage already provides differently.
    if checkpoint_dir is None:
        from .. import cache as _cache_reg

        mat = _cache_reg.track_persist(pairs.select(a, b))
    else:
        mat = _ckpt_fn(pairs.select(a, b), checkpoint_dir)
    if algorithm not in ("label", "star"):
        raise ValueError(f"algorithm must be label|star: {algorithm!r}")
    if local_threshold:
        # probe-collect the materialized pairs with limit(threshold+1):
        # one cheap driver job answers "is the graph small?" AND delivers
        # the edge list when it is. Union-find needs neither direction nor
        # distinctness, so the small path skips the bidirectional-distinct
        # checkpoint and its shuffle outright (4 driver-blocking jobs →
        # 2). On the large path the probe stops after ~one partition of
        # the checkpointed RDD — it replaces the old full edges.count().
        probe = mat.limit(local_threshold + 1).collect()
        if len(probe) <= local_threshold:
            parent: dict = {}

            def find(x):
                while parent.setdefault(x, x) != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for r in probe:
                ra, rb = find(r["src"]), find(r["dst"])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            comp_min: dict = {}
            for x in parent:
                root = find(x)
                comp_min[root] = min(comp_min.get(root, x), x)
            out = pairs.sparkSession.createDataFrame(
                [(x, comp_min[find(x)]) for x in parent],
                schema=mat.select(
                    F.col("src").alias("id"), F.col("dst").alias("component")
                ).schema,
            )
            return F.broadcast(out)
    edges = _ckpt_fn(
        mat.union(mat.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct(),
        checkpoint_dir,
    )
    if algorithm == "star":
        return _star_components(edges, max_iter, checkpoint_dir)
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    frontier = labels  # labels that changed last round (round 1: all)
    for _ in range(max_iter):
        # neighbor labels: for each edge dst, the src's current label —
        # joined against the FRONTIER only, not the full label table
        neighbor = (
            edges.join(frontier, edges.src == frontier.id)
            .groupBy(edges.dst.alias("id"))
            .agg(F.min("component").alias("nbr"))
        )
        updated = _ckpt_fn(
            labels.join(neighbor, "id", "left").select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr", "component")
                ).alias("new_component"),
                "component",
            ),
            # checkpoint FIRST (one job materializes the round), then the
            # convergence count scans the in-memory result — the previous
            # count-then-checkpoint order executed the same join twice per
            # round (measured: ~2× the per-round cost)
            checkpoint_dir,
        )
        changed_rows = updated.where(
            F.col("new_component") != F.col("component")
        ).select("id", F.col("new_component").alias("component"))
        changed = changed_rows.count()
        labels = updated.select(
            "id", F.col("new_component").alias("component")
        )
        frontier = changed_rows
        if changed == 0:
            break
    return labels


def dedup_decisions(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs → per-document keep/drop decisions: cluster with
    connected_components, keep the MIN id of each cluster (deterministic
    canonical pick), mark the rest as duplicates of it. Documents in no
    pair keep themselves."""
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    return (
        docs.select(F.col(id_col))
        .join(comp, docs[id_col] == comp.id, "left")
        .select(
            docs[id_col],
            F.coalesce(comp.component, docs[id_col]).alias("component"),
        )
        .withColumn("keep", F.col(id_col) == F.col("component"))
    )


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Near-dup pairs → keep the BEST copy of each duplicate cluster —
    the policy real pipelines use instead of keep-min-id (when a page is
    crawled five times, keep the longest/highest-quality capture, drop
    the truncated ones). Clusters come from connected_components; within
    a cluster the member with the highest *score_col* survives, id
    ascending as the deterministic tiebreak. Documents in no pair keep
    themselves. Returns (id, component, <score_col>, keep).

    Scale shape: components as in :func:`dedup_decisions`; the winner
    pick is one (component)-keyed aggregation over the (tiny, clustered)
    membership via min(struct(-score, id)) — never a corpus-wide window
    (only documents IN a component enter it; singletons bypass with
    keep=true)."""
    comp = connected_components(
        pairs, id_a=id_a, id_b=id_b, checkpoint_dir=checkpoint_dir
    )
    # two corpus scans total (was three): scan 1 builds the per-component
    # winner table from members only (inner join against the component
    # labels prunes the scan to member rows); scan 2 emits every doc once
    # with two LEFT joins — component label, then that component's
    # winner. keep = no component (singleton keeps itself) or being the
    # winner. Row-for-row identical to the old members-join + anti-join +
    # union assembly, without the union or the third scan.
    members = (
        docs.select(F.col(id_col), F.col(score_col))
        .join(comp, docs[id_col] == comp.id, "inner")
        .select(
            F.col(id_col).alias("_mid"),
            F.col(score_col).alias("_sc"),
            "component",
        )
    )
    winners = members.groupBy("component").agg(
        F.min(
            F.struct((-F.col("_sc")).alias("_neg"), F.col("_mid"))
        ).alias("_w")
    ).select(F.col("component").alias("_wc"), F.col("_w._mid").alias("_best"))
    return (
        docs.select(F.col(id_col), F.col(score_col))
        .join(comp, docs[id_col] == comp.id, "left")
        .join(winners, F.col("component") == F.col("_wc"), "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("component"),
            F.col(score_col),
            F.when(F.col("component").isNull(), F.lit(True))
            .otherwise(F.col(id_col) == F.col("_best"))
            .alias("keep"),
        )
    )


def remove_duplicate_paragraphs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 1,
    mode: str = "keep_first",
) -> DataFrame:
    """Corpus-level exact paragraph deduplication (the paragraph-hash
    pass of Lee et al. 2021 "Deduplicating Training Data..." §3, the
    ExactSubstr companion used by C4/FineWeb-style pipelines):
    paragraphs (split on blank lines) that occur more than once ACROSS
    the corpus are removed; ``keep_first`` keeps the one earliest
    occurrence (order = (doc_id, position)), ``drop_all`` removes every
    copy. Documents are reassembled from their surviving paragraphs in
    original order; docs whose every paragraph vanishes come back with
    empty text (the caller decides whether to drop them). Paragraphs
    shorter than ``min_chars`` after trimming are never treated as
    duplicates (boilerplate one-liners like "***" are line-filter
    territory, not dedup).

    Scale shape: posexplode → ONE shuffle keyed by the paragraph hash
    (the min-occurrence aggregate and the membership join co-partition
    on that key, so Catalyst plans a single exchange per side, no
    corpus-wide window); reassembly is a per-doc groupBy whose groups
    are bounded by document size. At 100 TB the hash key is as uniform
    as the text itself — no hot keys by construction (identical
    paragraphs ARE the group, and their count is what we're measuring).

    Returns (id, text, n_paragraphs, n_removed).
    """
    if mode not in ("keep_first", "drop_all"):
        raise ValueError(f"bad mode: {mode}")
    paras = (
        docs.select(
            F.col(id_col),
            F.posexplode(
                F.split(F.col(text_col), r"\n\s*\n")
            ).alias("_idx", "_para"),
        )
        .withColumn("_trimmed", F.trim("_para"))
        .where(F.length("_trimmed") > 0)
        .withColumn("_h", F.md5(F.col("_trimmed")))
    )
    occurrences = paras.groupBy("_h").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(F.struct(F.col(id_col), F.col("_idx"))).alias("_first"),
    )
    joined = paras.join(occurrences, "_h")
    if mode == "keep_first":
        keep = (F.col("_n") == 1) | (
            (F.col("_first")[id_col] == F.col(id_col))
            & (F.col("_first._idx") == F.col("_idx"))
        )
    else:
        keep = F.col("_n") == 1
    marked = joined.withColumn("_keep", keep)
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_paragraphs"),
            F.sum(F.when(~F.col("_keep"), 1).otherwise(0)).cast(
                "int"
            ).alias("n_removed"),
            F.concat_ws(
                "\n\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep"),
                                F.struct(
                                    F.col("_idx"), F.col("_trimmed")
                                ),
                            )
                        )
                    ),
                    lambda s: s["_trimmed"],
                ),
            ).alias("text"),
        )
        .withColumn("n_paragraphs", F.col("n_paragraphs").cast("int"))
    )
