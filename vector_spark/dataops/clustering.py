"""Distributed k-means (Lloyd's) over embedding columns + SemDeDup-style
semantic deduplication.

Why this exists: the IVF coarse quantizer (`similarity.ivf_topk`) trains on
a bounded driver-side sample — the right call when centroids only need to
be *good*, but a 100 TB embedding corpus also needs clustering as a
first-class op (semantic dedup à la SemDeDup, Abbas et al. 2023
arXiv:2303.09540; corpus cartography; stratified curation by cluster).
This module is the cluster-scale path:

- **Assignment** is a pure-Column argmin over k squared-distance
  expressions — whole-stage codegen, no Python, no shuffle (the centroid
  list is a broadcast-sized plan literal, exactly how a small dim table
  would be broadcast).
- **Centroid update** is posexplode(vec) → groupBy(cluster, dim).avg —
  ONE shuffle per Lloyd round whose map-side partial aggregation reduces
  every partition to ≤ k×dim rows before the exchange (the classic
  per-partition partial-sum pattern, expressed declaratively so Tungsten
  runs it). The k×dim result (e.g. 8×64) collects to the driver to become
  the next round's literals — bounded by contract, never by data size.
- **Determinism / engine portability**: init = the k lowest-id vectors;
  every distance and every centroid coordinate is rounded to 6 decimals
  (ties broken by centroid id), so the whole fit is reproducible across
  partitionings AND across engines — DuckDB replays the identical
  computation in SQL, which is what lets the driver VALUE-oracle an
  iterative clustering algorithm (`plans/queries.py` embeddings_kmeans).

Reference basis: Lloyd's algorithm (public); SemDeDup (public preprint).
The reference engine has no clustering op — this is part of the
training-data-pipeline surface the engine adds on top of Vector parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.dataops.similarity import _dot, _norm

#: rounding applied to distances and centroid coordinates — coarse enough
#: to absorb float-summation-order noise (~1e-13) across engines and
#: partition layouts, fine enough that distinct centroids never collide.
_ROUND = 6


def _dlit(x: float) -> str:
    """SQL double literal for x (repr roundtrips the IEEE value; the D
    suffix keeps Spark from parsing plain decimals as DECIMAL). Guard:
    repr of a non-finite value would produce `infD`/`nanD`, which is not
    valid Spark SQL — unreachable for means of finite vectors, but a
    poisoned input should fail with a clear message, not a parse error."""
    x = float(x)
    if x != x or x in (float("inf"), float("-inf")):
        raise ValueError(f"non-finite centroid value {x!r}")
    return f"{x!r}D"


def _centroid_lit(c: list[float]) -> Column:
    # ONE F.expr call instead of len(c) F.lit py4j round-trips: the plan
    # is the identical array-of-double-literals, but building it costs a
    # single JVM call. At k=8 × dim=64 the per-element form spent ~0.5 s
    # of pure driver plan construction per assignment build (×3 builds
    # per kmeans query); the expr-string form is ~milliseconds.
    return F.expr(
        "array(" + ",".join(_dlit(round(float(x), _ROUND)) for x in c) + ")"
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Nearest-centroid id per row — pure Column, scan-only.

    Distance uses the expanded form d = v·v − 2·v·c + c·c (one fold per
    dot product); each d is rounded before the argmin and ties break on
    centroid id, so assignment is bit-stable under any execution order.

    Codegen shape: the k distances are ONE indexed ``transform`` over a
    2-D centroid array literal — a single fold chain the planner
    compiles once — not k unrolled fold expressions (measured: the
    unrolled form's analysis+codegen dominated wall time at small scale
    and grows O(k·dim) in expression-tree size)."""
    # ONE F.expr call for the whole scoring expression: the lambda
    # Column API (transform/zip_with/aggregate builders) costs a py4j
    # round-trip per node — measured 0.15-0.25 s of driver plan build
    # per assignment, paid 3-4x per kmeans query (each fit iteration +
    # the final assignment). The SQL parser yields the identical
    # analyzed expression in one call (same fix as _centroid_lit).
    cents = (
        "array("
        + ",".join(
            "array(" + ",".join(_dlit(round(float(x), _ROUND)) for x in c) + ")"
            for c in centroids
        )
        + ")"
    )
    cc = (
        "array("
        + ",".join(
            _dlit(round(float(sum(x * x for x in c)), _ROUND))
            for c in centroids
        )
        + ")"
    )
    v = f"transform({vec_col}, x -> cast(x as double))"
    vv = f"aggregate(zip_with({v}, {v}, (x, y) -> x * y), 0.0D, (acc, z) -> acc + z)"
    dot_vc = f"aggregate(zip_with({v}, cent, (x, y) -> x * y), 0.0D, (acc, z) -> acc + z)"
    scored = (
        f"transform({cents}, (cent, i) -> named_struct("
        f"'d', round({vv} - 2.0D * {dot_vc} + {cc}[i], {_ROUND}), 'cid', i))"
    )
    return df.withColumn(
        out_col, F.expr(f"cast(array_sort({scored})[0].cid as int)")
    )


def kmeans_fit(
    df: DataFrame,
    k: int,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Distributed Lloyd's fit; returns the centroid list (k × dim floats,
    rounded). Init = the k lowest-id vectors (deterministic, no RNG — the
    id order is content of the dataset, so reruns and other engines agree).

    Cost model per round: one corpus scan (assignment fused into it) + one
    partially-aggregated shuffle of ≤ k×dim rows per map task + a k×dim
    collect. Rounds are bounded by ``iters``; an empty cluster keeps its
    previous centroid (standard Lloyd's degenerate-case handling)."""
    init_rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    centroids = [
        [round(float(x), _ROUND) for x in r[vec_col]] for r in init_rows
    ]
    for _ in range(iters):
        assigned = assign_clusters(df, centroids, vec_col=vec_col)
        per_dim = (
            assigned.select(
                "cluster",
                F.posexplode(
                    F.transform(F.col(vec_col), lambda x: x.cast("double"))
                ).alias("dim", "val"),
            )
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = {c: list(cent) for c, cent in enumerate(centroids)}
        for r in per_dim:
            new[r["cluster"]][r["dim"]] = round(float(r["m"]), _ROUND)
        centroids = [new[c] for c in range(k)]
    return centroids


def kmeans_summary(
    df: DataFrame,
    k: int,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Fit + final assignment, reported as one row per cluster:
    (cluster, n, centroid_norm). The oracle-friendly face of the fit."""
    centroids = kmeans_fit(df, k, iters=iters, vec_col=vec_col, id_col=id_col)
    assigned = assign_clusters(df, centroids, vec_col=vec_col)
    norms = {
        i: round(sum(x * x for x in c) ** 0.5, _ROUND)
        for i, c in enumerate(centroids)
    }
    norm_col = F.expr(
        "array(" + ",".join(_dlit(norms[i]) for i in range(k)) + ")"
    )[F.col("cluster")]
    return (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("centroid_norm", norm_col)
    )


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means the embedding space, find
    near-duplicate pairs ONLY within clusters, keep one representative per
    connected group. Returns (id, cluster, component, keep).

    Scale shape: the pairwise stage is the quadratic hazard, and
    clustering is the blocker that bounds it — the self-join shuffles on
    `cluster`, so each task compares one cluster's members (n²/k per
    cluster on balanced data) instead of the corpus². Components reuse
    :func:`vector_spark.dataops.dedup.connected_components` (frontier
    label propagation / alternating star, counted-small graphs solved
    driver-side and broadcast).

    NOTE an accepted semantic delta vs exact near-dup: a true duplicate
    pair split across cluster boundaries is missed — that is SemDeDup's
    published trade (recall for n²→n²/k cost), not an implementation gap;
    the exact arm stays available via `similarity.cosine_near_dup_pairs`.
    """
    from vector_spark import cache
    from vector_spark.dataops.dedup import connected_components

    centroids = kmeans_fit(df, k, iters=iters, vec_col=vec_col, id_col=id_col)
    # Hoist each vector's norm out of the pairwise stage: sqrt(Σv²) is
    # computed ONCE per vector here with the exact fold cosine_sim uses,
    # so cos(a,b) = dot(a,b)/(na·nb) below is bit-identical to calling
    # cosine_sim per pair while doing a third of the per-pair fold work.
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # persisted (registry-tracked): referenced by both sides of the
    # pairwise self-join AND the final id/cluster projection — without it
    # the argmin assignment scan re-executes per consumer and per
    # label-propagation round inside connected_components.
    assigned = cache.track_persist(
        assign_clusters(df, centroids, vec_col=vec_col).select(
            F.col(id_col).alias("id"),
            "cluster",
            vd.alias("v"),
            _norm(vd).alias("nrm"),
        )
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    pairs = (
        a.join(b, on="cluster")
        .where(F.col("a.id") < F.col("b.id"))
        .where(
            F.round(
                _dot(F.col("a.v"), F.col("b.v"))
                / (F.col("a.nrm") * F.col("b.nrm")),
                _ROUND,
            )
            >= threshold
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    # no persist needed here: connected_components materializes the pair
    # list into a localCheckpoint as its FIRST step and reads only that
    # copy afterwards (probe-collect on the small path, edge build on the
    # large one) — the cluster-blocked pairwise join executes exactly
    # once either way. A persist on top was pure duplicate storage.
    comp = connected_components(
        pairs, checkpoint_dir=checkpoint_dir
    )  # (id, component)
    return (
        assigned.select("id", "cluster")
        .join(comp, "id", "left")
        .select(
            "id",
            "cluster",
            F.coalesce("component", "id").alias("component"),
            (F.coalesce("component", "id") == F.col("id")).alias("keep"),
        )
    )
