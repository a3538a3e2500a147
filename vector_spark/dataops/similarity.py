"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k of corpus vectors per query vector.
  The dot product is a Column expression (zip_with + aggregate) — stays in
  codegen, no Python. Queries are broadcast (they're the small side); the
  corpus is scanned once. At 100 TB this is the always-correct baseline
  and the verifier for the approximate path.
- lsh_topk: random-hyperplane (sign) LSH bucketing — each vector hashed to
  B bucket keys; candidates = corpus vectors sharing a bucket with the
  query; exact cosine re-rank inside buckets. Probe cost ~ bucket sizes,
  not corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

import math

_KNUTH = 2654435761
_MOD = 2147483648


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns, computed in double."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int | None = 6,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cosine, rank), self-matches
    excluded. Ties broken by neighbor id for determinism."""
    # L2 norms are per-vector, not per-pair: compute them in the pre-join
    # projections (once per row) so the |corpus|×|queries| join evaluates
    # only the dot product — 3× fewer array traversals in the hot loop.
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        vd.alias("_qvec"),
        _norm(vd).alias("_qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        vd.alias("_cvec"),
        _norm(vd).alias("_cnorm"),
    )
    sim = _dot(F.col("_qvec"), F.col("_cvec")) / (F.col("_qnorm") * F.col("_cnorm"))
    if round_decimals is not None:
        sim = F.round(sim, round_decimals)
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket key (one int per vector for this plane set)."""
    key = F.lit(0)
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        s = _dot(F.transform(vec, lambda x: x.cast("double")), arr)
        key = key + F.when(s > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return key


def _planes_row_df(spark, tables: "list[list[list[float]]]"):
    """All hyperplane tables as ONE broadcast row — the plan stays a few
    expressions regardless of n_tables × n_planes × dim (the literal form
    costs seconds of py4j plan construction at 48×4×64; see the same fix
    in pq_topk's codebook)."""
    return spark.createDataFrame(
        [([[list(map(float, p)) for p in t] for t in tables],)],
        "pl array<array<array<double>>>",
    )


def _bucket_structs(pl: Column, vec: Column) -> Column:
    """array<struct<tbl:int, bkt:string>> — every table's sign-LSH bucket
    for `vec` in one higher-order pass over the planes column. The bucket
    key is the sign bit-string (identity is all that bucketing needs)."""
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda p, q: p * q), F.lit(0.0), lambda s, x: s + x
    )
    return F.transform(
        pl,
        lambda planes, t: F.struct(
            t.cast("int").alias("tbl"),
            F.concat_ws(
                "",
                F.transform(
                    planes,
                    lambda p: F.when(dot(vec, p) > 0, "1").otherwise("0"),
                ),
            ).alias("bkt"),
        ),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_tables: int = 8,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH + exact re-rank in buckets."""
    tables = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    pl_df = _planes_row_df(corpus.sparkSession, tables)
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def bucketed(df: DataFrame, idname: str) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias(idname),
                vd.alias(f"_{idname}_vec"),
            )
            .join(F.broadcast(pl_df))
            .select(
                idname,
                f"_{idname}_vec",
                F.explode(
                    _bucket_structs(F.col("pl"), F.col(f"_{idname}_vec"))
                ).alias("tb"),
            )
            .select(idname, f"_{idname}_vec", "tb.tbl", "tb.bkt")
        )

    cb = bucketed(corpus, "neighbor_id")
    qb = bucketed(queries, "query_id")
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bkt"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = F.round(cosine_sim(F.col("_query_id_vec"), F.col("_neighbor_id_vec")), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def brute_force_topk_np(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 6,
) -> DataFrame:
    """Exact cosine top-k, numpy-matmul inner loop — the scale path.

    The query matrix is collected once (queries are the small side by
    contract) and shipped in the task closure; each corpus partition does
    ONE (batch × dim) @ (dim × n_queries) matmul per Arrow batch and a
    partial top-k, so the shuffle carries only |partitions|·|queries|·k
    candidate rows into the final exact top-k. Same output contract as
    brute_force_topk.
    """
    import numpy as np
    import pandas as pd

    qrows = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).collect()
    qids = np.array([r.qid for r in qrows], dtype=np.int64)
    qm = np.array([r.qv for r in qrows], dtype=np.float64)  # (nq, dim)
    qm_unit = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            cm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cm_unit = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cm_unit @ qm_unit.T  # (batch, nq)
            n_take = min(k + 1, sims.shape[0])  # +1 covers self-match removal
            # partial top-k per query within this batch
            part = np.argpartition(-sims, n_take - 1, axis=0)[:n_take]
            out = {
                "query_id": np.repeat(qids, n_take),
                "neighbor_id": ids[part].T.ravel(),
                "cosine": np.take_along_axis(sims, part, axis=0).T.ravel(),
            }
            yield pd.DataFrame(out)

    cand = corpus.select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round("cosine", round_decimals))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _effective_planes(n_rows: int, n_planes: int,
                      target_bucket_rows: int) -> int:
    """Scale-aware LSH plane count: enough sign-planes that the
    EXPECTED bucket holds ~``target_bucket_rows`` rows
    (n / 2^planes <= target), never fewer than the caller's
    ``n_planes``. Unit-testable seam for the default-on blocking."""
    import math

    if n_rows <= target_bucket_rows:
        return n_planes
    return max(n_planes,
               math.ceil(math.log2(n_rows / target_bucket_rows)))


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_tables: int = 16,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    exact: bool = False,
    round_decimals: int = 6,
    target_bucket_rows: int | None = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) with
    id_a < id_b and cosine >= threshold.

    Default path is LSH-blocked (candidates = pairs sharing a sign-LSH
    bucket in any table, exact cosine verify) — the 100 TB shape: probe
    cost ~ bucket sizes. ``exact=True`` scores ALL pairs (the oracle /
    verifier path; O(N²), small-N only). Same normalize-once discipline
    as brute_force_topk: norms come from the pre-join projection.

    Scale note: with FIXED n_planes, expected bucket size grows with
    the corpus (n / 2^planes), so candidate pairs grow ~quadratically —
    fine for recall-1 verifier configs on bounded data, wrong at 100 TB.
    ``target_bucket_rows`` (DEFAULT 10_000 — scale-safe blocking is the
    default, not opt-in) makes the blocking scale-aware: planes per
    table become max(n_planes, ceil(log2(n / target))), so expected
    bucket size — and with it per-bucket candidate cost — stays bounded
    as the corpus grows (the r9 scale-receipt lesson: the 10× corpus
    measured 105× candidate growth at fixed planes). More planes lower
    per-table recall (p^planes); compensate with n_tables. Recall-1
    oracle configurations that must NOT have their planes escalated
    (their miss-probability math is pinned to n_planes) pass
    ``target_bucket_rows=None`` explicitly, and keep low-threshold
    recall-1 work on the exact/tiled dense arm
    (cosine_near_dup_pairs_np), which is built for that regime.
    """
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col), vd.alias("_v"), _norm(vd).alias("_n"))
    if target_bucket_rows and not exact:
        n_planes = _effective_planes(
            df.count(), n_planes, target_bucket_rows)
    if exact:
        a = base.select(
            F.col(id_col).alias("id_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na")
        )
        b = base.select(
            F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb")
        )
        cand = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        tables = [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
        pl_df = _planes_row_df(df.sparkSession, tables)
        def bucketed(name):
            return (
                base.select(F.col(id_col).alias(name), "_v")
                .join(F.broadcast(pl_df))
                .select(
                    name,
                    F.explode(
                        _bucket_structs(F.col("pl"), F.col("_v"))
                    ).alias("tb"),
                )
                .select(name, "tb.tbl", "tb.bkt")
            )
        pairs = (
            bucketed("id_a").join(bucketed("id_b"), ["tbl", "bkt"])
            .where(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        a = base.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na"))
        b = base.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
        cand = pairs.join(a, "id_a").join(b, "id_b")
    # zero-norm vectors have no direction: null cosine, dropped by the
    # threshold filter (ANSI mode turns the bare division into a
    # DIVIDE_BY_ZERO error, not a NaN)
    denom = F.col("_na") * F.col("_nb")
    cos = F.round(
        F.when(denom > 0, _dot(F.col("_va"), F.col("_vb")) / denom),
        round_decimals,
    )
    return (
        cand.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _tiled_cosine_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str,
    id_col: str,
    round_decimals: int,
    n_blocks: int,
) -> DataFrame:
    """Exact all-pairs cosine via the block outer-product schedule: rows
    hash into *n_blocks* blocks; side A replicates each row to keys
    (b, j) for j ≥ b, side B to keys (i, b) for i ≤ b, so cogroup key
    (i, j) holds exactly block i × block j and every unordered row pair
    lands in exactly one task (the diagonal key enforces id_a < id_b;
    off-diagonal keys emit (min, max)). Each task materializes at most
    two blocks — memory is bounded by the caller's limit, shuffle is
    O(n·T) replication, and the T(T+1)/2 tasks are the inherent cost of
    exact all-pairs. Same output contract and rounding as the
    closure-broadcast arm (pinned identical in tests)."""
    import numpy as np
    import pandas as pd

    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    base = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
        blk.alias("_b"),
    )
    # both cogroup sides derive from the same plan; re-aliasing _id/_v
    # per side mints fresh attribute ids so the analyzer's
    # ambiguous-self-join check can't trip (it did on parquet-scan
    # lineage even though LocalRelation inputs passed — caught by the
    # 10x registry scale sweep, r9)
    side_a = base.select(
        F.col("_b").alias("_i"),
        F.explode(
            F.sequence(F.col("_b"), F.lit(n_blocks - 1))
        ).alias("_j"),
        F.col("_id").alias("_ida"), F.col("_v").alias("_va"),
    )
    side_b = base.select(
        F.explode(F.sequence(F.lit(0), F.col("_b"))).alias("_i"),
        F.col("_b").alias("_j"),
        F.col("_id").alias("_idb"), F.col("_v").alias("_vb"),
    )

    def _unit(pdf: "pd.DataFrame", id_name: str, v_name: str):
        ids = pdf[id_name].to_numpy(dtype=np.int64)
        m = np.array(pdf[v_name].tolist(), dtype=np.float64)
        nm = np.linalg.norm(m, axis=1, keepdims=True)
        np.divide(m, nm, out=m, where=nm > 0)
        return ids, m

    def merge(key, la: "pd.DataFrame", rb: "pd.DataFrame"):
        if len(la) == 0 or len(rb) == 0:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "cosine": []}
            ).astype({"id_a": "int64", "id_b": "int64", "cosine": "float64"})
        ia, ma = _unit(la, "_ida", "_va")
        ib, mb = _unit(rb, "_idb", "_vb")
        sims = np.round(ma @ mb.T, round_decimals)
        mask = sims >= threshold
        if key[0] == key[1]:
            mask &= ia[:, None] < ib[None, :]
        ii, jj = np.nonzero(mask)
        lo = np.minimum(ia[ii], ib[jj])
        hi = np.maximum(ia[ii], ib[jj])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": sims[ii, jj]})

    return (
        side_a.groupby("_i", "_j")
        .cogroup(side_b.groupby("_i", "_j"))
        .applyInPandas(merge, schema="id_a long, id_b long, cosine double")
    )


def cosine_near_dup_pairs_np(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    round_decimals: int = 6,
    broadcast_limit: int = 2_000_000,
) -> DataFrame:
    """Exact all-pairs cosine near-dup, numpy-matmul inner loop — the
    DENSE-similarity regime where sign-LSH degenerates: when a corpus's
    background cosine approaches the threshold (hashed-TF-IDF over a
    small shared vocabulary, near-duplicate-heavy crawls), every doc
    collides into every bucket, candidates approach all pairs, and the
    per-pair expression-tree dot product becomes the bottleneck
    (measured at sf0.1: 94 s expression exact / 44 s LSH vs ~2 s here,
    identical 332 pairs). Same output contract as
    :func:`cosine_near_dup_pairs`.

    Below ``broadcast_limit`` (rows × dim — the same small-side contract
    as brute_force_topk_np) one side is collected and closure-shipped;
    the other streams through mapInPandas doing ONE
    (batch × dim) @ (dim × n) matmul per Arrow batch, and only pairs ≥
    threshold ever leave the task. Above the limit the arm switches
    AUTOMATICALLY to :func:`_tiled_cosine_pairs` — the standard
    block-matmul schedule: rows hash into T ≈ ceil(n·dim/limit) blocks,
    every block pair (i ≤ j) cogroups into one task holding at most two
    blocks (memory bounded by 2×limit regardless of corpus size), and
    the O(T²) block pairs are the honest cost of EXACT all-pairs. The
    corpus size check itself is a count, never a collect. Real
    heavy-tailed corpora at 100 TB should still prefer the LSH arm
    (cosine_near_dup_pairs) or the SemDeDup cluster-blocked composition
    (k-means cells + per-cell matmul) — this fallback is for the dense-
    similarity regime where those degenerate and exactness is wanted."""
    import numpy as np
    import pandas as pd

    head = df.select(F.col(vec_col).alias("_v")).first()
    dim = len(head["_v"]) if head else 0
    n = df.count()
    if n * dim > broadcast_limit:
        n_blocks = int(np.ceil(n * dim / broadcast_limit))
        return _tiled_cosine_pairs(
            df, threshold, vec_col, id_col, round_decimals, n_blocks
        )
    rows = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).collect()
    all_ids = np.array([r["_id"] for r in rows], dtype=np.int64)
    m = np.array([r["_v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    np.divide(m, norms, out=m, where=norms > 0)

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            cm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cn = np.linalg.norm(cm, axis=1, keepdims=True)
            np.divide(cm, cn, out=cm, where=cn > 0)
            sims = np.round(cm @ m.T, round_decimals)
            # id_a < id_b emits each qualifying pair exactly once and
            # drops self-pairs; zero vectors have sims 0 < threshold
            ii, jj = np.nonzero(
                (sims >= threshold) & (ids[:, None] < all_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": ids[ii],
                    "id_b": all_ids[jj],
                    "cosine": sims[ii, jj],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        score, schema="id_a long, id_b long, cosine double"
    )


def recall_report(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    bound: float,
) -> DataFrame:
    """Driver-visible correctness gate for an approximate ANN path:
    (n_queries, n_below) where n_below counts queries whose recall@k of
    `approx` against `exact` falls below `bound`. Both inputs are
    (query_id, neighbor_id, ...) top-k tables computed in the same job, so
    the gate asserts "approximate ⊆ exact up to the recall bound" —
    the oracle only needs the query count and n_below = 0
    (VERDICT r1: recall-lower-bound oracle form for approximate ops)."""
    hits = (
        approx.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    per_q = (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(k)).alias("recall"),
        )
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum(F.when(F.col("recall") < bound, 1).otherwise(0))
        .cast("long")
        .alias("n_below"),
    )


def _kmeans_fit(sample: "list[list[float]]", k: int, iters: int, seed: int):
    """Tiny deterministic Lloyd's k-means on a driver-side sample — the
    IVF coarse quantizer. No MLlib dependency; the sample is small by
    contract (coarse centroids need ~100 points per centroid)."""
    import random

    import numpy as np

    rng = random.Random(seed)
    X = np.asarray(sample, dtype=np.float64)
    cent = X[rng.sample(range(len(X)), k)]
    # one preallocated (n, k, d) buffer + in-place subtract/square: the
    # naive broadcast form `((X[:,None,:]-cent)**2).sum(2)` allocated two
    # fresh n*k*d temporaries per iteration, and the allocator (page
    # faults on first touch) dominated the fit (measured: 1.18 s -> 0.08 s
    # for one 2000x8 book at k=64, iters=8). Bit-identical: the same
    # element-wise ops feed the same axis-2 pairwise sum, so every
    # distance, argmin tie, and cluster mean is unchanged.
    buf = np.empty((len(X), k, X.shape[1]))
    for _ in range(iters):
        np.subtract(X[:, None, :], cent[None, :, :], out=buf)
        np.multiply(buf, buf, out=buf)
        d = buf.sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            pts = X[assign == j]
            if len(pts):
                cent[j] = pts.mean(axis=0)
    return cent


def _nearest_centroids(vec: Column, centroids, n: int) -> Column:
    """Array of the n nearest centroid ids for a vector column — pure
    Column argsort over k squared-distance expressions (k is small)."""
    dists = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.slice(F.transform(F.array_sort(dists), lambda s: s["cid"]), 1, n)


def _nearest_codes_scaled(subvec: Column, norm_col: Column, book, n: int) -> Column:
    """Nearest-centroid ids for the UNIT-normalized form of ``subvec``
    WITHOUT dividing any element: for unit u = v/‖v‖,
    argmin_c ‖u_j − c‖² = argmax_c (v_j·c − ‖v‖·‖c‖²/2) — multiply the
    comparison through by the (positive) row norm instead of dividing d
    elements by it. Each centroid costs one dot product and one multiply
    of the PRECOMPUTED norm column; nothing is recomputed per element.
    (The naive per-element transform form made the r3 bench's PQ encode
    O(d) slower per centroid and blew up codegen: 27.7 s → see bench.)"""
    scored = F.array(
        *[
            F.struct(
                (
                    norm_col * F.lit(float(sum(x * x for x in c)) / 2.0)
                    - _dot(subvec, F.array(*[F.lit(float(x)) for x in c]))
                ).alias("d"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(book)
        ]
    )
    return F.slice(F.transform(F.array_sort(scored), lambda s: s["cid"]), 1, n)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_probe: int = 3,
    sample_size: int = 2000,
    kmeans_iters: int = 8,
    seed: int = 42,
    round_decimals: int = 6,
    normalize: bool = True,
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer → corpus vectors
    live in their nearest-centroid cell; each query probes its `n_probe`
    nearest cells and exact-ranks only those members.

    At 100 TB: the quantizer fits on a driver-side sample once; cell
    assignment is a narrow Column pass; the probe join is an equi-join on
    cell id (candidates ≈ n_probe/n_centroids of the corpus). Recall
    tunes with n_probe — the standard IVF trade.

    normalize=True (default) unit-normalizes vectors before the fit and
    the cell assignment — spherical k-means, the correct quantizer when
    ranking is by cosine: on raw vectors, L2 cells follow magnitude, not
    direction, and cosine neighbors scatter across cells (measured min
    recall@5 0.2 → 0.8 on the synthetic embeddings).
    """
    import numpy as np

    sample = [
        r.v
        for r in corpus.select(F.col(vec_col).alias("v"))
        .limit(sample_size)
        .collect()
    ]
    if normalize:
        arr = np.asarray(sample, dtype=np.float64)
        arr = arr / np.maximum(np.linalg.norm(arr, axis=1, keepdims=True), 1e-12)
        sample = arr.tolist()
    cents = _kmeans_fit(sample, n_centroids, kmeans_iters, seed)

    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    # Cell assignment is an Arrow-batched numpy pass. The Column form
    # (n_centroids × dim literal expressions per side) cost ~2.2 s of
    # py4j PLAN CONSTRUCTION at 16×64 before a single row moved — the
    # same disease the PQ codebook had, fixed the same way: ship the
    # centroid matrix in the task closure and argmin with one matmul.
    import pandas as pd

    C = np.asarray(cents, dtype=np.float64)  # (n_centroids, dim)
    half_c = 0.5 * (C**2).sum(axis=1)

    def _assign(out_id: str, n: int):
        def gen(batches):
            for pdf in batches:
                V = np.array(pdf["_vec"].tolist(), dtype=np.float64)
                if normalize:
                    Vn = V / np.maximum(
                        np.linalg.norm(V, axis=1, keepdims=True), 1e-12
                    )
                else:
                    Vn = V
                d = half_c[None, :] - Vn @ C.T
                if n == 1:
                    cells = np.argmin(d, axis=1)[:, None]
                else:
                    # argsort asc is stable: equal distances break to the
                    # smaller cell id (same contract as the Column form)
                    cells = np.argsort(d, kind="stable", axis=1)[:, :n]
                out = pdf.rename(columns={"_id": out_id})
                out = out.loc[out.index.repeat(n)].reset_index(drop=True)
                out["cell"] = cells.ravel().astype("int32")
                yield out

        return gen

    def _with_cells(df: DataFrame, out_id: str, vec_alias: str, n: int):
        base = df.select(F.col(id_col).alias("_id"), vd.alias("_vec"))
        base = base.repartition(
            df.sparkSession.sparkContext.defaultParallelism
        )  # assignment is compute-bound; spread it even off one row group
        out = base.mapInPandas(
            _assign(out_id, n),
            schema=f"{out_id} long, _vec array<double>, cell int",
        )
        return out.withColumnRenamed("_vec", vec_alias)

    c_cells = _with_cells(corpus, "neighbor_id", "_cv", 1)
    q_cells = _with_cells(queries, "query_id", "_qv", n_probe)
    # Candidate scoring is numpy row-wise (Arrow-vectorized pandas_udf):
    # n_probe/n_centroids of corpus×queries survive the cell join, and an
    # interpreted 64-element zip_with per pair was the dominant cost
    # (~2.5 s of the 3.1 s warm total at sf0.1; the matmul form is ~0.1 s).
    # The join shape (equi-join on cell id) is unchanged — that is the
    # part that matters at 100 TB.
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos_batch(a, b):
        import numpy as np

        A = np.array(a.tolist(), dtype=np.float64)
        B = np.array(b.tolist(), dtype=np.float64)
        num = (A * B).sum(axis=1)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / np.maximum(den, 1e-12))

    # no type annotations: the module's future-annotations mode turns
    # them into strings pandas_udf cannot resolve
    _cos_np = pandas_udf(_cos_batch, "double")

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        c_cells.join(F.broadcast(q_cells), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cos_np(F.col("_qv"), F.col("_cv")), round_decimals).alias(
                "cosine"
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    n_codes: int = 16,
    sample_size: int = 2000,
    kmeans_iters: int = 8,
    seed: int = 42,
    round_decimals: int = 6,
    refine: int = 10,
) -> DataFrame:
    """Product-quantization approximate top-k (asymmetric distance):
    vectors unit-normalize, split into `m` subvectors, and each subvector
    quantizes to its nearest of `n_codes` per-subspace centroids — the
    corpus compresses to m small codes per vector (here 8 codes for a
    64-dim float vector: 32x). Queries stay exact: per query, a lookup
    table of query-subvector · centroid dot products; a vector's score is
    the sum of m table lookups (ADC), approximating the cosine.

    At 100 TB this is the memory-scale path past IVF: codebooks fit on a
    driver sample once (same bounded-collect contract as ivf_topk);
    encoding is a narrow Column pass; ranking touches only the m-byte
    codes — the full vectors never re-enter the plan after encode. In a
    production two-stage layout the same codes live under an IVF
    partitioner and the top ADC candidates re-rank exactly."""
    import numpy as np

    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    # The two bounded driver collects (codebook sample + query matrix)
    # are independent blocking jobs — overlap them from a 2-thread pool
    # (guide §2.6: actions are only sequential because driver code calls
    # them sequentially); the codebook FIT rides the sample's thread so
    # it also overlaps the query collect. The fit stays m sequential
    # per-book Lloyd passes: a single (m, n, k, dsub) batched tensor was
    # built and MEASURED 1.3-2.6x SLOWER (scripts/ab_pq_fit_batched.py:
    # sequential 0.46-0.50 s vs batched 0.60-1.24 s) — the per-book
    # (n, k, dsub) buffer is ~8 MB and LLC-resident across all three
    # elementwise passes, the 67 MB batched tensor is not, and memory
    # bandwidth beats the saved kernel dispatches.
    from concurrent.futures import ThreadPoolExecutor

    def _sample_and_fit():
        sample = [
            r.v
            for r in corpus.select(F.col(vec_col).alias("v"))
            .limit(sample_size)
            .collect()
        ]
        X = np.asarray(sample, dtype=np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        dim = X.shape[1]
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        dsub = dim // m
        books = [
            _kmeans_fit(X[:, j * dsub : (j + 1) * dsub].tolist(), n_codes,
                        kmeans_iters, seed + j)
            for j in range(m)
        ]
        return dsub, np.stack([np.asarray(b, dtype=np.float64) for b in books])

    def _query_rows():
        return queries.select(
            F.col(id_col).alias("qid"), vd.alias("qv")
        ).collect()

    with ThreadPoolExecutor(max_workers=2) as pool:
        fit_fut = pool.submit(_sample_and_fit)
        qrows_fut = pool.submit(_query_rows)
        dsub, B = fit_fut.result()
        qrows = qrows_fut.result()

    # Encode + ADC scoring run as ONE Arrow-batched numpy pass
    # (mapInPandas): per corpus batch, m argmin matmuls against the
    # codebooks give the codes, m table-gathers give every query's ADC
    # score, and a per-batch partial top-(k·refine) bounds what leaves
    # the executor — the shuffle carries |partitions|·|queries|·k·refine
    # candidate rows, never the corpus. Two earlier forms were measured
    # and rejected (r3): codebooks as literal expressions (~44 s of py4j
    # plan construction at m=8, n_codes=64) and codebooks as a broadcast
    # row with higher-order-function encode (plan-size independent, but
    # m×n_codes interpreted aggregate loops per row ≈ 2.5 s at sf0.1
    # where this pass is ~0.2 s). The query matrix collects once —
    # queries are the small side by contract (same bound as
    # brute_force_topk_np). In production the codes are computed once at
    # ingest and stored; this encodes inline because the gate data has no
    # code column.
    import pandas as pd

    half_cn = 0.5 * (B**2).sum(axis=2)  # (m, n_codes)
    qids = np.array([r.qid for r in qrows], dtype=np.int64)
    Q = np.array([r.qv for r in qrows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    # ADC lookup tables: T[j][q][c] = q̂_j · centroid_c
    T = np.stack(
        [Qn[:, j * dsub : (j + 1) * dsub] @ B[j].T for j in range(m)]
    )
    n_cand = k * max(refine, 1)

    def encode_score(batches):
        for pdf in batches:
            ids = pdf["_id"].to_numpy(dtype=np.int64)
            V = np.array(pdf["_v"].tolist(), dtype=np.float64)
            Vn = V / np.maximum(
                np.linalg.norm(V, axis=1, keepdims=True), 1e-12
            )
            S = np.zeros((len(qids), len(ids)))
            for j in range(m):
                sub = Vn[:, j * dsub : (j + 1) * dsub]
                # argmin_c ‖v̂_j − c‖² == argmin_c ‖c‖²/2 − v̂_j·c;
                # np.argmin first-wins == smallest code id on ties
                codes = np.argmin(half_cn[j][None, :] - sub @ B[j].T, axis=1)
                S += T[j][:, codes]
            n_take = min(n_cand + 1, S.shape[1])  # +1 covers self-match
            part = np.argpartition(-S, n_take - 1, axis=1)[:, :n_take]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, n_take),
                    "neighbor_id": ids[part.ravel()],
                    "adc_score": np.take_along_axis(S, part, axis=1).ravel(),
                }
            )

    cbase = corpus.select(F.col(id_col).alias("_id"), vd.alias("_v"))
    cbase = cbase.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism
    )  # encode is compute-bound; spread it even off one parquet row group
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id")
    )
    candidates = (
        cbase.mapInPandas(
            encode_score,
            schema="query_id long, neighbor_id long, adc_score double",
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc_score", F.round("adc_score", round_decimals))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n_cand)
    )
    if refine <= 1:
        return candidates
    # two-stage: exact cosine re-rank of the ADC candidate set only —
    # the full vectors re-enter the plan for k*refine rows per query,
    # not the whole corpus (the standard IVF-PQ + refine layout).
    # The projections + cosine are SQL-string expressions (selectExpr /
    # F.expr): the lambda Column API builds zip_with/aggregate trees in
    # ~dozens of py4j round-trips per expression, measured 0.36-0.47 s
    # of pure driver plan construction per build for this refine arm —
    # the parser produces the identical analyzed expressions in one
    # call each (same fix as _centroid_lit / _planes_row_df).
    vd_sql = f"transform({vec_col}, x -> cast(x as double))"
    nrm_sql = f"sqrt(aggregate({vd_sql}, 0.0D, (acc, v) -> acc + v * v))"
    cvecs = corpus.selectExpr(
        f"{id_col} as neighbor_id", f"{vd_sql} as _cv", f"{nrm_sql} as _cn"
    )
    qvecs = queries.selectExpr(
        f"{id_col} as query_id", f"{vd_sql} as _qv", f"{nrm_sql} as _qn"
    )
    cos = F.expr(
        "round(aggregate(zip_with(_qv, _cv, (x, y) -> x * y), 0.0D,"
        f" (acc, v) -> acc + v) / (_qn * _cn), {int(round_decimals)})"
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        candidates.select("query_id", "neighbor_id")
        .join(cvecs, "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
    )


def random_projection(
    df: DataFrame,
    k: int = 8,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic sparse random projection (Achlioptas 2003 — the
    database-friendly Johnson-Lindenstrauss transform with ±1 entries):
    compress dim-d embeddings to k components, out[j] = Σ_i emb[i] ·
    r(i,j) / √k, where r(i,j) ∈ {+1, −1} comes from a Knuth-hash parity
    — no stored projection matrix, any engine (or the SQL oracle)
    regenerates it from (i, j) alone. The JL guarantee bounds pairwise
    distance distortion, which is what downstream ANN/dedup consume.

    Scale shape: pure scan — k aggregate-over-array expressions per
    row, no shuffle, no driver state; output columns c0..c{k-1} are
    atomic doubles (rounded 6 for cross-engine float-sum parity).
    """
    emb = F.col(emb_col)
    scale = 1.0 / math.sqrt(k)

    def sign(i: Column, j: int) -> Column:
        # j enters MULTIPLICATIVELY (odd factor 2j+1): an additive
        # j-term almost never flips the high bit between neighboring
        # columns, and parity of any linear form is an (i+j)
        # checkerboard — both degenerate projections
        h = F.pmod(
            (i + 1) * F.lit((2 * j + 1) * _KNUTH)
            + F.lit((j + 1) * 40503),
            F.lit(_MOD),
        )
        return F.when(h < F.lit(_MOD // 2), F.lit(1.0)).otherwise(
            F.lit(-1.0)
        )

    def make_signs(j: int) -> Column:
        # single-arg lambda: pyspark's transform passes the element
        # index to two-arg lambdas, which would clobber a j default
        return F.transform(
            F.sequence(F.lit(0), F.size(emb) - 1), lambda i: sign(i, j)
        )

    cols = []
    for j in range(k):
        comp = F.aggregate(
            F.zip_with(emb.cast("array<double>"), make_signs(j),
                       lambda v, s: v * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(F.round(comp * scale, 6).alias(f"c{j}"))
    return df.select(F.col(id_col), *cols)


def quantize_embeddings_int8(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization (the standard 4x memory
    cut for ANN indexes — e.g. the scalar-quantization mode of FAISS):
    scale = max|v| / 127, q_i = floor(v_i / scale + 0.5) clamped to
    [-127, 127]. floor(x + 0.5) rather than round() because both
    engines' floor is exact while round-half ties can differ; the SQL
    oracle replays the identical arithmetic. Zero vectors quantize to
    zeros with scale 0.

    Output is atomic (vec_id, scale, i, q) via posexplode — the shape
    downstream bucket-joins consume and the driver canonicalizer
    accepts. Pure scan, no shuffle."""
    emb = F.col(emb_col).cast("array<double>")
    max_abs = F.aggregate(
        emb, F.lit(0.0),
        lambda acc, v: F.greatest(acc, F.abs(v)),
    )
    scale = max_abs / F.lit(127.0)
    q = F.transform(
        emb,
        lambda v: F.when(scale == 0, F.lit(0)).otherwise(
            F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(v / scale + F.lit(0.5)).cast("int"),
                ),
            )
        ),
    )
    return df.select(
        F.col(id_col),
        F.round(scale, 9).alias("scale"),
        F.posexplode(q).alias("i", "q"),
    )
