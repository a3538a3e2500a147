"""Measured REJECTION receipt: batching the m PQ codebook k-means fits
into one (m, n, k, dsub) tensor pass is SLOWER than m sequential
per-book fits, despite 8x fewer kernel dispatches per Lloyd iteration.

Why (r12): the per-book (n, k, dsub) buffer at the registry's
parameters (2000 x 64 x 8 doubles ~ 8.4 MB) stays LLC-resident across
the subtract/square/sum passes of every iteration; the batched tensor
(8x, ~67 MB) does not, so every pass streams from DRAM — memory
bandwidth beats dispatch overhead. The batched form IS bit-identical
(same per-book RNG init, elementwise ops, axis(-1) reduction order,
argmin ties, per-cluster means), asserted below, so the rejection is
purely a performance measurement. Pure numpy — no Spark involved.

Usage: python scripts/ab_pq_fit_batched.py [reps]
Prints one JSON line. Measured on this host: sequential 0.46-0.50 s,
batched 0.60-1.24 s per full m=8, n=2000, k=64, iters=8 fit.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_spark.dataops.similarity import _kmeans_fit  # noqa: E402


def _kmeans_fit_books(X, m: int, k: int, iters: int, seed: int):
    """The rejected batched form (kept here as the receipt's B arm)."""
    import random

    import numpy as np

    n, dim = X.shape
    dsub = dim // m
    Xb = np.stack([X[:, j * dsub:(j + 1) * dsub] for j in range(m)])
    cent = np.stack([
        Xb[j][random.Random(seed + j).sample(range(n), k)]
        for j in range(m)
    ])
    buf = np.empty((m, n, k, dsub))
    for _ in range(iters):
        np.subtract(Xb[:, :, None, :], cent[:, None, :, :], out=buf)
        np.multiply(buf, buf, out=buf)
        d = buf.sum(axis=3)
        assign = d.argmin(axis=2)
        for j in range(m):
            Xj, aj = Xb[j], assign[j]
            for c in range(k):
                pts = Xj[aj == c]
                if len(pts):
                    cent[j, c] = pts.mean(axis=0)
    return cent


def main() -> None:
    import numpy as np

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    m, n, k, iters, seed, dim = 8, 2000, 64, 8, 42, 64
    rng = np.random.default_rng(1)
    X = rng.standard_normal((n, dim))
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    dsub = dim // m
    seq_best = bat_best = None
    identical = True
    for _ in range(reps):
        t0 = time.perf_counter()
        seq = [
            _kmeans_fit(X[:, j * dsub:(j + 1) * dsub].tolist(), k, iters,
                        seed + j)
            for j in range(m)
        ]
        t1 = time.perf_counter()
        bat = _kmeans_fit_books(X, m, k, iters, seed)
        t2 = time.perf_counter()
        identical &= all(
            np.array_equal(np.asarray(seq[j]), bat[j]) for j in range(m)
        )
        seq_best = min(seq_best or 9e9, t1 - t0)
        bat_best = min(bat_best or 9e9, t2 - t1)
    print(json.dumps({
        "sequential_sec": round(seq_best, 3),
        "batched_sec": round(bat_best, 3),
        "batched_over_sequential": round(bat_best / seq_best, 2),
        "bit_identical": identical,
    }))


if __name__ == "__main__":
    main()
