"""Interleaved A/B for the r11 simhash one-agg rewrite and the
bpe_encode_docs per-task-memo mapInPandas form: OLD shape (inline copy
of the pre-change code) vs NEW (library), alternating in one session so
host drift cancels. Full-evaluation noop sink, steal ticks per run.

Usage: python scripts/ab_simhash_bpe.py [rounds] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def steal() -> int:
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) if len(parts) > 8 else 0
    except Exception:
        return 0


def old_simhash(df, text_col="text", id_col="doc_id", bits=60):
    """Pre-r11 shape: explode bit indices + two-level agg (verbatim)."""
    h = F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long")
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


def old_bpe_encode_docs(df, merges, text_col="text", id_col="doc_id"):
    """Pre-r11 shape: scalar pandas_udf, per-BATCH memo (verbatim)."""
    from vector_spark.dataops.text import _bpe_apply

    rank = {tuple(m): i for i, m in enumerate(merges)}

    @pandas_udf("struct<n_words:int,tokens:array<string>>")
    def _encode(texts: pd.Series) -> pd.DataFrame:
        memo: dict[str, list[str]] = {}

        def enc(text):
            out: list[str] = []
            words = [] if text is None else str(text).lower().strip().split()
            for w in words:
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _bpe_apply(list(w), rank)
                out.extend(got)
            return {"n_words": len(words), "tokens": out}

        return pd.DataFrame(list(texts.map(enc)))

    tmp = df.select(F.col(id_col), _encode(F.col(text_col)).alias("_e"))
    return tmp.select(
        id_col,
        F.col("_e.n_words").alias("n_words"),
        F.size("_e.tokens").alias("n_tokens"),
        F.col("_e.tokens").alias("tokens"),
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from vector_spark.dataops.text import bpe_encode_docs, bpe_train
    from vector_spark.plans.queries import QUERIES, _spread, _t
    from vector_spark.session import get_spark

    spark = get_spark("ab-simhash-bpe")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["filter"].fn(spark, sf_dir).count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    spark.range(4).collect()
    spark.createDataFrame([(0, "w")], "i long, s string").count()

    def run(df) -> float:
        s0 = steal()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        return dt, steal() - s0

    # ---- simhash: old vs new (q_simhash's exact input shape) ----
    docs = _spread(_t(spark, sf_dir, "documents"), spark)
    from vector_spark.dataops.dedup import simhash as new_simhash

    # value identity once, order-insensitive
    a = {tuple(r) for r in old_simhash(docs).collect()}
    b = {tuple(r) for r in new_simhash(docs, portable=True).collect()}
    print(f"simhash identical: {a == b} ({len(a)} rows)", flush=True)

    for r in range(rounds):
        od, ost = run(old_simhash(docs))
        nd, nst = run(new_simhash(docs, portable=True))
        print(
            f"simhash round{r}: old {od:6.3f}s (steal {ost})"
            f"  new {nd:6.3f}s (steal {nst})",
            flush=True,
        )

    # ---- bpe_encode: old vs new over the same trained merges ----
    merges = bpe_train(docs.select(F.col("text")), n_merges=24)
    ov = {
        (r[0], r[1], r[2], tuple(r[3]))
        for r in old_bpe_encode_docs(docs, merges).collect()
    }
    nv = {
        (r[0], r[1], r[2], tuple(r[3]))
        for r in bpe_encode_docs(docs, merges).collect()
    }
    print(f"bpe_encode identical: {ov == nv} ({len(ov)} rows)", flush=True)

    for r in range(rounds):
        od, ost = run(old_bpe_encode_docs(docs, merges))
        nd, nst = run(bpe_encode_docs(docs, merges))
        print(
            f"bpe_encode round{r}: old {od:6.3f}s (steal {ost})"
            f"  new {nd:6.3f}s (steal {nst})",
            flush=True,
        )


if __name__ == "__main__":
    main()
