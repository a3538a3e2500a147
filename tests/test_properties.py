"""Property-based tests (hypothesis) — the reference's randomized-testing
strategy (SURVEY §5: Arbitrary event generators, proptest in buffers)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

rows_strategy = st.lists(
    st.tuples(st.integers(0, 6), st.floats(0, 100, allow_nan=False)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(rows_strategy)
def test_sample_keyed_all_or_nothing(spark, data):
    """Key-consistent sampling: every key's rows share one fate."""
    from vector_spark.operators import sample

    df = spark.createDataFrame(
        [Row(seq=i, uid=k, v=v) for i, (k, v) in enumerate(data)]
    )
    kept = sample(df, rate=3, key_field="uid").collect()
    all_keys = {k for k, _ in data}
    kept_by_key = {}
    for r in kept:
        kept_by_key.setdefault(r.uid, 0)
        kept_by_key[r.uid] += 1
    for k in all_keys:
        total = sum(1 for kk, _ in data if kk == k)
        assert kept_by_key.get(k, 0) in (0, total)


@settings(max_examples=8, deadline=None)
@given(rows_strategy)
def test_salted_aggregate_equivalence_property(spark, data):
    from vector_spark.operators.aggregate import salted_aggregate

    df = spark.createDataFrame(
        [Row(k=str(k), v=float(int(v * 100)) / 100) for k, v in data]
    )
    salted = {
        r.k: (r.n, r.mx)
        for r in salted_aggregate(
            df, ["k"], {"n": ("count", "v"), "mx": ("max", "v")}, salt_buckets=4
        ).collect()
    }
    plain = {
        r.k: (r.n, r.mx)
        for r in df.groupBy("k")
        .agg(F.count("v").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    assert salted == plain


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.booleans(), min_size=1, max_size=30),
)
def test_sessionize_ids_monotone_property(spark, flags):
    """Session ids are non-decreasing in event order and bump exactly on
    start flags."""
    from vector_spark.operators import sessionize

    df = spark.createDataFrame(
        [Row(seq=i, g="a", fire=f) for i, f in enumerate(flags)]
    )
    out = sorted(
        sessionize(df, ["g"], "seq", starts_when=F.col("fire")).collect(),
        key=lambda r: r.seq,
    )
    expected = 0
    for r, f in zip(out, flags):
        if f:
            expected += 1
        assert r.session_id == expected
