"""Property-based tests (hypothesis) — the reference's randomized-testing
strategy (SURVEY §5: Arbitrary event generators, proptest in buffers)."""

from __future__ import annotations

import pytest
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


# ---- wave-4 property tests: Column impls vs pure-Python references -----

ipv4 = st.tuples(
    st.integers(0, 255), st.integers(0, 255), st.integers(0, 255),
    st.integers(0, 255),
).map(lambda t: ".".join(map(str, t)))


@given(
    src=ipv4, dst=ipv4,
    sport=st.integers(0, 65535), dport=st.integers(0, 65535),
    proto=st.integers(0, 255),
)
@settings(max_examples=25, deadline=None)
def test_community_id_matches_reference(spark, src, dst, sport, dport, proto):
    """Column community_id == an independent pure-Python spec impl,
    including the equal-IP port tiebreak."""
    import base64
    import hashlib
    import socket as pysocket
    import struct

    from vector_spark.functions.vrl import VRL_FUNCTIONS as V
    from pyspark.sql import functions as F

    def ref(seed=0):
        s_b = pysocket.inet_aton(src)
        d_b = pysocket.inet_aton(dst)
        if (s_b, sport) <= (d_b, dport):
            a, b, pa, pb = s_b, d_b, sport, dport
        else:
            a, b, pa, pb = d_b, s_b, dport, sport
        payload = (
            struct.pack("!H", seed) + a + b + bytes([proto, 0])
            + struct.pack("!H", pa) + struct.pack("!H", pb)
        )
        return "1:" + base64.b64encode(hashlib.sha1(payload).digest()).decode()

    got = (
        spark.range(1)
        .select(
            V["community_id"](
                F.lit(src), F.lit(dst), F.lit(sport), F.lit(dport), F.lit(proto)
            ).alias("v")
        )
        .head()["v"]
    )
    assert got == ref()


@given(st.integers(0, 2**40), st.sampled_from([2, 8, 16, 36]))
@settings(max_examples=20, deadline=None)
def test_format_int_matches_python(spark, n, base):
    from vector_spark.functions.vrl import VRL_FUNCTIONS as V
    from pyspark.sql import functions as F

    def to_base(x, b):
        if x == 0:
            return "0"
        digits = "0123456789abcdefghijklmnopqrstuvwxyz"
        out = ""
        while x:
            out = digits[x % b] + out
            x //= b
        return out

    got = (
        spark.range(1)
        .select(V["format_int"](F.lit(n), base).alias("v"))
        .head()["v"]
    )
    assert got == to_base(n, base)


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=600),
               min_size=1, max_size=40))
@settings(max_examples=25, deadline=None)
def test_shannon_entropy_matches_python(spark, text):
    import math

    from vector_spark.functions.vrl import VRL_FUNCTIONS as V
    from pyspark.sql import functions as F

    n = len(text)
    want = -sum(
        (text.count(c) / n) * math.log2(text.count(c) / n) for c in set(text)
    )
    got = (
        spark.range(1)
        .select(V["shannon_entropy"](F.lit(text)).alias("v"))
        .head()["v"]
    )
    assert got == pytest.approx(want, abs=1e-9)
