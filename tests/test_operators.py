"""Unit tests for the transform operator library, mirroring the reference's
behavior-corpus style (vector tests/behavior/transforms/*.yaml): small
directed inputs, asserted outputs."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from vector_spark.operators import (
    aggregate,
    dedupe,
    exclusive_route,
    filter_op,
    incremental_to_absolute,
    reduce_op,
    sample,
    sessionize,
    tag_cardinality_limit,
    throttle,
    window_context,
)
from vector_spark.operators.route import route, exclusive_route_tag


def _events(spark, rows):
    return spark.createDataFrame(rows)


def test_filter(spark):
    df = _events(
        spark,
        [Row(seq=1, level="error"), Row(seq=2, level="info"), Row(seq=3, level=None)],
    )
    out = filter_op(df, F.col("level") == "error").collect()
    assert [r.seq for r in out] == [1]  # null condition drops (vector semantics)


def test_route_multi_match_and_unmatched(spark):
    df = _events(spark, [Row(seq=1, v=5), Row(seq=2, v=15), Row(seq=3, v=-1)])
    outs = route(df, {"small": F.col("v") < 10, "positive": F.col("v") > 0})
    assert sorted(r.seq for r in outs["small"].collect()) == [1, 3]
    assert sorted(r.seq for r in outs["positive"].collect()) == [1, 2]
    # seq=1 matched BOTH routes (multi-match); nothing is unmatched here
    assert outs["_unmatched"].count() == 0
    outs2 = route(df, {"big": F.col("v") > 100})
    assert sorted(r.seq for r in outs2["_unmatched"].collect()) == [1, 2, 3]


def test_exclusive_route_first_match_wins(spark):
    df = _events(spark, [Row(seq=1, v=5), Row(seq=2, v=15), Row(seq=3, v=500)])
    tagged = exclusive_route_tag(
        df, [("tiny", F.col("v") < 10), ("small", F.col("v") < 100)]
    )
    got = {r.seq: r._route for r in tagged.collect()}
    assert got == {1: "tiny", 2: "small", 3: "_default"}
    split = exclusive_route(df, [("tiny", F.col("v") < 10), ("small", F.col("v") < 100)])
    assert sorted(split.keys()) == ["_default", "small", "tiny"]
    assert [r.seq for r in split["small"].collect()] == [2]


def test_sample_keyed_consistency(spark):
    rows = [Row(seq=i, uid=i % 7) for i in range(100)]
    df = _events(spark, rows)
    out = sample(df, rate=3, key_field="uid").collect()
    # all-or-nothing per key
    kept_uids = {r.uid for r in out}
    for uid in kept_uids:
        assert sum(1 for r in rows if r.uid == uid) == sum(
            1 for r in out if r.uid == uid
        )


def test_sample_counter_every_nth(spark):
    df = _events(spark, [Row(seq=i, g="a") for i in range(1, 11)])
    out = sample(df, rate=5, group_by=["g"], order_col="seq").collect()
    assert sorted(r.seq for r in out) == [1, 6]


def test_throttle(spark):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        Row(seq=i, key="k", ts=base + datetime.timedelta(seconds=i * 10))
        for i in range(10)
    ]
    df = _events(spark, rows)
    out = throttle(
        df, threshold=2, window_secs=60, key_field="key", ts_col="ts",
        order_cols=["ts", "seq"],
    ).collect()
    # windows of 60s contain 6 events each; first 2 of each pass
    assert sorted(r.seq for r in out) == [0, 1, 6, 7]


def test_throttle_excluded_events_bypass_quota(spark):
    """Excluded events pass through AND consume no quota
    (`throttle/transform.rs`: exclude check precedes the bucket)."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    # seq 0,1 excluded; then 2..5 normal — with threshold=2 the admitted
    # set must be {2,3}: the excluded rows must not occupy rank slots.
    rows = [
        Row(seq=i, key="k", kind="skip" if i < 2 else "normal",
            ts=base + datetime.timedelta(seconds=i))
        for i in range(6)
    ]
    df = _events(spark, rows)
    out = throttle(
        df, threshold=2, window_secs=3600, key_field="key", ts_col="ts",
        order_cols=["ts", "seq"], exclude=F.col("kind") == "skip",
    ).collect()
    assert sorted(r.seq for r in out) == [0, 1, 2, 3]


def test_sample_counter_exclude_does_not_shift_selection(spark):
    """Excluded events pass through before the counter increments
    (`sample/transform.rs:326-339`) — they must not perturb which of the
    remaining events are selected."""
    rows = [Row(seq=i, g="a", skip=(3 <= i <= 4)) for i in range(1, 13)]
    df = _events(spark, rows)
    out = sample(
        df, rate=5, group_by=["g"], order_col="seq", exclude=F.col("skip")
    ).collect()
    # non-excluded stream is 1,2,5,6,7,8,9,10,11,12 → every 5th from the
    # first: 1 and 8; excluded 3,4 always pass.
    assert sorted(r.seq for r in out) == [1, 3, 4, 8]


def test_ddsketch_sub1_and_zero_values(spark):
    """Sub-1 values get real (negative-index) buckets and zeros keep a
    distinct sentinel bucket — a median in (0,1) must not collapse to 0."""
    from vector_spark.operators.ddsketch import (
        ZERO_BUCKET,
        ddsketch,
        ddsketch_quantile,
    )

    vals = [0.0] * 10 + [i / 1000.0 for i in range(1, 991)]
    df = _events(spark, [Row(s="a", value=v) for v in vals])
    sk = ddsketch(df, ["s"], alpha=0.02)
    buckets = {r.bucket for r in sk.collect()}
    assert ZERO_BUCKET in buckets
    assert any(b < 0 and b != ZERO_BUCKET for b in buckets)
    svals = sorted(vals)
    for q in (0.5, 0.9):
        est = ddsketch_quantile(sk, ["s"], q, alpha=0.02).collect()[0].quantile_est
        exact = svals[int(q * len(svals)) - 1]
        assert abs(est - exact) / exact < 0.05, (q, est, exact)
    # a quantile inside the zero region reports exactly 0
    est0 = ddsketch_quantile(sk, ["s"], 0.005, alpha=0.02).collect()[0].quantile_est
    assert est0 == 0.0


def test_dedupe_match_and_ignore(spark):
    df = _events(
        spark,
        [
            Row(seq=1, a="x", b="p"),
            Row(seq=2, a="x", b="q"),
            Row(seq=3, a="y", b="p"),
            Row(seq=4, a="x", b="p"),
        ],
    )
    out = dedupe(df, match=["a"], order_col="seq").collect()
    assert sorted(r.seq for r in out) == [1, 3]
    out2 = dedupe(df, ignore=["seq"], order_col="seq").collect()
    assert sorted(r.seq for r in out2) == [1, 2, 3]


def test_reduce_merge_strategies(spark):
    df = _events(
        spark,
        [
            Row(seq=1, g="a", n=10, s="one"),
            Row(seq=2, g="a", n=5, s="two"),
            Row(seq=3, g="b", n=1, s="only"),
        ],
    )
    out = reduce_op(
        df,
        group_by=["g"],
        merge_strategies={
            "total": ("sum", "n"),
            "first_s": ("discard", "s"),
            "last_s": ("retain", "s"),
            "all_s": ("concat", "s"),
            "arr": ("array", "s"),
        },
        order_col="seq",
    )
    got = {r.g: r for r in out.collect()}
    assert got["a"].total == 15
    assert got["a"].first_s == "one"
    assert got["a"].last_s == "two"
    assert got["a"].all_s == "one two"
    assert got["a"].arr == ["one", "two"]
    assert got["a"].n_events == 2
    assert got["b"].total == 1


def test_sessionize_gap_and_ends_when(spark):
    df = _events(
        spark,
        [
            Row(seq=1, g="a", t=0, fin=False),
            Row(seq=2, g="a", t=10, fin=True),
            Row(seq=3, g="a", t=20, fin=False),
            Row(seq=4, g="a", t=5000, fin=False),
        ],
    )
    out = sessionize(df, ["g"], "seq", ends_when=F.col("fin"),
                     gap=(F.col("t") - F.lag("t", 1).over(
                         __import__("pyspark").sql.Window.partitionBy("g").orderBy("seq")
                     )) > 1000)
    got = {r.seq: r.session_id for r in out.collect()}
    # seq2 ends session → seq3 starts new; seq4 gap > 1000 → new again
    assert got[1] == got[2]
    assert got[3] == got[2] + 1
    assert got[4] == got[3] + 1


def test_aggregate_modes(spark):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    df = _events(
        spark,
        [
            Row(seq=1, name="m", ts=base, value=1.0),
            Row(seq=2, name="m", ts=base + datetime.timedelta(seconds=5), value=3.0),
            Row(seq=3, name="m", ts=base + datetime.timedelta(seconds=15), value=5.0),
        ],
    )
    out = aggregate(
        df, interval_secs=10, series_keys=["name"], value_col="value",
        ts_col="ts", order_col="seq",
        modes=["count", "sum", "min", "max", "mean", "latest", "stdev", "diff"],
    ).orderBy("bucket").collect()
    assert out[0]["count"] == 2 and out[0]["sum"] == 4.0 and out[0]["latest"] == 3.0
    assert out[0]["mean"] == 2.0
    assert out[1]["count"] == 1 and out[1]["stdev"] is None
    # reference Diff mode is latest-based ("difference between latest value
    # for absolute", aggregate.rs:62): latest(5) - latest(3)
    assert out[1]["diff"] == 2.0


def test_window_context(spark):
    df = _events(spark, [Row(seq=i, v=100 if i == 5 else 1) for i in range(10)])
    out = window_context(
        df, flush_when=F.col("v") > 50, order_col="seq",
        num_events_before=2, num_events_after=1,
    ).collect()
    assert sorted(r.seq for r in out) == [3, 4, 5, 6]


def test_incremental_to_absolute(spark):
    df = _events(
        spark,
        [Row(seq=1, k="a", value=1.0), Row(seq=2, k="a", value=2.0),
         Row(seq=3, k="b", value=7.0)],
    )
    out = incremental_to_absolute(df, ["k"], order_col="seq").collect()
    got = {r.seq: r.absolute_value for r in out}
    assert got == {1: 1.0, 2: 3.0, 3: 7.0}


def test_tag_cardinality_limit(spark):
    df = _events(
        spark,
        [Row(seq=i, tag=f"v{i}") for i in range(1, 6)],
    )
    out = tag_cardinality_limit(df, ["tag"], limit=2, order_col="seq")
    got = {r.seq: r.tag for r in out.collect()}
    assert got == {1: "v1", 2: "v2", 3: None, 4: None, 5: None}
    out2 = tag_cardinality_limit(df, ["tag"], limit=2, order_col="seq",
                                 action="drop_event")
    assert sorted(r.seq for r in out2.collect()) == [1, 2]


def test_line_agg(spark):
    from vector_spark.operators.reduce import line_agg

    df = _events(
        spark,
        [
            Row(seq=1, f="a", line="START x"),
            Row(seq=2, f="a", line="cont1"),
            Row(seq=3, f="a", line="START y"),
            Row(seq=4, f="a", line="cont2"),
            Row(seq=5, f="b", line="solo"),
        ],
    )
    out = line_agg(
        df, group_by=["f"], order_col="seq", line_col="line",
        starts_when=F.col("line").startswith("START"),
    ).collect()
    got = {(r.f, r.message_id): (r.message, r.n_lines) for r in out}
    assert got[("a", 1)] == ("START x\ncont1", 2)
    assert got[("a", 2)] == ("START y\ncont2", 2)
    assert got[("b", 0)] == ("solo", 1)


def test_delay(spark):
    import datetime

    from vector_spark.operators import delay

    base = datetime.datetime(2024, 1, 1)
    df = _events(
        spark,
        [Row(seq=1, ts=base, level="error"), Row(seq=2, ts=base, level="info")],
    )
    out = delay(df, delay_ms=500, ts_col="ts",
                condition=F.col("level") == "error").collect()
    got = {r.seq: (r.emit_ts - r.ts).total_seconds() for r in out}
    assert got == {1: 0.5, 2: 0.0}


def test_static_enrich(spark):
    from vector_spark.operators import static_enrich

    df = _events(spark, [Row(seq=1)])
    out = static_enrich(df, {"az": "us-east-1a", "id": "i-1"}, fields=["az"])
    row = out.collect()[0]
    assert row.az == "us-east-1a" and not hasattr(row, "id")


def test_scripted_transform_lifecycle(spark):
    from vector_spark.operators import scripted_transform

    df = _events(spark, [Row(seq=i, v=float(i)) for i in range(10)])

    def init():
        return {"offset": 100.0}

    def process(pdf, ctx):
        out = pdf[["seq"]].copy()
        out["shifted"] = pdf["v"] + ctx["offset"]
        return out

    out = scripted_transform(
        df, process, schema="seq bigint, shifted double", init=init
    ).collect()
    assert {r.seq: r.shifted for r in out} == {i: 100.0 + i for i in range(10)}


def test_remap_error_contract(spark):
    from vector_spark.operators import Assignment, fallible_assignment, remap

    df = _events(
        spark,
        [Row(seq=1, raw="42"), Row(seq=2, raw="nope"), Row(seq=3, raw=None)],
    )
    # default: errored row forwards ORIGINAL values (remap.rs:121-128)
    outs = remap(
        df, [fallible_assignment("n", F.col("raw").try_cast("long"), F.col("raw"))]
    )
    got = {r.seq: r.n for r in outs[""].collect()}
    assert got == {1: 42, 2: None, 3: None}  # seq3: source null → not an error
    # reroute_dropped: errored rows move to the dropped output
    outs2 = remap(
        df,
        [fallible_assignment("n", F.col("raw").try_cast("long"), F.col("raw"))],
        reroute_dropped=True,
    )
    assert sorted(r.seq for r in outs2[""].collect()) == [1, 3]
    dropped = outs2["dropped"].collect()
    assert [r.seq for r in dropped] == [2]
    assert dropped[0].raw == "nope"  # original value preserved


def test_line_agg_modes(spark):
    """The four reference modes (line_agg.rs:317-330) on the doc examples:
    stack traces (continue_through), backslash continuation (continue_past),
    start markers (halt_before), terminators (halt_with)."""
    from vector_spark.operators.reduce import line_agg

    def run(lines, **kw):
        df = _events(
            spark, [Row(seq=i, f="x", line=ln) for i, ln in enumerate(lines)]
        )
        out = line_agg(df, group_by=["f"], order_col="seq", line_col="line", **kw)
        return [r.message for r in out.orderBy("first_seq").collect()]

    # java stack trace: indented lines continue
    msgs = run(
        ["error A", "  at foo", "  at bar", "ok line", "error B", "  at baz"],
        mode="continue_through", condition=F.col("line").startswith("  "),
    )
    assert msgs == ["error A\n  at foo\n  at bar", "ok line", "error B\n  at baz"]
    # trailing backslash: next line continues
    msgs = run(
        ["cmd \\", "arg1 \\", "arg2", "other"],
        mode="continue_past", condition=F.col("line").endswith("\\"),
    )
    assert msgs == ["cmd \\\narg1 \\\narg2", "other"]
    # timestamped start marker
    msgs = run(
        ["[ts] one", "cont", "[ts] two"],
        mode="halt_before", condition=F.col("line").startswith("[ts]"),
    )
    assert msgs == ["[ts] one\ncont", "[ts] two"]
    # semicolon terminator
    msgs = run(
        ["SELECT a", "FROM t;", "DELETE", "FROM u;"],
        mode="halt_with", condition=F.col("line").endswith(";"),
    )
    assert msgs == ["SELECT a\nFROM t;", "DELETE\nFROM u;"]


def test_salted_aggregate_matches_plain(spark):
    from vector_spark.operators.aggregate import salted_aggregate

    rows = [Row(k="hot" if i % 10 else "cold", v=i) for i in range(1000)]
    df = _events(spark, rows)
    salted = salted_aggregate(
        df, ["k"], {"total": ("sum", "v"), "n": ("count", "v"),
                    "mx": ("max", "v")}, salt_buckets=8,
    )
    plain = df.groupBy("k").agg(
        F.sum("v").alias("total"), F.count("v").alias("n"), F.max("v").alias("mx")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_ddsketch_quantile_relative_error(spark):
    """DDSketch contract: quantile estimates within alpha relative error;
    merged sketches equal the sketch of the union."""
    from vector_spark.operators.ddsketch import (
        ddsketch,
        ddsketch_merge,
        ddsketch_quantile,
    )

    vals = [float(i) for i in range(1, 2001)]
    df = _events(spark, [Row(s="a", value=v) for v in vals])
    sk = ddsketch(df, ["s"], alpha=0.02)
    for q in (0.5, 0.9, 0.99):
        est = ddsketch_quantile(sk, ["s"], q, alpha=0.02).collect()[0].quantile_est
        exact = vals[int(q * len(vals)) - 1]
        assert abs(est - exact) / exact < 0.05, (q, est, exact)
    # mergeability: sketch(A) + sketch(B) == sketch(A ∪ B)
    half1 = _events(spark, [Row(s="a", value=v) for v in vals[:1000]])
    half2 = _events(spark, [Row(s="a", value=v) for v in vals[1000:]])
    merged = ddsketch_merge(
        ddsketch(half1, ["s"], alpha=0.02), ddsketch(half2, ["s"], alpha=0.02)
    )
    a = sorted(map(tuple, sk.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b
