"""Reduce behavior corpus → sessionize + reduce_op.

Cases adapted from the reference's own suite
(`tests/behavior/transforms/reduce.yaml` — names cited per test), with
the corpus's exact expected outputs. Sessions come from
`sessionize(starts_when/ends_when)` determinized to event order, the
per-session collapse from `reduce_op` (explicit strategies + the
reference's default-merger insertion, `reduce/transform.rs:86-130`).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.operators.reduce import reduce_op, sessionize


def _reduce_sessions(df, group_by, strategies, ends_when=None, starts_when=None,
                     apply_defaults=False):
    s = sessionize(
        df,
        group_by=group_by,
        order_col="seq",
        starts_when=starts_when,
        ends_when=ends_when,
    )
    return reduce_op(
        s,
        group_by=group_by + ["session_id"],
        merge_strategies=strategies,
        order_col="seq",
        apply_defaults=apply_defaults,
    )


# reduce.yaml `reduce_basic`: default merging — strings keep first,
# numbers sum, timestamps keep the first..last range
def test_reduce_basic_default_strategies(spark):
    rows = [
        (1, "first message value", "1", "host1", 5, "2024-01-01 00:00:01", None),
        (2, "second message value", "1", "host2", 7, "2024-01-01 00:00:02", None),
        (3, "other reduce one", "2", "host3", 11, "2024-01-01 00:00:03", None),
        (4, "third message value", "1", "host4", 9, "2024-01-01 00:00:04", True),
        (5, "other reduce two", "2", "host5", 7, "2024-01-01 00:00:05", None),
        (6, "other reduce three", "2", "host6", 2, "2024-01-01 00:00:06", True),
    ]
    df = spark.createDataFrame(
        rows,
        "seq long, message string, request_id string, host string, "
        "counter long, ts_s string, test_end_message boolean",
    ).withColumn("timestamp", F.to_timestamp("ts_s")).drop("ts_s")
    out = _reduce_sessions(
        df, ["request_id"], {}, ends_when=F.col("test_end_message").isNotNull(),
        apply_defaults=True,
    )
    got = {r.request_id: r for r in out.collect()}
    r1, r2 = got["1"], got["2"]
    assert r1.message == "first message value" and r1.host == "host1"
    assert r1.counter == 21 and r1.timestamp_end is not None
    assert r2.message == "other reduce one" and r2.host == "host3"
    assert r2.counter == 20 and r2.timestamp_end is not None


# reduce.yaml `reduce_merge_strategies`: concat / array / concat_newline
def test_reduce_merge_strategies(spark):
    rows = [
        (1, "first message value", "foo", "1", "first"),
        (2, "second message value", "bar baz", "1", "2"),
        (4, "third message value", "qux\nquux", "1", None),
    ]
    df = spark.createDataFrame(
        rows,
        "seq long, message string, another string, request_id string, "
        "other_value string",
    )
    out = _reduce_sessions(
        df,
        ["request_id"],
        {
            "message": ("concat", "message"),
            "another": ("concat_newline", "another"),
            "other_value": ("array", "other_value"),
        },
        ends_when=F.col("seq") == 4,
    ).collect()[0]
    assert out.message == (
        "first message value second message value third message value"
    )
    assert out.another == "foo\nbar baz\nqux\nquux"
    assert out.other_value == ["first", "2", None]


# reduce.yaml `reduce_number_strategies_1` / `_2`: min/max across
# mixed-magnitude values
@pytest.mark.parametrize(
    "vals,want_min,want_max",
    [
        ([(5.1, 3.3), (9.0, 7.2), (5.2, 6.0)], 5.1, 7.2),
        ([(5.0, 3.0), (9.1, 7.0), (5.0, 6.2)], 5.0, 7.0),
    ],
)
def test_reduce_number_strategies(spark, vals, want_min, want_max):
    df = spark.createDataFrame(
        [(i + 1, m, x) for i, (m, x) in enumerate(vals)],
        "seq long, mins double, maxs double",
    ).withColumn("g", F.lit("all"))
    out = _reduce_sessions(
        df, ["g"], {"mins": ("min", "mins"), "maxs": ("max", "maxs")},
        ends_when=F.col("seq") == 3,
    ).collect()[0]
    assert out.mins == want_min and out.maxs == want_max


# reduce.yaml `reduce_ends_when_vrl`: interleaved groups, multiple
# sessions per group — counters 6 / 7 / 5
def test_reduce_ends_when_sessions(spark):
    rows = [
        (1, "1", 1, None), (2, "1", 3, None), (3, "2", 5, None),
        (4, "1", 2, True), (5, "1", 7, None), (6, "2", 2, True),
        (7, "3", 5, True),
    ]
    df = spark.createDataFrame(
        rows, "seq long, request_id string, counter long, end boolean"
    )
    out = _reduce_sessions(
        df, ["request_id"], {"counter": ("sum", "counter")},
        ends_when=F.coalesce(F.col("end"), F.lit(False)),
    )
    sums = {
        (r.request_id, r.session_id): r.counter for r in out.collect()
    }
    assert sums[("1", 0)] == 6      # 1+3+2 (ends at seq 4)
    assert sums[("1", 1)] == 7      # seq 5 opens a new session
    assert sums[("2", 0)] == 7 and sums[("3", 0)] == 5


# reduce.yaml `reduce_ruby_exception`: starts_when begins a new message
# group; continuation lines concat with newline
def test_reduce_ruby_exception(spark):
    msgs = [
        'Started GET "/" for 127.0.0.1 at 2012-03-10 14:28:14 +0100',
        "foobar.rb:6:in `/': divided by 0 (ZeroDivisionError)",
        "  from foobar.rb:6:in `bar'",
        "  from foobar.rb:2:in `foo'",
        "  from foobar.rb:9:in `<main>'",
        'Started GET "/" for 127.0.0.1 at 2012-03-11 14:28:14 +0100',
    ]
    df = spark.createDataFrame(
        [(i + 1, m) for i, m in enumerate(msgs)], "seq long, message string"
    ).withColumn("g", F.lit("all"))
    out = _reduce_sessions(
        df, ["g"], {"message": ("concat_newline", "message")},
        starts_when=F.col("message").rlike(r"^\w.*"),
    )
    got = [r.message for r in out.orderBy("session_id").collect()]
    assert got[0] == msgs[0]
    assert got[1] == "\n".join(msgs[1:5])
    assert got[2] == msgs[5]


# reduce.yaml `reduce_line_continuation`: trailing backslash continues
def test_reduce_line_continuation(spark):
    msgs = [
        "First-line", "Second line\\", "more second line\\     ",
        "end of second line", "third line",
    ]
    df = spark.createDataFrame(
        [(i + 1, m) for i, m in enumerate(msgs)], "seq long, message string"
    ).withColumn("g", F.lit("all"))
    out = _reduce_sessions(
        df, ["g"], {"message": ("concat", "message")},
        ends_when=~F.trim(F.col("message")).endswith("\\"),
    )
    got = [r.message for r in out.orderBy("session_id").collect()]
    assert got == [
        "First-line",
        "Second line\\ more second line\\      end of second line",
        "third line",
    ]


# reduce.yaml `reduce_log_stream`: `<NN> ` prefix starts a message
def test_reduce_log_stream(spark):
    msgs = [
        "<12> first line ", " more of the first line",
        "<22> second line", "<17> third line", "<99> fourth line",
    ]
    df = spark.createDataFrame(
        [(i + 1, m) for i, m in enumerate(msgs)], "seq long, message string"
    ).withColumn("g", F.lit("all"))
    out = _reduce_sessions(
        df, ["g"], {"message": ("concat", "message")},
        starts_when=F.col("message").rlike(r"^<\d\d> "),
    )
    got = [r.message for r in out.orderBy("session_id").collect()]
    assert got[0] == "<12> first line   more of the first line"
    assert got[1] == "<22> second line" and got[2] == "<17> third line"
