"""As-of join (operators/asof.py): value semantics vs hand-computed
matches, inclusive-equal-ts contract, forward direction, tolerance, and
the plan-shape invariant (single partitioned window, no range explode)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vector_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def sides(spark):
    fact = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01 10:00:00"), "a"),
            (2, 7, _ts("2024-01-01 12:00:00"), "b"),
            (3, 7, _ts("2024-01-01 09:00:00"), "c"),  # before any dim row
            (4, 8, _ts("2024-01-01 11:00:00"), "d"),
            (5, 9, _ts("2024-01-01 11:00:00"), "e"),  # key with no dim rows
        ],
        "event_id long, user_id long, ts timestamp, payload string",
    )
    dim = spark.createDataFrame(
        [
            (7, _ts("2024-01-01 10:00:00"), "v1"),  # equal ts: visible to fact 1
            (7, _ts("2024-01-01 11:30:00"), "v2"),
            (8, _ts("2024-01-01 08:00:00"), "v8"),
        ],
        "user_id long, ts timestamp, state string",
    )
    return fact, dim


def test_backward_inclusive_matches(sides):
    fact, dim = sides
    out = {
        r["event_id"]: (r["state"], r["asof_ts"])
        for r in asof_join(fact, dim, on="user_id").collect()
    }
    assert len(out) == 5
    assert out[1][0] == "v1"  # equal-ts dim row IS visible (inclusive)
    assert out[2][0] == "v2"  # most recent, not just any earlier
    assert out[3] == (None, None)  # nothing at-or-before -> left-join null
    assert out[4][0] == "v8"
    assert out[5] == (None, None)  # key absent from dim


def test_forward_direction(sides):
    fact, dim = sides
    out = {
        r["event_id"]: r["state"]
        for r in asof_join(fact, dim, on="user_id", direction="forward").collect()
    }
    assert out[3] == "v1"      # earliest at-or-after 09:00 is 10:00/v1
    assert out[1] == "v1"      # equal ts inclusive in forward too
    assert out[2] is None      # nothing after 12:00
    assert out[4] is None      # dim row is before the fact -> no forward match


def test_tolerance_nulls_stale_matches(sides):
    fact, dim = sides
    out = {
        r["event_id"]: r["state"]
        for r in asof_join(
            fact, dim, on="user_id", tolerance_sec=3600
        ).collect()
    }
    assert out[1] == "v1"   # age 0
    assert out[2] == "v2"   # age 30 min
    assert out[4] is None   # age 3 h > tolerance


def test_fact_columns_preserved_and_suffix(sides):
    fact, dim = sides
    out = asof_join(fact, dim, on="user_id", suffix="_dim")
    assert out.columns == [
        "event_id", "user_id", "ts", "payload", "asof_ts", "state_dim"
    ]


def test_null_dim_values_do_not_stitch_rows(spark):
    # Review finding r3 (high): filling each dim column independently with
    # last(ignorenulls) stitched fields from DIFFERENT dim rows when the
    # matched row held a null — the match must be row-atomic: all output
    # fields from the single matched dim row, nulls included.
    fact = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01 11:30:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    dim = spark.createDataFrame(
        [
            (7, _ts("2024-01-01 09:00:00"), "old_c1", "old_c2"),
            (7, _ts("2024-01-01 11:00:00"), "new_c1", None),
        ],
        "user_id long, ts timestamp, c1 string, c2 string",
    )
    [r] = asof_join(fact, dim, on="user_id").collect()
    assert r["c1"] == "new_c1"
    assert r["c2"] is None  # NOT "old_c2" from the 09:00 row
    assert r["asof_ts"] == _ts("2024-01-01 11:00:00")


def test_plan_single_partitioned_window_no_join(sides):
    fact, dim = sides
    plan = (
        asof_join(fact, dim, on="user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the scalable formulation: union + ONE window partitioned by the key;
    # no join operator (a range/theta join would explode at scale)
    assert plan.count("Window") == 1
    assert "Join" not in plan
    assert "user_id" in plan.split("Window", 1)[1][:300]
