"""VRL internal-metrics functions (lib/vector-vrl/metrics): search and
aggregation over the engine's own counters, pinned to the reference's
matching/wildcard/aggregation semantics and its metric_into_vrl shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.functions.vrl import VRL_FUNCTIONS as V
from vector_spark.functions.vrl_metrics import (
    METRICS_STORAGE,
    MetricsStorage,
    _tag_matches,
)


def one(spark, col):
    return spark.range(1).select(col.alias("v")).head()[0]


@pytest.fixture(autouse=True)
def _seed_storage():
    METRICS_STORAGE.store([
        {"name": "utilization", "tags": {"component_id": "test"},
         "type": "gauge", "kind": "absolute", "value": 0.5},
        {"name": "utilization", "tags": {"component_id": "other"},
         "type": "gauge", "kind": "absolute", "value": 0.25},
        {"name": "events_total", "tags": {"component_id": "sink-a"},
         "type": "counter", "kind": "incremental", "value": 10.0},
        {"name": "events_total", "tags": {"component_id": "sink-b"},
         "type": "counter", "kind": "incremental", "value": 32.0},
        {"name": "latency", "tags": {}, "type": "distribution",
         "kind": "absolute", "value": None},
    ])
    yield
    METRICS_STORAGE.store([])
    METRICS_STORAGE.attach_view(None)


def test_tag_wildcard_semantics():
    # common.rs:101-110 — one '*' splits into prefix/suffix
    assert _tag_matches({"c": "sink-a"}, "c", "sink-*")
    assert _tag_matches({"c": "sink-a"}, "c", "*-a")
    assert _tag_matches({"c": "sink-a"}, "c", "s*a")
    assert not _tag_matches({"c": "sink-a"}, "c", "src-*")
    assert not _tag_matches({}, "c", "*")  # missing tag never matches
    assert _tag_matches({"c": "x"}, "c", "x")
    assert not _tag_matches({"c": "x"}, "c", "y")


def test_get_vector_metric_shape(spark):
    # metric_into_vrl shape: name/tags-as-arrays/type/kind/value
    got = one(spark, V["get_vector_metric"]("utilization"))
    assert got["name"] == "utilization"
    assert got["tags"] == {"component_id": ["test"]}
    assert got["type"] == "gauge" and got["kind"] == "absolute"
    assert got["value"] == 0.5


def test_get_vector_metric_tag_filter_and_miss(spark):
    got = one(
        spark,
        V["get_vector_metric"]("utilization", {"component_id": "other"}),
    )
    assert got["value"] == 0.25
    assert one(spark, V["get_vector_metric"]("nope")) is None


def test_find_vector_metrics_wildcard(spark):
    found = one(
        spark,
        V["find_vector_metrics"]("events_total", {"component_id": "sink-*"}),
    )
    assert [m["value"] for m in found] == [10.0, 32.0]
    empty = one(spark, V["find_vector_metrics"]("events_total",
                                                {"component_id": "src-*"}))
    assert empty == []


def test_non_scalar_metric_value_is_null(spark):
    got = one(spark, V["get_vector_metric"]("latency"))
    assert got["type"] == "distribution" and got["value"] is None


def test_aggregate_vector_metrics(spark):
    agg = V["aggregate_vector_metrics"]
    assert one(spark, agg("sum", "events_total")) == 42.0
    assert one(spark, agg("avg", "events_total")) == 21.0
    assert one(spark, agg("max", "events_total")) == 32.0
    assert one(spark, agg("min", "events_total")) == 10.0
    # zero matches: sum is 0.0, the others null; non-scalar types excluded
    assert one(spark, agg("sum", "nope")) == 0.0
    assert one(spark, agg("max", "nope")) is None
    assert one(spark, agg("sum", "latency")) == 0.0
    with pytest.raises(ValueError, match="unknown function"):
        agg("median", "events_total")


def test_view_counters_join_snapshot(spark):
    class _FakeView:
        counters = {"my-sink": {"sent_events_total": 7}}

    METRICS_STORAGE.attach_view(_FakeView())
    got = one(spark, V["get_vector_metric"]("sent_events_total"))
    assert got["tags"] == {"component_id": ["my-sink"]}
    assert got["value"] == 7.0 and got["type"] == "counter"


def test_through_vrl_compiler(spark):
    from vector_spark.functions.vrl_compiler import vrl_remap

    df = spark.range(2).select(F.col("id").alias("event_id"))
    outs = vrl_remap(
        df,
        '.total = aggregate_vector_metrics("sum", "events_total")\n'
        '.util = get_vector_metric("utilization").value',
    )
    r = outs[""].head()
    assert r["total"] == 42.0 and r["util"] == 0.5


def test_storage_isolation():
    s = MetricsStorage()
    assert s.find_metrics("x", None) == []
    s.store([{"name": "x", "tags": {}, "type": "gauge", "kind": "absolute",
              "value": 1.0}])
    assert s.get_metric("x", None)["value"] == 1.0
