"""Datadog-search condition dialect tests (vector src/conditions/)."""

from __future__ import annotations

from pyspark.sql import Row

from vector_spark.functions.search import datadog_search


def _ids(df, cond):
    return sorted(r.seq for r in df.where(cond).collect())


def test_search_basic_and_or(spark):
    df = spark.createDataFrame(
        [
            Row(seq=1, status="error", service="api", message="boom"),
            Row(seq=2, status="info", service="api", message="ok"),
            Row(seq=3, status="error", service="web", message="crash boom"),
        ]
    )
    assert _ids(df, datadog_search("status:error")) == [1, 3]
    assert _ids(df, datadog_search("status:error AND service:api")) == [1]
    assert _ids(df, datadog_search("status:error service:api")) == [1]  # adjacency=AND
    assert _ids(df, datadog_search("service:web OR status:info")) == [2, 3]
    assert _ids(df, datadog_search("-status:error")) == [2]
    assert _ids(df, datadog_search("NOT (status:error OR service:web)")) == [2]


def test_search_wildcard_quoted_default_field(spark):
    df = spark.createDataFrame(
        [
            Row(seq=1, service="api-gateway", message="request failed"),
            Row(seq=2, service="api-auth", message="login ok"),
            Row(seq=3, service="worker", message="request failed"),
        ]
    )
    assert _ids(df, datadog_search("service:api-*")) == [1, 2]
    assert _ids(df, datadog_search('message:"request failed"')) == [1, 3]
    assert _ids(df, datadog_search('"login ok"')) == [2]  # default field


def test_search_numeric_and_range(spark):
    df = spark.createDataFrame(
        [Row(seq=1, latency=10.0), Row(seq=2, latency=150.0), Row(seq=3, latency=99.0)]
    )
    assert _ids(df, datadog_search("latency:>100")) == [2]
    assert _ids(df, datadog_search("latency:<=99")) == [1, 3]
    assert _ids(df, datadog_search("latency:[50 TO 150]")) == [2, 3]
