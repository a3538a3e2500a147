"""Physical-layout utilities (layout.py): bucketed join runs shuffle-free,
salted join preserves join semantics while splitting hot keys, size-based
repartitioning honors statistics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.layout import (
    read_bucketed,
    repartition_by_size,
    salted_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    orders = spark.range(2000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 97).alias("o_custkey"),
    )
    lines = spark.range(6000).select(
        (F.col("id") % 2000).alias("l_orderkey"),
        (F.col("id") % 13).cast("double").alias("l_qty"),
    )
    write_bucketed(orders, "t_orders_b", "o_orderkey", n_buckets=8,
                   sort_cols="o_orderkey", path=str(wh / "t_orders_b"))
    write_bucketed(
        lines.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lines_b", "o_orderkey", n_buckets=8, sort_cols="o_orderkey",
        path=str(wh / "t_lines_b"),
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lines_b")


def test_bucketed_join_no_shuffle(bucketed_pair):
    spark = bucketed_pair
    a = read_bucketed(spark, "t_orders_b")
    b = read_bucketed(spark, "t_lines_b")
    # disable auto-broadcast: the point is the big-big (sort-merge) path,
    # where bucketing removes BOTH exchanges — a broadcast join would
    # bypass bucketing entirely on these tiny test tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 6000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_no_shuffle(bucketed_pair):
    spark = bucketed_pair
    b = read_bucketed(spark, "t_lines_b")
    agg = b.groupBy("o_orderkey").agg(F.sum("l_qty").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 2000


def test_salted_join_matches_plain_join(spark):
    # hot key: 90% of fact rows share key 0
    fact = spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("fact_id"),
    )
    dim = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("attr")
    )
    plain = fact.join(dim, "k").select("fact_id", "attr")
    salted = salted_join(fact, dim, "k", salt=8).select("fact_id", "attr")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_join_keeps_unmatched(spark):
    fact = spark.createDataFrame(
        [(1, "a"), (99, "b")], "k long, payload string"
    )
    dim = spark.createDataFrame([(1, "d1")], "k long, attr string")
    out = {
        r["payload"]: r["attr"]
        for r in salted_join(fact, dim, "k", salt=4, how="left").collect()
    }
    assert out == {"a": "d1", "b": None}


def test_salted_join_splits_hot_key(spark):
    fact = spark.range(1000).select(F.lit(0).alias("k"), F.col("id").alias("i"))
    dim = spark.createDataFrame([(0, "x")], "k long, attr string")
    salted = salted_join(fact, dim, "k", salt=8)
    # the single hot key spreads across multiple salt sub-keys
    n_salts = (
        fact.withColumn("_salt", F.floor(F.rand(42) * 8).cast("int"))
        .select("_salt").distinct().count()
    )
    assert n_salts > 1
    assert salted.count() == 1000


def test_repartition_by_size(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(100000).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("pad")
    ).write.parquet(p)
    df = spark.read.parquet(p)
    out = repartition_by_size(df, target_mb=1)
    n = out.rdd.getNumPartitions()
    assert n >= 2  # ~8 MB of parquet at 1 MB target must split
    tiny = repartition_by_size(spark.range(10).toDF("id"), target_mb=1024)
    assert tiny.rdd.getNumPartitions() == 1


def test_compact_files(spark, tmp_path):
    from vector_spark.layout import compact_files

    p = str(tmp_path / "frag")
    # 64 tiny files (the streaming-sink fragmentation shape)
    spark.range(10000).repartition(64).write.parquet(p)
    report = compact_files(spark, p, target_mb=256)
    assert report["files_before"] >= 64
    assert report["files_after"] < 8
    assert report["rows"] == 10000
    df = spark.read.parquet(p)
    assert df.count() == 10000
    assert df.agg({"id": "sum"}).first()[0] == 10000 * 9999 // 2
