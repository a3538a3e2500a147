"""Reference lua_v2 + task_transform behavior corpora, ported.

Sources: `tests/behavior/transforms/lua_v2.yaml` (process hooks mutating
log/metric events) and `tests/behavior/transforms/task_transform.yaml`
(task transforms fed by multiple inputs). The scripting language here is
Python over Arrow batches (operators/script.py) — each case keeps the
reference's observable contract."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from vector_spark.operators.dedupe import dedupe
from vector_spark.operators.script import scripted_transform


# lua_v2.yaml `lua_v2_log`: event.log.a, event.log.b = nil, event.log.a
def test_lua_v2_rename_field(spark):
    df = spark.createDataFrame([("example value",)], "a string")

    def process(pdf: pd.DataFrame, ctx) -> pd.DataFrame:
        out = pd.DataFrame({"b": pdf["a"]})
        return out

    row = scripted_transform(df, process, "b string").head()
    assert row.asDict() == {"b": "example value"}  # !exists(.a) && .b == old .a


# lua_v2.yaml `lua_v2_source`: named hook inserts a field
def test_lua_v2_insert_field(spark):
    df = spark.createDataFrame([("x",)], "existing string")

    def process(pdf, ctx):
        pdf = pdf.copy()
        pdf["inserted_field"] = "inserted value"
        return pdf

    row = scripted_transform(
        df, process, "existing string, inserted_field string"
    ).head()
    assert row["inserted_field"] == "inserted value"
    assert row["existing"] == "x"


# lua_v2.yaml `lua_v2_metric`: counter.value += 1
def test_lua_v2_metric_increment(spark):
    df = spark.createDataFrame(
        [("example", "counter", 1.0)], "name string, kind string, value double"
    )

    def process(pdf, ctx):
        pdf = pdf.copy()
        pdf["value"] = pdf["value"] + 1
        return pdf

    row = scripted_transform(df, process, df.schema).head()
    assert row["value"] == 2.0


# lua_v2.yaml `lua_v2_log_to_metric`: replace the log event with a metric
def test_lua_v2_log_to_metric(spark):
    df = spark.createDataFrame([("some log",)], "message string")

    def process(pdf, ctx):
        return pd.DataFrame(
            {
                "name": ["example metric"] * len(pdf),
                "kind": ["counter"] * len(pdf),
                "value": [1.0] * len(pdf),
            }
        )

    row = scripted_transform(
        df, process, "name string, kind string, value double"
    ).head()
    assert row.asDict() == {"name": "example metric", "kind": "counter", "value": 1.0}


# lua_v2.yaml `lua_v2_metric_to_log`
def test_lua_v2_metric_to_log(spark):
    df = spark.createDataFrame(
        [("m", "counter", 1.0)], "name string, kind string, value double"
    )

    def process(pdf, ctx):
        return pd.DataFrame({"field": ["example value"] * len(pdf)})

    row = scripted_transform(df, process, "field string").head()
    assert row.asDict() == {"field": "example value"}


# task_transform.yaml `dedupe_with_multiple_inputs`: two remap inputs union
# into one dedupe; same id arrives from both → one survivor
def test_task_transform_multi_input_dedupe(spark):
    f1 = spark.createDataFrame([(1, "value1")], "id long, field1 string")
    f2 = spark.createDataFrame([(1, "value2")], "id long, field2 string")
    merged = f1.unionByName(f2, allowMissingColumns=True).withColumn(
        "_seq", F.monotonically_increasing_id()
    )
    out = dedupe(merged, match=["id"], order_col="_seq")
    assert out.count() == 1


# task_transform.yaml `reduce_with_multiple_inputs`: three remap inputs
# into one reduce over a shared key — one event out carrying all fields
def test_task_transform_multi_input_reduce(spark):
    from vector_spark.operators.reduce import reduce_op

    parts = [
        spark.createDataFrame([(1, "value1", None, None)],
                              "id long, field1 string, field2 string, field3 string"),
        spark.createDataFrame([(1, None, "value2", None)],
                              "id long, field1 string, field2 string, field3 string"),
        spark.createDataFrame([(1, None, None, "value3")],
                              "id long, field1 string, field2 string, field3 string"),
    ]
    merged = parts[0].unionByName(parts[1]).unionByName(parts[2])
    merged = merged.withColumn("_seq", F.monotonically_increasing_id())
    out = reduce_op(
        merged,
        group_by=["id"],
        merge_strategies={
            "field1": ("retain", "field1"),
            "field2": ("retain", "field2"),
            "field3": ("retain", "field3"),
        },
        order_col="_seq",
    )
    rows = out.collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    assert (got["field1"], got["field2"], got["field3"]) == (
        "value1", "value2", "value3",
    )
