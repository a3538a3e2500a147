"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship pipeline on sf0.001 (smoke check)
queries()     -> one builder per implemented operator (SURVEY.md §2)
oracle_sql()  -> matching DuckDB SQL for the correctness gate
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vector_spark.plans.queries import QUERIES

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the vector-style pipeline filter → remap → aggregate
    over the events table (SURVEY.md §7 phase-0 slice)."""
    from pyspark.sql import functions as F

    from vector_spark.operators import filter_op
    from vector_spark.operators.throttle import time_bucket
    from vector_spark.plans.queries import _cents
    from vector_spark.tables import load_table

    ev = load_table(spark, _SMOKE_SF_DIR, "events")
    # filter: keep meaningful events
    ev = filter_op(ev, F.col("value").isNotNull() & (F.col("value") > 0))
    # remap: parse props JSON, derive typed fields
    ev = ev.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        _cents(F.col("value")).alias("vc"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    # aggregate: hourly rollup per event_type
    out = (
        ev.withColumn("bucket", time_bucket(F.col("ts"), 3600))
        .groupBy("bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("vc") / 100.0).alias("sum_value"),
            F.avg("k").alias("avg_k"),
        )
    )
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
