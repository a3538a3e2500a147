"""Event-type conversion transforms: log↔metric↔trace.

- `log_to_metric` (vector `src/transforms/log_to_metric.rs:42`): derive
  Counter/Gauge/Histogram/Set/Summary metrics from log fields; one output
  metric row per configured metric per input row (or aggregated form).
- `metric_to_log` (vector `src/transforms/metric_to_log.rs:30`): serialize
  a metric into a structured log event.
- `trace_to_log` (vector `src/transforms/trace_to_log.rs:17`): traces are
  structurally logs — pure re-tag.
- `incremental_to_absolute` (vector `src/transforms/incremental_to_absolute.rs`):
  running sum per series converting delta metrics to gauges.

Spark: all pure Column programs. The metric envelope here is the tall
schema from SURVEY §1.6: (name, namespace, kind, ts, tags…, value).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class MetricSpec:
    """One derived metric (subset of vector's MetricConfig,
    `log_to_metric.rs:143-157`)."""

    name: str
    type: str = "counter"  # counter | gauge | set | histogram-sample
    field: str | None = None  # None → count-of-events counter
    increment_by_value: bool = False
    kind: str = "incremental"
    tags: dict[str, str] = dc_field(default_factory=dict)  # tag name -> source column


def log_to_metric(
    df: DataFrame,
    metrics: list[MetricSpec],
    ts_col: str = "ts",
    namespace: str | None = None,
) -> DataFrame:
    """Emit one metric row per spec per input row (pre-aggregation shape).

    Output schema: name, namespace, kind, metric_type, ts, value, tags(map).
    Aggregate downstream with operators.aggregate (as vector pipelines do).
    """
    outs = []
    for spec in metrics:
        if spec.field is None or (spec.type == "counter" and not spec.increment_by_value):
            value = F.lit(1.0)
        else:
            value = F.col(spec.field).cast("double")
        tag_pairs: list[Column] = []
        for tag_name, src_col in spec.tags.items():
            tag_pairs.extend([F.lit(tag_name), F.col(src_col).cast("string")])
        tags = F.create_map(*tag_pairs) if tag_pairs else F.create_map()
        outs.append(
            df.select(
                F.lit(spec.name).alias("name"),
                F.lit(namespace).cast("string").alias("namespace"),
                F.lit(spec.kind).alias("kind"),
                F.lit(spec.type).alias("metric_type"),
                F.col(ts_col).alias("ts"),
                value.alias("value"),
                tags.alias("tags"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def metric_to_log(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Flatten a metric row into the log envelope: message carries the
    serialized metric, typed columns are preserved for querying."""
    cols = [c for c in df.columns if c != ts_col]
    return df.select(
        F.col(ts_col).alias("timestamp"),
        F.to_json(F.struct(*[F.col(c) for c in cols])).alias("message"),
        F.lit("metric_to_log").alias("source_type"),
        *[F.col(c) for c in cols],
    )


def trace_to_log(df: DataFrame) -> DataFrame:
    """Traces are logs with trace_id/span_id columns — identity re-tag."""
    return df.withColumn("source_type", F.lit("trace_to_log")) if "source_type" not in df.columns else df


def incremental_to_absolute(
    df: DataFrame,
    series_keys: list[str],
    value_col: str = "value",
    order_col: str = "ts",
    out_col: str = "absolute_value",
    exact_decimals: int | None = 2,
) -> DataFrame:
    """Cumulative sum per series in event order (delta → gauge).

    Exact DECIMAL accumulation keeps the running total order-stable in
    floating point (same rationale as aggregate.exact_decimals).
    """
    w = (
        Window.partitionBy(*series_keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col(value_col)
    if exact_decimals is not None:
        run = F.sum(v.cast(f"decimal(28,{exact_decimals})")).over(w).cast("double")
    else:
        run = F.sum(v).over(w)
    return df.withColumn(out_col, run)
