"""Streaming sources, sinks, and window/dedupe/session operators.

Semantic mapping from the reference (all timers there are processing-time,
`expire_after_ms`/`interval_ms`/`flush_period_ms`; SURVEY §2.7):
- `aggregate` interval_ms → event-time tumbling window + watermark.
- `dedupe` TTL cache (`time_settings`) → dropDuplicatesWithinWatermark.
- `reduce expire_after_ms` → session_window gap.
Vector never drops late data (late events land in the currently-open
bucket); Spark watermarks DO bound lateness. We default the watermark to a
generous multiple of the window and expose it as config — this is a
documented semantic delta, traded for exactly-once state cleanup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


# ---- sources -----------------------------------------------------------

def rate_source(
    spark: SparkSession,
    rows_per_second: int = 1000,
    num_partitions: int | None = None,
    rows_per_batch: int | None = None,
    advance_millis_per_batch: int | None = None,
) -> DataFrame:
    """Synthetic generator (the demo_logs analog for tests/benchmarks).

    With *rows_per_batch* set, uses Spark's ``rate-micro-batch`` source
    instead of wall-clock ``rate``: every micro-batch carries EXACTLY
    that many rows with sequential seqs and event timestamps advancing
    *advance_millis_per_batch* per batch — fully deterministic content,
    so a consumer that waits for N batches knows precisely which rows it
    has, however slow the host is. This is the mode tests should use.
    """
    if rows_per_batch is not None:
        reader = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", rows_per_batch)
        )
        if advance_millis_per_batch is not None:
            reader = reader.option(
                "advanceMillisPerBatch", advance_millis_per_batch
            )
    else:
        reader = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second)
        )
    if num_partitions:
        reader = reader.option("numPartitions", num_partitions)
    df = reader.load()  # (timestamp, value)
    return df.select(
        F.col("value").alias("seq"),
        F.col("timestamp").alias("ts"),
        F.concat(F.lit("demo log line "), F.col("value")).alias("message"),
        (F.col("value") % 50).cast("string").alias("host"),
        F.lit("rate").alias("source_type"),
    )


def file_stream_source(
    spark: SparkSession,
    path: str,
    fmt: str = "json",
    schema=None,
    max_files_per_trigger: int | None = None,
    options: dict | None = None,
) -> DataFrame:
    """File-tail source (vector `file` source ≈ Spark's file stream: the
    engine tracks processed files in the checkpoint — its checkpointing,
    `lib/file-source-common/src/checkpointer.rs`, is built in here)."""
    reader = spark.readStream.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)


# ---- operators ---------------------------------------------------------

def streaming_aggregate(
    df: DataFrame,
    interval_secs: int,
    series_keys: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    watermark: str | None = None,
    modes: list[str] | None = None,
) -> DataFrame:
    """Event-time tumbling-window aggregation (vector `aggregate`)."""
    modes = modes or ["count", "sum", "min", "max", "mean"]
    wm = watermark or f"{interval_secs * 4} seconds"
    v = F.col(value_col)
    agg_map = {
        "count": F.count(v).alias("count"),
        "sum": F.sum(v).alias("sum"),
        "min": F.min(v).alias("min"),
        "max": F.max(v).alias("max"),
        "mean": F.avg(v).alias("mean"),
    }
    aggs = [agg_map[m] for m in modes]
    return (
        df.withWatermark(ts_col, wm)
        .groupBy(F.window(F.col(ts_col), f"{interval_secs} seconds"), *series_keys)
        .agg(*aggs)
        .select(
            F.col("window.start").alias("bucket_start"),
            F.col("window.end").alias("bucket_end"),
            *series_keys,
            *[F.col(m) for m in modes],
        )
    )


def streaming_dedupe(
    df: DataFrame,
    fields: list[str],
    ts_col: str = "ts",
    ttl: str = "1 hour",
) -> DataFrame:
    """dedupe with TTL (vector TimedDedupe, `dedupe/timed_transform.rs`):
    duplicates suppressed while the key is inside the watermark horizon."""
    return df.withWatermark(ts_col, ttl).dropDuplicatesWithinWatermark(fields)


def streaming_session_reduce(
    df: DataFrame,
    group_by: list[str],
    gap_secs: int,
    ts_col: str = "ts",
    aggs: list[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """reduce with expire_after_ms → session_window with the same gap."""
    wm = watermark or f"{gap_secs * 2} seconds"
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    return (
        df.withWatermark(ts_col, wm)
        .groupBy(F.session_window(F.col(ts_col), f"{gap_secs} seconds"), *group_by)
        .agg(*aggs)
        .withColumn("session_start", F.col("session_window.start"))
        .withColumn("session_end", F.col("session_window.end"))
        .drop("session_window")
    )


# ---- sinks -------------------------------------------------------------

def memory_sink(df: DataFrame, name: str, output_mode: str = "append"):
    """In-memory table sink — the `vector tap` analog for inspecting a
    running pipeline (vector `src/tap/cmd.rs:13`)."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )


def parquet_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    trigger_secs: int = 1,
    available_now: bool = False,
):
    """File sink with checkpointed exactly-once delivery (the reference's
    end-to-end-ack analog: offsets+commit log in the checkpoint).

    available_now=True runs in incremental-batch mode (Trigger.
    AvailableNow): process everything new since the last run, then stop.
    This is the cron-batch ingest pattern at scale — each invocation picks
    up exactly the unprocessed files recorded in the checkpoint, giving
    exactly-once across scheduled runs without a resident streaming job."""
    w = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    else:
        w = w.trigger(processingTime=f"{trigger_secs} seconds")
    return w.start()


def socket_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    """TCP line source (vector `socket`/`syslog` source analog for dev;
    framing = newline-delimited). Production ingest belongs on kafka."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
        .select(
            F.col("value").alias("message"),
            F.current_timestamp().alias("ts"),
            F.lit("socket").alias("source_type"),
        )
    )


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    options: dict | None = None,
) -> DataFrame:
    """Kafka source (vector `src/sources/kafka.rs:92`): consumer offsets
    live in the checkpoint — the built-in equivalent of the reference's
    commit-after-ack. Emits the raw envelope; decode with the codec layer
    (from_json / parse_syslog / …) downstream."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    df = reader.load()
    return df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("message"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset").alias("seq"),
        F.col("timestamp").alias("ts"),
        F.lit("kafka").alias("source_type"),
    )


def console_sink(df: DataFrame, trigger_secs: int = 1, truncate: bool = False):
    """Console sink (vector `console` sink analog — debugging only)."""
    return (
        df.writeStream.format("console")
        .option("truncate", str(truncate).lower())
        .trigger(processingTime=f"{trigger_secs} seconds")
        .start()
    )


def foreach_batch_sink(
    df: DataFrame,
    handler,
    checkpoint: str,
    trigger_secs: int = 1,
):
    """Escape hatch for request/response sinks (http, clickhouse, redis …
    — the reference's entire sink zoo): ``handler(batch_df, epoch_id)``
    runs per micro-batch; pair the checkpointed epoch_id with idempotent
    writes for the end-to-end-ack equivalent (SURVEY §2.4 acks row).
    """
    return (
        df.writeStream.foreachBatch(handler)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_secs} seconds")
        .start()
    )


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    value_col: str = "message",
    key_col: str | None = None,
):
    """Kafka sink (vector `kafka` sink): value from ``value_col`` (encode
    upstream with to_json/format_string codec helpers)."""
    out = df.select(
        *( [F.col(key_col).cast("string").alias("key")] if key_col else [] ),
        F.col(value_col).cast("string").alias("value"),
    )
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def demux_sink(
    df: DataFrame,
    routes: list,
    base_path: str,
    checkpoint: str,
    fmt: str = "parquet",
    trigger_secs: int = 1,
    tag_col: str = "_route",
):
    """Multi-output fan-out as ONE streaming query: tag each event with
    its (first-match-wins) route, then partition the write by route —
    every route lands under base_path/<tag_col>=<name>/.

    The reference fans one component's output to N sinks via per-sink
    channels (`src/topology/builder.rs` fanout); the naive Spark mapping
    is one query per sink, which re-reads the source N times. This demux
    reads ONCE: route evaluation is a narrow projection, and the sink's
    dynamic partitioning is the fan-out. Routes follow exclusive_route
    semantics (`_default` catches the rest).
    """
    from vector_spark.operators.route import exclusive_route_tag

    tagged = exclusive_route_tag(df, routes, tag_col=tag_col)
    return (
        tagged.writeStream.format(fmt)
        .partitionBy(tag_col)
        .option("path", base_path)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_secs} seconds")
        .start()
    )
