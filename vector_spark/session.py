"""SparkSession factory.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default all cores); the
same configuration keys are what we would set on a real cluster — AQE for
runtime re-planning (skew joins, coalescing post-shuffle partitions),
Arrow for any pandas-UDF path, and a shuffle-partition count sized to the
parallelism actually available rather than Spark's default 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "vector_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    At cluster scale the master/conf come from spark-submit; everything here
    is written so that local[N] settings don't fight a real deployment:
    we only force ``master`` when no active session exists.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core avoids tiny-task overhead;
        # on a real cluster this would be ~2-3x total executor cores or left
        # to AQE coalescing (enabled below).
        shuffle_partitions = max(cpus, 1)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # VRL merge / map building is right-wins on duplicate keys
        # (src/stdlib merge); Spark's default EXCEPTION policy would
        # throw mid-query instead
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # broadcast threshold: enrichment tables (SURVEY §2.2) are small dims
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
