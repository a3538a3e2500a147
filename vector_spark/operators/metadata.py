"""`aws_ec2_metadata`-style static enrichment — stamp every event with
host/instance metadata from a driver-side dict.

Reference: vector `src/transforms/aws_ec2_metadata.rs:92` — a background
task refreshes instance metadata (instance-id, region, AZ, tags …) and
every event passing through gets the selected fields attached.

Spark mapping: the metadata is a driver-side dict rendered as literal
columns — Catalyst constant-folds them, so the cost at any scale is zero
(no join, no shuffle, no broadcast needed for scalars). A refreshing
variant for streaming re-resolves the dict per `foreachBatch` iteration.
The metadata *fetcher* itself (IMDS HTTP calls) is environment-specific
and injected as a callable — this module never performs network I/O.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def static_enrich(
    df: DataFrame,
    metadata: dict[str, object],
    fields: list[str] | None = None,
    prefix: str = "",
) -> DataFrame:
    """Attach ``metadata`` entries as literal columns.

    fields: subset of keys to attach (default: all), mirroring the
    reference's per-field opt-in list.
    """
    keys = fields if fields is not None else list(metadata)
    out = df
    for k in keys:
        out = out.withColumn(prefix + k, F.lit(metadata.get(k)))
    return out


def refreshing_enrich(
    fetch: Callable[[], dict[str, object]],
    fields: list[str] | None = None,
    prefix: str = "",
) -> Callable[[DataFrame], DataFrame]:
    """Streaming form: returns a per-batch transform for use inside
    ``foreachBatch`` — ``fetch()`` is re-invoked each micro-batch, which is
    the refresh-interval analog of the reference's background task."""

    def apply(batch_df: DataFrame) -> DataFrame:
        return static_enrich(batch_df, fetch(), fields=fields, prefix=prefix)

    return apply
