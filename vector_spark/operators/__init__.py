"""Transform operator library (SURVEY.md §2.1).

Every operator is a builder: ``op(df, config...) -> DataFrame`` or, for
multi-output transforms (route/exclusive_route/remap-with-dropped),
``-> dict[str, DataFrame]``. Builders are pure DataFrame programs so the
same code path serves batch and Structured Streaming inputs; stateful
streaming variants live in ``vector_spark.streaming``.
"""

from vector_spark.operators.filter import filter_op
from vector_spark.operators.route import route, exclusive_route
from vector_spark.operators.sample import sample
from vector_spark.operators.throttle import throttle
from vector_spark.operators.dedupe import dedupe
from vector_spark.operators.reduce import reduce_op, sessionize
from vector_spark.operators.aggregate import aggregate
from vector_spark.operators.window import window_context
from vector_spark.operators.metrics import (
    log_to_metric,
    metric_to_log,
    trace_to_log,
    incremental_to_absolute,
)
from vector_spark.operators.tag_cardinality import tag_cardinality_limit
from vector_spark.operators.delay import delay
from vector_spark.operators.metadata import static_enrich, refreshing_enrich
from vector_spark.operators.script import scripted_transform
from vector_spark.operators.remap import remap, Assignment, fallible_assignment

__all__ = [
    "remap",
    "Assignment",
    "fallible_assignment",
    "delay",
    "static_enrich",
    "refreshing_enrich",
    "scripted_transform",
    "filter_op",
    "route",
    "exclusive_route",
    "sample",
    "throttle",
    "dedupe",
    "reduce_op",
    "sessionize",
    "aggregate",
    "window_context",
    "log_to_metric",
    "metric_to_log",
    "trace_to_log",
    "incremental_to_absolute",
    "tag_cardinality_limit",
]
