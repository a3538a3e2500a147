"""vector_spark — a PySpark-native analytics/pipeline engine with the
query and data-processing capabilities of vectordotdev/vector (v0.58.0).

Reference semantics are taken from the public vectordotdev/vector repo
(studied read-only); the execution strategy is Spark-first: every
operator is a DataFrame->DataFrame (or DataFrame->dict[str, DataFrame])
builder, so Catalyst handles pushdown, pruning, join selection and
whole-stage codegen. Streaming mode reuses the same builders on
``readStream`` inputs (see ``vector_spark.streaming``).

Layout:
  session    - SparkSession builder tuned for local[N] testing + cluster defaults
  tables     - loaders for the synthetic star schema under /root/testdata
  operators  - the transform library (SURVEY.md §2.1): filter, route,
               exclusive_route, sample, throttle, dedupe, reduce, aggregate,
               window, delay, log_to_metric, metric_to_log, trace_to_log,
               incremental_to_absolute, tag_cardinality_limit
  functions  - VRL-subset scalar function surface mapped to Column exprs
  dataops    - large-scale training-data ops: dedup (exact/minhash/simhash/
               jaccard/embedding), similarity search, text analysis, multimodal
  config     - YAML topology loader (sources -> transforms -> sinks DAG)
  streaming  - Structured Streaming wrappers + stateful operators
"""

__version__ = "0.1.0"

from vector_spark.cache import clear_caches, persisted_rdd_count  # noqa: E402,F401
