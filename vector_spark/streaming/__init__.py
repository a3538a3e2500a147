"""Structured Streaming execution mode (SURVEY.md §7 phase 3).

The batch operator builders in vector_spark.operators are pure DataFrame
programs, so most apply unchanged to streaming DataFrames. This package
adds what genuinely differs in streaming:

- sources/sinks: readStream/writeStream wrappers (rate, file, socket,
  memory, console, foreachBatch)
- event-time windowed aggregation with watermarks (vector uses
  processing-time flush timers and never drops late data — SURVEY §2.7;
  we default to generous watermarks and document the delta)
- stateful operators that need explicit state: streaming dedupe
  (dropDuplicatesWithinWatermark), session reduce (session_window),
  throttle (applyInPandasWithState GCRA counters), memory enrichment
  tables (foreachBatch-refreshed broadcast)
"""

from vector_spark.streaming.pipeline import (
    streaming_aggregate,
    streaming_dedupe,
    streaming_session_reduce,
    rate_source,
    file_stream_source,
    socket_source,
    kafka_source,
    memory_sink,
    console_sink,
    foreach_batch_sink,
    kafka_sink,
)
from vector_spark.streaming.stateful import (
    streaming_throttle,
    streaming_lru_dedupe,
    streaming_tag_cardinality_limit,
)
