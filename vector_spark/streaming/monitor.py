"""Pipeline observability — the `vector top` / `vector tap` analogs.

Reference: `vector top` shows live per-component throughput over the
gRPC API (`src/api/`); `vector tap` samples any component's output
(`src/tap/cmd.rs:13`).

Spark mapping:
- top  → a StreamingQueryListener accumulating per-query progress
  (rows/s, batch durations) from the engine's own metrics stream.
- tap  → memory_sink on any component output (streaming/pipeline.py);
  for batch topologies `topo.output(ref).limit(n)` IS the tap.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class QueryStats:
    name: str
    n_batches: int = 0
    total_rows: int = 0
    last_rows_per_sec: float = 0.0
    recent_batch_ms: deque = field(default_factory=lambda: deque(maxlen=20))

    @property
    def avg_batch_ms(self) -> float:
        return (
            sum(self.recent_batch_ms) / len(self.recent_batch_ms)
            if self.recent_batch_ms
            else 0.0
        )


class TopListener(StreamingQueryListener):
    """Collects per-query throughput; read .stats like `vector top` rows."""

    def __init__(self) -> None:
        self.stats: dict[str, QueryStats] = {}

    def onQueryStarted(self, event) -> None:
        self.stats.setdefault(event.name or event.id, QueryStats(event.name or event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        key = p.name or p.id
        s = self.stats.setdefault(key, QueryStats(key))
        s.n_batches += 1
        s.total_rows += p.numInputRows
        s.last_rows_per_sec = p.processedRowsPerSecond or 0.0
        if p.batchDuration is not None:
            s.recent_batch_ms.append(p.batchDuration)

    def onQueryTerminated(self, event) -> None:
        pass

    def render(self) -> str:
        """One line per query, `vector top` style."""
        lines = [f"{'QUERY':<24}{'BATCHES':>8}{'ROWS':>12}{'ROWS/S':>12}{'BATCH MS':>10}"]
        for s in self.stats.values():
            lines.append(
                f"{s.name[:24]:<24}{s.n_batches:>8}{s.total_rows:>12}"
                f"{s.last_rows_per_sec:>12.1f}{s.avg_batch_ms:>10.1f}"
            )
        return "\n".join(lines)


def attach_top(spark: SparkSession) -> TopListener:
    """Register and return the listener (detach with removeListener)."""
    listener = TopListener()
    spark.streams.addListener(listener)
    return listener
