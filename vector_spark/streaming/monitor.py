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

import threading
import time
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


class ProgressBarrier(StreamingQueryListener):
    """Event-driven wait on streaming progress — the deterministic
    replacement for wall-clock ``sleep``-polling.

    A waiter blocks on a condition variable that every engine progress
    event signals, then re-evaluates its goal (cumulative input rows,
    batch count, or an arbitrary predicate). Under heavy host load this
    waits exactly as long as the engine actually needs — no fixed poll
    cadence to mis-tune, no redundant driver queries between batches —
    and the timeout is a pure backstop for a hung query, not a tuned
    guess about machine speed.

    Reference analog: the engine's own metrics stream drives `vector
    top`'s display (`src/api/`); here the same event stream drives test
    synchronization.
    """

    def __init__(self) -> None:
        self._cond = threading.Condition()
        self._rows: dict[str, int] = {}  # query id -> cumulative input rows
        self._batches: dict[str, int] = {}  # query id -> progress events seen

    # -- listener callbacks (engine listener-bus thread) -----------------
    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        qid = str(p.id)
        with self._cond:
            self._rows[qid] = self._rows.get(qid, 0) + (p.numInputRows or 0)
            self._batches[qid] = self._batches.get(qid, 0) + 1
            self._cond.notify_all()

    def onQueryTerminated(self, event) -> None:
        with self._cond:
            self._cond.notify_all()  # wake waiters so they can fail fast

    # -- waiter side -----------------------------------------------------
    def rows_of(self, query) -> int:
        with self._cond:
            return self._rows.get(str(query.id), 0)

    def batches_of(self, query) -> int:
        with self._cond:
            return self._batches.get(str(query.id), 0)

    def wait(
        self,
        query=None,
        *,
        rows: int | None = None,
        batches: int | None = None,
        predicate=None,
        timeout: float = 60.0,
    ) -> None:
        """Block until the goal holds, waking on each progress event.

        Goals (any combination; all given must hold): *rows* — the
        query's cumulative ``numInputRows`` ≥ rows; *batches* — number of
        progress events ≥ batches; *predicate* — a zero-arg callable
        evaluated on the waiter thread after every progress event (safe
        to run driver-side queries in). Raises ``AssertionError`` with
        the observed counts if *timeout* (backstop, not cadence) expires.
        """
        if query is None and (rows is not None or batches is not None):
            raise ValueError(
                "rows/batches goals need the query they refer to — "
                "without it the barrier would return vacuously"
            )
        qid = str(query.id) if query is not None else None

        def counts_ok() -> bool:
            if qid is not None and rows is not None:
                if self._rows.get(qid, 0) < rows:
                    return False
            if qid is not None and batches is not None:
                if self._batches.get(qid, 0) < batches:
                    return False
            return True

        deadline = time.monotonic() + timeout
        while True:
            with self._cond:
                ok = counts_ok()
            # predicate may run driver-side queries — evaluate OUTSIDE the
            # lock so the listener-bus thread is never blocked behind it
            if ok and (predicate is None or predicate()):
                return
            # a dead query will never make more progress: surface ITS
            # exception now instead of a misleading timeout later
            if query is not None and not query.isActive:
                # the last progress event may have landed between the
                # goal check above and this liveness check — final retry
                with self._cond:
                    ok = counts_ok()
                if ok and (predicate is None or predicate()):
                    return
                exc = None
                try:
                    exc = query.exception()
                except Exception:
                    pass
                raise AssertionError(
                    f"query terminated before the barrier goal: {exc!r}"
                    if exc
                    else "query terminated (stopped) before the barrier goal"
                )
            with self._cond:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    raise AssertionError(
                        "streaming barrier timeout after "
                        f"{timeout}s: rows={self._rows.get(qid, 0) if qid else '?'} "
                        f"batches={self._batches.get(qid, 0) if qid else '?'}"
                    )
                # bounded wait: a progress event that fired between the
                # predicate check and re-entering wait() cannot strand us
                # until the deadline
                self._cond.wait(min(remaining, 2.0))


def attach_barrier(spark: SparkSession) -> ProgressBarrier:
    """Register and return a ProgressBarrier (detach with removeListener)."""
    barrier = ProgressBarrier()
    spark.streams.addListener(barrier)
    return barrier
