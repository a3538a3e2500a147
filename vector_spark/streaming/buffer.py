"""Per-sink buffers — the reference's ``buffer:`` section
(lib/vector-buffers): every sink reads from a bounded buffer so a slow
or down sink sheds load (``when_full: drop_newest``), applies
backpressure (``block``, the default), or overflows to the next stage
(``overflow``, memory→disk).

Spark analog: in batch mode the exchange pipeline IS the buffer and
``block`` is inherent (a slow sink simply holds its partition's
iterator). In streaming mode this module makes the buffer real: the
micro-batch handler ENQUEUES batches into a bounded stage chain drained
by a sender thread, so a stalled sink either blocks the trigger
(``block``), drops the newest events with a counter
(``drop_newest`` — the reference's `buffer_discarded_events_total`),
or spills to a disk spool capped by ``max_size`` bytes (``disk`` stage,
parquet files under ``data_dir`` — the reference's disk_v2 analog,
durable across a sink outage within the run).

Event accounting is by EVENT COUNT for memory stages (max_events,
default 500) and by SPOOL BYTES for disk stages (max_size), mirroring
the reference's two sizing knobs (config.rs:87-109)."""

from __future__ import annotations

import os
import queue
import threading
import time
import uuid
from typing import Any

from vector_spark.config.globals import BufferConfig, BufferStage


class SinkBuffer:
    """A bounded buffer chain feeding one sink's send handler.

    ``push(df, epoch_id)`` is called from foreachBatch (driver-side);
    a drainer thread applies the real handler. Counters:
    ``sent_events``, ``discarded_events`` (the reference's
    buffer_discarded_events_total), ``spilled_events``."""

    def __init__(self, handler, config: BufferConfig,
                 data_dir: str | None = None,
                 sink_name: str = "sink") -> None:
        stages = config.stages or (BufferStage("memory", max_events=500),)
        self.handler = handler
        self.stages = stages
        self.sink_name = sink_name
        self.sent_events = 0
        self.discarded_events = 0
        self.spilled_events = 0
        self.failed_events = 0
        self.errors: list[str] = []
        self._pending_events = 0  # events queued in the memory stage
        self._inflight = 0
        self._lock = threading.Lock()
        self._q: queue.Queue = queue.Queue()
        self._spool_dir = None
        disk = [s for s in stages if s.kind == "disk"]
        if disk:
            if not data_dir:
                raise ValueError(
                    f"sink {sink_name!r}: a disk buffer requires the "
                    "global `data_dir` option")
            self._spool_dir = os.path.join(
                data_dir, "buffer", sink_name)
            os.makedirs(self._spool_dir, exist_ok=True)
            self._disk_stage = disk[0]
        self._closed = False
        self._drainer = threading.Thread(target=self._drain, daemon=True)
        self._drainer.start()

    # ------------------------------------------------------------------
    # producer side (foreachBatch handler)

    def push(self, batch_df, epoch_id: int) -> None:
        n = batch_df.count()
        if n == 0:
            return
        head = self.stages[0]
        if head.kind == "disk":
            self._spill(batch_df, n, epoch_id)
            return
        cap = head.max_events or 500
        with self._lock:
            room = cap - self._pending_events
        if room >= n:
            self._enqueue_memory(batch_df, n, epoch_id)
            return
        if head.when_full == "block":
            # backpressure: hold THIS trigger until the drainer frees
            # room (the reference parks the source the same way)
            while True:
                with self._lock:
                    room = cap - self._pending_events
                if room >= n:
                    break
                time.sleep(0.01)
            self._enqueue_memory(batch_df, n, epoch_id)
        elif head.when_full == "overflow":
            # excess overflows to the next stage. Granularity: whole
            # micro-batch (the reference overflows per event; splitting
            # a lazy batch into kept/excess would need two evaluations
            # of a nondeterministic limit — documented analog)
            self._spill(batch_df, n, epoch_id)
        else:  # drop_newest
            if room > 0:
                self._enqueue_memory(batch_df.limit(room), room, epoch_id)
            with self._lock:
                self.discarded_events += n - max(room, 0)

    def _enqueue_memory(self, batch_df, n: int, epoch_id: int) -> None:
        # materialize driver-side rows? NO — keep the DataFrame lazy and
        # localCheckpoint so the drainer replays from cached partitions,
        # not from a re-scan racing the next trigger's source state
        snap = batch_df.localCheckpoint(eager=True)
        with self._lock:
            self._pending_events += n
        self._q.put(("mem", snap, n, epoch_id))

    def _spill(self, batch_df, n: int, epoch_id: int) -> None:
        stage = self._disk_stage
        used = self._spool_bytes()
        path = os.path.join(self._spool_dir, f"{epoch_id}-{uuid.uuid4().hex}")
        batch_df.write.mode("overwrite").parquet(path)
        added = self._dir_bytes(path)
        if used + added > (stage.max_size or 0):
            # over max_size: honor when_full on the DISK stage
            if stage.when_full == "drop_newest":
                import shutil

                shutil.rmtree(path, ignore_errors=True)
                with self._lock:
                    self.discarded_events += n
                return
            # block: wait for the drainer to free spool bytes. The new
            # file is already on disk and counted, so the floor is
            # max(max_size, its own size) — a single batch larger than
            # max_size must still pass once everything else drains
            # (waiting for the spool to shrink below its own size would
            # deadlock: the drainer can't drain an un-queued file).
            floor = max(stage.max_size or 0, added)
            while self._spool_bytes() > floor:
                time.sleep(0.01)
        with self._lock:
            self.spilled_events += n
        self._q.put(("disk", path, n, epoch_id))

    # ------------------------------------------------------------------
    # consumer side

    def _drain(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            kind, payload, n, epoch_id = item
            with self._lock:
                self._inflight += 1
            try:
                if kind == "mem":
                    self.handler(payload, epoch_id)
                    payload.unpersist()
                else:
                    spark = _active_spark()
                    df = spark.read.parquet(payload)
                    self.handler(df, epoch_id)
                    import shutil

                    shutil.rmtree(payload, ignore_errors=True)
                with self._lock:
                    self.sent_events += n
            except Exception as exc:  # the handler owns retries; a
                # terminal failure is recorded, the buffer keeps going
                with self._lock:
                    self.failed_events += n
                    self.errors.append(f"epoch {epoch_id}: {exc}")
            finally:
                with self._lock:
                    self._inflight -= 1
                    if kind == "mem":
                        self._pending_events -= n

    def _spool_bytes(self) -> int:
        if not self._spool_dir:
            return 0
        total = 0
        for root, _dirs, files in os.walk(self._spool_dir):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        return total

    @staticmethod
    def _dir_bytes(path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        return total

    # ------------------------------------------------------------------

    def flush(self, timeout: float = 30.0) -> None:
        """Wait for everything queued so far to reach the handler."""
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            with self._lock:
                idle = (self._q.empty() and self._inflight == 0
                        and self._pending_events == 0)
            if idle:
                return
            time.sleep(0.01)
        raise TimeoutError(f"sink buffer for {self.sink_name!r} did not "
                           f"drain within {timeout}s")

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            self._q.put(None)

    def stats(self) -> dict[str, Any]:
        with self._lock:
            return {
                "sent_events": self.sent_events,
                "discarded_events": self.discarded_events,
                "spilled_events": self.spilled_events,
                "failed_events": self.failed_events,
                "pending_events": self._pending_events,
            }


def _active_spark():
    from pyspark.sql import SparkSession

    return SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()


def buffered_handler(handler, buffer_cfg: BufferConfig,
                     data_dir: str | None = None,
                     sink_name: str = "sink") -> tuple[Any, SinkBuffer]:
    """Wrap a foreachBatch handler behind a SinkBuffer. Returns
    (wrapped_handler, buffer) — pass the wrapped handler to
    foreach_batch_sink and read counters/flush from the buffer."""
    buf = SinkBuffer(handler, buffer_cfg, data_dir, sink_name)

    def wrapped(batch_df, epoch_id: int) -> None:
        buf.push(batch_df, epoch_id)

    return wrapped, buf
