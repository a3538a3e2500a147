"""Writable `memory` enrichment table (reference
`src/enrichment_tables/memory/config.rs:34-78`): a KV table that SINKS
write into and transforms read from, with per-key TTL.

Reference wiring: the memory table is simultaneously a sink (writes
update it) and an enrichment source (`src/config/compiler.rs:60-77`
expands it into both). Spark mapping: a driver-held dict updated from a
stream via foreachBatch; readers join against a snapshot DataFrame
(small table → broadcast). On a real cluster the dict lives on the
driver and re-broadcasts per micro-batch — the same single-writer,
snapshot-reader model the reference implements with an RwLock.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class MemoryTable:
    """Driver-side KV store with TTL; readable as a broadcast DataFrame."""

    key_col: str = "key"
    value_col: str = "value"
    ttl_secs: float | None = None
    max_entries: int | None = None
    _data: dict = field(default_factory=dict)  # key -> (value, write_ts)

    def put(self, key, value, now: float | None = None) -> None:
        now = time.time() if now is None else now
        self._data[key] = (value, now)
        if self.max_entries is not None and len(self._data) > self.max_entries:
            # drop oldest writes first (the reference's byte-size cap analog)
            for k, _ in sorted(self._data.items(), key=lambda kv: kv[1][1])[
                : len(self._data) - self.max_entries
            ]:
                del self._data[k]

    def expire(self, now: float | None = None) -> int:
        if self.ttl_secs is None:
            return 0
        now = time.time() if now is None else now
        dead = [k for k, (_, ts) in self._data.items() if now - ts > self.ttl_secs]
        for k in dead:
            del self._data[k]
        return len(dead)

    def write_batch(self, batch_df: DataFrame, epoch_id: int | None = None) -> None:
        """foreachBatch handler: upsert (key_col, value_col) rows."""
        now = time.time()
        for row in batch_df.select(self.key_col, self.value_col).collect():
            self.put(row[self.key_col], row[self.value_col], now)
        self.expire(now)

    def snapshot(self, spark: SparkSession, value_type: str = "string") -> DataFrame:
        """Current live entries as a (small, broadcastable) DataFrame."""
        self.expire()
        rows = [(k, v) for k, (v, _) in self._data.items()]
        schema = f"{self.key_col} string, {self.value_col} {value_type}"
        return spark.createDataFrame(
            [(str(k), v) for k, v in rows] or [], schema
        )

    def enrich(
        self, df: DataFrame, on: str, value_type: str = "string", how: str = "left"
    ) -> DataFrame:
        """Broadcast-join `df` against the current snapshot."""
        spark = df.sparkSession
        # rename the snapshot key before joining: df.drop(name) drops ALL
        # columns with that name, so a caller joining on its own column
        # of the same name would lose it too
        snap = self.snapshot(spark, value_type).withColumnRenamed(
            self.key_col, "__mem_key"
        )
        return df.join(
            F.broadcast(snap), df[on] == snap["__mem_key"], how
        ).drop("__mem_key")
