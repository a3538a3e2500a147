"""Writable `memory` enrichment table + bloom/cuckoo membership variants
(reference `src/enrichment_tables/memory/`).

The reference memory table is a KV store that SINKS write into and
transforms read from (`config.rs:34-78`), expanded by the config
compiler into both a sink and (optionally) a source
(`src/config/compiler.rs:60-77`). Entries carry per-key TTL
(`table.rs:55-95`: remaining ttl returned on lookup, reset on
replace), writes can be buffered until a flush interval, and
`max_byte_size` rejects insertions that would grow the table past the
cap. `filter: {type: bloom|cuckoo}` switches the table to a
probabilistic membership filter (`bloom_table.rs`, `cuckoo_table.rs`)
— found keys come back with an empty value.

Spark mapping: the dict lives on the driver and updates from a stream
via foreachBatch (or from a topology input in batch mode, applied
BEFORE dependent transforms build — the batch analog of the
reference's live single-writer/snapshot-reader RwLock model); readers
join against a snapshot DataFrame (small table → broadcast). The
filter variants broadcast their compact bit/fingerprint arrays and
probe executor-side via Arrow-batched UDFs — the 100 TB path: a
deny-list filter of millions of keys is a few MiB broadcast once,
never a shuffle.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from hashlib import blake2b

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the reference's defaults: config.rs default_ttl()=600,
# default_scan_interval()=30; bloomy's DEFAULT_FALSE_POSITIVE_RATE
DEFAULT_TTL = 600.0
DEFAULT_SCAN_INTERVAL = 30.0
DEFAULT_FALSE_POSITIVE_RATE = 0.01


def _kv_df(spark: SparkSession, rows: list, key_col: str, value_col: str,
           value_type: str, with_ttl: bool = False) -> DataFrame:
    """Driver-side KV rows -> DataFrame via ONE Arrow batch
    (`createDataFrame(pyarrow.Table)`) instead of the per-row pickle
    path (guide §6 "Arrow for driver transfers" — orders of magnitude
    faster for anything non-trivial). Types are declared explicitly on
    the Arrow arrays, so None stays SQL NULL even in numeric columns
    (the pandas route would smuggle NaN). Value types without a scalar
    Arrow mapping fall back to the row-list path unchanged."""
    import pyarrow as pa

    pa_types = {
        "string": pa.string(), "double": pa.float64(),
        "float": pa.float32(), "long": pa.int64(), "bigint": pa.int64(),
        "int": pa.int32(), "integer": pa.int32(), "boolean": pa.bool_(),
    }
    vt = pa_types.get(value_type)
    if vt is None:
        ddl = f"{key_col} string, {value_col} {value_type}"
        if with_ttl:
            ddl += ", ttl long"
        return spark.createDataFrame(rows or [], ddl)
    fields = [pa.field(key_col, pa.string()), pa.field(value_col, vt)]
    if with_ttl:
        fields.append(pa.field("ttl", pa.int64()))
    cols = list(zip(*rows)) if rows else [[] for _ in fields]
    tbl = pa.Table.from_arrays(
        [pa.array(list(c), type=f.type) for f, c in zip(fields, cols)],
        schema=pa.schema(fields),
    )
    return spark.createDataFrame(tbl)


@dataclass
class MemoryTable:
    """Driver-side KV store with per-entry TTL; readable as a broadcast
    DataFrame. `ttl_secs=None` (default) disables expiry — the config
    loader passes the reference default (600 s) for `type: memory`
    tables; `ttl_field` names an input column that overrides the TTL
    per record (config.rs `ttl_field`)."""

    key_col: str = "key"
    value_col: str = "value"
    value_type: str = "string"  # snapshot/export value column type
    ttl_secs: float | None = None
    max_entries: int | None = None
    max_byte_size: int | None = None
    flush_interval: float | None = None
    ttl_field: str | None = None
    _data: dict = field(default_factory=dict)  # key -> (value, ts, ttl)
    _pending: list = field(default_factory=list)
    _expired: list = field(default_factory=list)  # flushed-out entries
    _byte_size: int = 0

    @staticmethod
    def _entry_bytes(key, value) -> int:
        return len(str(key)) + len(str(value))

    def _coerce(self, v, value_type: str):
        """Python-side cast so snapshot rows satisfy the declared value
        type (a remap writing `user_id * 2 + 1` hands the table ints
        even when the table declares double)."""
        if v is None:
            return None
        try:
            if value_type in ("double", "float"):
                return float(v)
            if value_type in ("long", "int", "bigint", "integer"):
                return int(v)
            if value_type == "boolean":
                return bool(v)
            if value_type == "string":
                return v if isinstance(v, str) else str(v)
        except (TypeError, ValueError):
            pass
        return v

    def put(self, key, value, now: float | None = None,
            ttl: float | None = None) -> bool:
        """Upsert; returns False when max_byte_size rejects the insert
        (table.rs: insertions that grow past the cap are rejected).
        A None value REMOVES the key (the cuckoo-table null-removal
        convention, applied uniformly)."""
        now = time.time() if now is None else now
        if value is None:
            old = self._data.pop(key, None)
            if old is not None:
                self._byte_size -= self._entry_bytes(key, old[0])
            return True
        delta = self._entry_bytes(key, value)
        if key in self._data:
            delta -= self._entry_bytes(key, self._data[key][0])
        if self.max_byte_size is not None and delta > 0 \
                and self._byte_size + delta > self.max_byte_size:
            return False
        self._data[key] = (value, now, ttl if ttl is not None
                           else self.ttl_secs)
        self._byte_size += delta
        if self.max_entries is not None and len(self._data) > self.max_entries:
            # drop oldest writes first (the reference's byte-size cap analog)
            for k, _ in sorted(self._data.items(), key=lambda kv: kv[1][1])[
                : len(self._data) - self.max_entries
            ]:
                self._byte_size -= self._entry_bytes(k, self._data[k][0])
                del self._data[k]
        return True

    def expire(self, now: float | None = None) -> int:
        now = time.time() if now is None else now
        dead = [k for k, (_, ts, ttl) in self._data.items()
                if ttl is not None and now - ts > ttl]
        for k in dead:
            v, ts, ttl = self._data.pop(k)
            self._byte_size -= self._entry_bytes(k, v)
            self._expired.append((k, v, ts, ttl))
        return len(dead)

    def write_batch(self, batch_df: DataFrame, epoch_id: int | None = None,
                    now: float | None = None) -> None:
        """foreachBatch handler / topology-sink entry: upsert
        (key_col, value_col [, ttl_field]) rows in input order.

        Driver transfer is Arrow (`toArrow()`), not the pickled-row
        collect path — one columnar batch instead of per-row
        serialization (guide §6 "Arrow for driver transfers"). Arrow
        preserves SQL NULL exactly (`to_pylist` yields None, never the
        pandas NaN coercion that made `toPandas()` unsafe here — a NaN
        double would dodge the None-removes-key contract)."""
        now = time.time() if now is None else now
        cols = [self.key_col, self.value_col]
        if self.ttl_field:
            cols.append(self.ttl_field)
        for row in batch_df.select(*cols).toArrow().to_pylist():
            ttl = row[self.ttl_field] if self.ttl_field else None
            if self.flush_interval is not None:
                self._pending.append((row[self.key_col],
                                      row[self.value_col], now, ttl))
            else:
                self.put(row[self.key_col], row[self.value_col], now, ttl)
        self.expire(now)

    def flush(self, now: float | None = None) -> int:
        """Make buffered writes visible (config.rs `flush_interval`:
        writes are batch-visible; every TTL scan also flushes)."""
        n = len(self._pending)
        for key, value, ts, ttl in self._pending:
            self.put(key, value, ts, ttl)
        self._pending.clear()
        self.expire(now)
        return n

    def snapshot(self, spark: SparkSession, value_type: str | None = None,
                 include_ttl: bool = False,
                 now: float | None = None) -> DataFrame:
        """Current live entries as a (small, broadcastable) DataFrame.
        With include_ttl, rows carry the REMAINING ttl the reference
        returns on lookup (table.rs:69-89)."""
        now = time.time() if now is None else now
        value_type = value_type or self.value_type
        self.expire(now)
        if include_ttl:
            rows = [
                (str(k), self._coerce(v, value_type),
                 None if ttl is None else max(0, int(ttl - (now - ts))))
                for k, (v, ts, ttl) in self._data.items()
            ]
        else:
            rows = [(str(k), self._coerce(v, value_type))
                    for k, (v, _, _) in self._data.items()]
        return _kv_df(spark, rows, self.key_col, self.value_col,
                      value_type, with_ttl=include_ttl)

    def export(self, spark: SparkSession, value_type: str | None = None,
               batch_size: int | None = None,
               remove_after_export: bool = False) -> DataFrame:
        """Source-side export (config.rs MemorySourceConfig): the table
        contents as events. batch_size bounds one export batch;
        remove_after_export clears exported entries."""
        value_type = value_type or self.value_type
        self.expire()
        items = list(self._data.items())
        if batch_size is not None:
            items = items[:batch_size]
        rows = [(str(k), self._coerce(v, value_type))
                for k, (v, _, _) in items]
        if remove_after_export:
            for k, _ in items:
                v, _, _ = self._data.pop(k)
                self._byte_size -= self._entry_bytes(k, v)
        return _kv_df(spark, rows, self.key_col, self.value_col, value_type)

    def expired_items(self, spark: SparkSession,
                      value_type: str | None = None) -> DataFrame:
        """Entries TTL-flushed from the table (the `expired` output
        port, source.rs EXPIRED_ROUTE)."""
        value_type = value_type or self.value_type
        rows = [(str(k), v) for k, v, _, _ in self._expired]
        return _kv_df(spark, rows, self.key_col, self.value_col, value_type)

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


def _hash_pair(key: str, salt: bytes = b"") -> tuple[int, int]:
    """Two independent 64-bit hashes from one blake2b digest (double
    hashing, Kirsch-Mitzenmacher): h_i = h1 + i*h2."""
    d = blake2b(key.encode("utf-8", "surrogatepass"), digest_size=16,
                salt=salt).digest()
    return (int.from_bytes(d[:8], "little"),
            int.from_bytes(d[8:], "little") | 1)


def optimal_bits(n: int, p: float = DEFAULT_FALSE_POSITIVE_RATE) -> int:
    """m = ceil(-n ln p / ln(2)^2) (bloom_table.rs:61-64 uses bloomy's
    bloom::optimal_bits with DEFAULT_FALSE_POSITIVE_RATE)."""
    return max(8, math.ceil(-n * math.log(p) / (math.log(2) ** 2)))


class BloomMemoryTable:
    """Bloom-filter variant (`filter: {type: bloom}`,
    bloom_table.rs:112-216): insert-only presence set — no TTL, no
    removal, no source export (config.rs:269-284 rejects all three).
    Lookup of a member returns {key, value: null}, exactly the
    reference's found-row shape (bloom_table.rs:156-170)."""

    kind = "bloom"

    def __init__(self, max_entries: int,
                 false_positive_rate: float = DEFAULT_FALSE_POSITIVE_RATE,
                 max_byte_size: int | None = None) -> None:
        self.max_entries = int(max_entries)
        self.nbits = optimal_bits(self.max_entries, false_positive_rate)
        filter_bytes = (self.nbits + 7) // 8
        if max_byte_size is not None and filter_bytes > max_byte_size:
            # bloom_table.rs:65-70, same refusal
            raise ValueError(
                f"Configured bloom filter is larger ({filter_bytes}) than "
                f"defined `max_byte_size` ({max_byte_size}).")
        self.nhashes = max(1, round(self.nbits / self.max_entries
                                    * math.log(2)))
        self.bits = bytearray(filter_bytes)

    def insert(self, key) -> None:
        h1, h2 = _hash_pair(str(key))
        for i in range(self.nhashes):
            b = (h1 + i * h2) % self.nbits
            self.bits[b >> 3] |= 1 << (b & 7)

    def contains(self, key) -> bool:
        h1, h2 = _hash_pair(str(key))
        return all(
            self.bits[((h1 + i * h2) % self.nbits) >> 3]
            & (1 << (((h1 + i * h2) % self.nbits) & 7))
            for i in range(self.nhashes)
        )

    def write_batch(self, batch_df: DataFrame,
                    key_col: str = "key", **_kw) -> None:
        """Distributed absorb: each partition builds a partial bit
        array executor-side (mapInPandas), the driver ORs them — keys
        never collect, only nparts × m/8 bytes move (the scale path
        for a 100 TB deny-list build)."""
        import pandas as pd

        nbits, nhashes = self.nbits, self.nhashes

        def build(batches):
            part = bytearray((nbits + 7) // 8)
            any_rows = False
            for pdf in batches:
                for key in pdf[key_col]:
                    if key is None:
                        continue
                    any_rows = True
                    h1, h2 = _hash_pair(str(key))
                    for i in range(nhashes):
                        b = (h1 + i * h2) % nbits
                        part[b >> 3] |= 1 << (b & 7)
            if any_rows:
                yield pd.DataFrame({"part": [bytes(part)]})

        parts = (
            batch_df.select(F.col(key_col).cast("string").alias(key_col))
            .mapInPandas(build, "part binary")
            .collect()
        )
        for row in parts:
            self.bits = bytearray(a | b for a, b in zip(self.bits,
                                                        row["part"]))

    def membership_column(self, key, fields: bool = False):
        """Column predicate (or found-row struct) probing the broadcast
        filter executor-side — Arrow-batched, zero shuffle."""
        from pyspark.sql.functions import pandas_udf

        bits, nbits, nhashes = bytes(self.bits), self.nbits, self.nhashes

        @pandas_udf("boolean")
        def probe(s):
            def one(k):
                if k is None:
                    return False
                h1, h2 = _hash_pair(str(k))
                return all(
                    bits[((h1 + i * h2) % nbits) >> 3]
                    & (1 << (((h1 + i * h2) % nbits) & 7))
                    for i in range(nhashes))
            return s.map(one)

        member = probe(key.cast("string"))
        if not fields:
            return member
        row = F.struct(key.cast("string").alias("key"),
                       F.lit(None).cast("string").alias("value"))
        return F.when(member, row)


class CuckooMemoryTable:
    """Cuckoo-filter variant (`filter: {type: cuckoo}`,
    cuckoo_table.rs): partial-key cuckoo hashing (Fan et al. 2014) —
    membership + REMOVAL (null values delete) + optional TTL. Lookup
    of a member returns {key, value: null, fingerprint}
    (cuckoo_table.rs:645-656). Defaults pinned to the reference:
    fingerprint_bits=8, bucket_size=4, max_kicks=500. The LRU aging
    and hit-counter options are out of scope (documented; they tune
    eviction, not membership semantics)."""

    kind = "cuckoo"

    def __init__(self, max_entries: int, fingerprint_bits: int = 8,
                 bucket_size: int = 4, max_kicks: int = 500,
                 ttl: float | None = None) -> None:
        if not (1 <= fingerprint_bits <= 32):
            raise ValueError("fingerprint_bits must be in 1..32")
        self.fp_bits = fingerprint_bits
        self.bucket_size = bucket_size
        self.max_kicks = max_kicks
        self.ttl = ttl
        # power-of-two buckets so the partial-key XOR stays in range
        want = max(1, math.ceil(max_entries / bucket_size))
        self.nbuckets = 1 << (want - 1).bit_length()
        self.slots = [0] * (self.nbuckets * bucket_size)  # 0 = empty
        self.stamps = [0.0] * len(self.slots) if ttl is not None else None

    def _fingerprint(self, key: str) -> int:
        h1, _ = _hash_pair(key, salt=b"fp")
        fp = h1 & ((1 << self.fp_bits) - 1)
        return fp or 1  # nonzero so 0 can mean empty

    def _buckets(self, key: str, fp: int) -> tuple[int, int]:
        h1, _ = _hash_pair(key)
        i1 = h1 % self.nbuckets
        h2, _ = _hash_pair(str(fp), salt=b"alt")
        i2 = (i1 ^ h2) % self.nbuckets
        return i1, i2

    def _alt(self, i: int, fp: int) -> int:
        h2, _ = _hash_pair(str(fp), salt=b"alt")
        return (i ^ h2) % self.nbuckets

    def _slot_live(self, idx: int, now: float) -> bool:
        if self.slots[idx] == 0:
            return False
        if self.stamps is not None and now - self.stamps[idx] > self.ttl:
            self.slots[idx] = 0  # lazy TTL expiry
            return False
        return True

    def insert(self, key, now: float | None = None) -> bool:
        now = time.time() if now is None else now
        skey = str(key)
        fp = self._fingerprint(skey)
        i1, i2 = self._buckets(skey, fp)
        for i in (i1, i2):
            base = i * self.bucket_size
            for j in range(self.bucket_size):
                idx = base + j
                if not self._slot_live(idx, now) or self.slots[idx] == fp:
                    self.slots[idx] = fp
                    if self.stamps is not None:
                        self.stamps[idx] = now
                    return True
        # both buckets full: kick a resident fingerprint to its alt
        import random
        rng = random.Random(fp)  # deterministic evictions
        i, cur = rng.choice((i1, i2)), fp
        for _ in range(self.max_kicks):
            j = rng.randrange(self.bucket_size)
            idx = i * self.bucket_size + j
            cur, self.slots[idx] = self.slots[idx], cur
            if self.stamps is not None:
                self.stamps[idx] = now
            i = self._alt(i, cur)
            base = i * self.bucket_size
            for j2 in range(self.bucket_size):
                idx = base + j2
                if not self._slot_live(idx, now):
                    self.slots[idx] = cur
                    if self.stamps is not None:
                        self.stamps[idx] = now
                    return True
        return False  # table effectively full (reference emits InsertFailed)

    def remove(self, key, now: float | None = None) -> bool:
        now = time.time() if now is None else now
        skey = str(key)
        fp = self._fingerprint(skey)
        for i in self._buckets(skey, fp):
            base = i * self.bucket_size
            for j in range(self.bucket_size):
                idx = base + j
                if self._slot_live(idx, now) and self.slots[idx] == fp:
                    self.slots[idx] = 0
                    return True
        return False

    def contains(self, key, now: float | None = None) -> bool:
        now = time.time() if now is None else now
        skey = str(key)
        fp = self._fingerprint(skey)
        for i in self._buckets(skey, fp):
            base = i * self.bucket_size
            for j in range(self.bucket_size):
                if self._slot_live(base + j, now) \
                        and self.slots[base + j] == fp:
                    return True
        return False

    def write_batch(self, batch_df: DataFrame, key_col: str = "key",
                    value_col: str | None = None,
                    now: float | None = None) -> None:
        """Insert keys in input order; rows whose value column is null
        REMOVE the key (cuckoo_table.rs: 'Supports removal by
        accepting null values for keys'). Keys collect to the driver —
        bounded by max_entries by config contract (a membership table,
        not the corpus)."""
        cols = [key_col] + ([value_col] if value_col else [])
        # Arrow driver transfer; to_pylist keeps NULL as None exactly
        # (the null-value-removes-key convention depends on it)
        for row in batch_df.select(*cols).toArrow().to_pylist():
            if value_col and row[value_col] is None:
                self.remove(row[key_col], now)
            else:
                self.insert(row[key_col], now)

    def expire_scan(self, now: float | None = None) -> int:
        """Zero out TTL-expired slots (config.rs `scan_interval`)."""
        if self.stamps is None:
            return 0
        now = time.time() if now is None else now
        dead = 0
        for idx in range(len(self.slots)):
            if self.slots[idx] and now - self.stamps[idx] > self.ttl:
                self.slots[idx] = 0
                dead += 1
        return dead

    def membership_column(self, key, fields: bool = False):
        """Broadcast the slot array; probe executor-side. TTL-expired
        slots are swept before the snapshot is taken."""
        from pyspark.sql.functions import pandas_udf

        self.expire_scan()
        slots = tuple(self.slots)
        fp_bits, bucket_size = self.fp_bits, self.bucket_size
        nbuckets = self.nbuckets

        @pandas_udf("long")
        def probe(s):
            def one(k):
                if k is None:
                    return None
                sk = str(k)
                h1, _ = _hash_pair(sk, salt=b"fp")
                fp = (h1 & ((1 << fp_bits) - 1)) or 1
                hb, _ = _hash_pair(sk)
                i1 = hb % nbuckets
                ha, _ = _hash_pair(str(fp), salt=b"alt")
                i2 = (i1 ^ ha) % nbuckets
                for i in (i1, i2):
                    base = i * bucket_size
                    for j in range(bucket_size):
                        if slots[base + j] == fp:
                            return fp
                return None
            return s.map(one)

        found_fp = probe(key.cast("string"))
        if not fields:
            return found_fp.isNotNull()
        row = F.struct(key.cast("string").alias("key"),
                       F.lit(None).cast("string").alias("value"),
                       found_fp.alias("fingerprint"))
        return F.when(found_fp.isNotNull(), row)
