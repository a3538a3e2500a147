"""Per-sink bounded buffers (lib/vector-buffers): when_full block /
drop_newest / overflow-to-disk between the micro-batch trigger and the
send handler, with the reference's discarded-events accounting."""

from __future__ import annotations

import threading
import time

import pytest

from vector_spark.config.globals import BufferConfig
from vector_spark.streaming.buffer import SinkBuffer, buffered_handler


def _batch(spark, n, start=0):
    return spark.range(start, start + n).selectExpr(
        "id as seq", "concat('m-', id) as message")


@pytest.fixture()
def gate():
    """A handler that parks until released; records what it received."""
    release = threading.Event()
    got: list[int] = []

    def handler(df, epoch_id):
        release.wait(30)
        got.append(df.count())

    return release, got, handler


def test_drop_newest_sheds_overflow(spark, gate):
    release, got, handler = gate
    buf = SinkBuffer(handler, BufferConfig.parse(
        {"type": "memory", "max_events": 10, "when_full": "drop_newest"}))
    try:
        buf.push(_batch(spark, 10), 0)      # fills the buffer
        buf.push(_batch(spark, 10, 10), 1)  # full -> dropped
        buf.push(_batch(spark, 4, 20), 2)   # still full -> dropped
        release.set()
        buf.flush()
        s = buf.stats()
        assert s["sent_events"] == 10
        assert s["discarded_events"] == 14
        assert got == [10]
    finally:
        buf.close()


def test_drop_newest_partial_room_truncates(spark, gate):
    release, got, handler = gate
    release.set()  # handler never blocks
    buf = SinkBuffer(handler, BufferConfig.parse(
        {"type": "memory", "max_events": 8, "when_full": "drop_newest"}))
    try:
        buf.push(_batch(spark, 5), 0)
        buf.flush()
        # room for 8 again; a 12-event batch keeps 8, drops 4
        buf.push(_batch(spark, 12, 5), 1)
        buf.flush()
        s = buf.stats()
        assert s["sent_events"] == 13
        assert s["discarded_events"] == 4
        assert got == [5, 8]
    finally:
        buf.close()


def test_block_applies_backpressure(spark, gate):
    release, got, handler = gate
    buf = SinkBuffer(handler, BufferConfig.parse(
        {"type": "memory", "max_events": 10, "when_full": "block"}))
    try:
        buf.push(_batch(spark, 10), 0)
        done = threading.Event()

        def second_push():
            buf.push(_batch(spark, 10, 10), 1)
            done.set()

        t = threading.Thread(target=second_push, daemon=True)
        t.start()
        time.sleep(0.3)
        assert not done.is_set(), "block should hold the second trigger"
        release.set()
        assert done.wait(30)
        buf.flush()
        s = buf.stats()
        assert s["sent_events"] == 20 and s["discarded_events"] == 0
    finally:
        buf.close()


def test_overflow_spills_to_disk(spark, gate, tmp_path):
    release, got, handler = gate
    buf = SinkBuffer(
        handler,
        BufferConfig.parse([
            {"type": "memory", "max_events": 10, "when_full": "overflow"},
            {"type": "disk", "max_size": 50 << 20},
        ]),
        data_dir=str(tmp_path),
        sink_name="http_out",
    )
    try:
        buf.push(_batch(spark, 10), 0)      # memory
        buf.push(_batch(spark, 7, 10), 1)   # memory full -> disk spool
        release.set()
        buf.flush()
        s = buf.stats()
        assert s["sent_events"] == 17
        assert s["spilled_events"] == 7
        assert s["discarded_events"] == 0
        assert sorted(got) == [7, 10]
    finally:
        buf.close()


def test_disk_max_size_drop_newest(spark, tmp_path):
    got: list[int] = []
    buf = SinkBuffer(
        lambda df, e: got.append(df.count()),
        BufferConfig.parse(
            {"type": "disk", "max_size": 1, "when_full": "drop_newest"}),
        data_dir=str(tmp_path),
    )
    try:
        buf.push(_batch(spark, 5), 0)  # any parquet file > 1 byte
        buf.flush()
        s = buf.stats()
        assert s["discarded_events"] == 5 and s["sent_events"] == 0
        assert got == []
    finally:
        buf.close()


def test_disk_requires_data_dir(spark):
    with pytest.raises(ValueError, match="data_dir"):
        SinkBuffer(lambda df, e: None, BufferConfig.parse(
            {"type": "disk", "max_size": 100}))


def test_failed_handler_counts_and_continues(spark):
    calls: list[int] = []

    def handler(df, epoch_id):
        calls.append(epoch_id)
        if epoch_id == 0:
            raise RuntimeError("endpoint down")

    buf = SinkBuffer(handler, BufferConfig.parse({"max_events": 100}))
    try:
        buf.push(_batch(spark, 3), 0)
        buf.push(_batch(spark, 4, 3), 1)
        buf.flush()
        s = buf.stats()
        assert s["failed_events"] == 3 and s["sent_events"] == 4
        assert buf.errors and "endpoint down" in buf.errors[0]
        assert calls == [0, 1]
    finally:
        buf.close()


def test_buffered_handler_wrapper(spark):
    got: list[int] = []
    wrapped, buf = buffered_handler(
        lambda df, e: got.append(df.count()),
        BufferConfig.parse({"max_events": 100}))
    try:
        wrapped(_batch(spark, 6), 0)
        buf.flush()
        assert got == [6] and buf.stats()["sent_events"] == 6
    finally:
        buf.close()


def test_disk_block_oversized_batch_does_not_deadlock(spark, tmp_path):
    # a single spilled batch larger than max_size must pass once the
    # rest of the spool drains, not wait for the spool to shrink below
    # its own size
    got: list[int] = []
    buf = SinkBuffer(
        lambda df, e: got.append(df.count()),
        BufferConfig.parse(
            {"type": "disk", "max_size": 1, "when_full": "block"}),
        data_dir=str(tmp_path),
    )
    try:
        buf.push(_batch(spark, 5), 0)  # parquet file >> 1 byte
        buf.flush()
        assert got == [5]
        assert buf.stats()["sent_events"] == 5
    finally:
        buf.close()
