"""Watermark semantics: a 2-hour watermark must drop events that arrive
after their window has been finalized. Two micro-batches are forced with
maxFilesPerTrigger=1 over two parquet files with distinct mtimes (the
file source schedules oldest-first)."""

from __future__ import annotations

import datetime as dt
import os
import sys
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simple_map_reduce_spark.streaming.events import (
    EVENTS_DDL,
    run_available_now,
    windowed_rollup,
)


def _nanos(h, m=0):
    return int(dt.datetime(2024, 1, 1, h, m).timestamp() * 1_000_000_000)


def _write(path, rows, mtime):
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def test_late_event_past_watermark_is_dropped(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    # batch 1: 09:10 (window 09:00) and 12:10 → the watermark computed
    # from this batch is 10:10, strictly past window 09:00-10:00
    _write(str(src / "a.parquet"), [(1, _nanos(9, 10)), (2, _nanos(12, 10))], 1_000_000)
    # batch 2: watermark 10:10 becomes effective; window 09:00 is evicted
    # and emitted (cnt=1) during THIS batch
    _write(str(src / "b.parquet"), [(3, _nanos(12, 20))], 1_001_000)
    # batch 3: 09:20 is LATE (its window was finalized a batch ago) and
    # must be dropped; 13:00 advances the final watermark to 11:00
    _write(str(src / "c.parquet"), [(4, _nanos(9, 20)), (5, _nanos(13, 0))], 1_002_000)

    raw = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    ev = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    sink = f"wm_{uuid.uuid4().hex[:8]}"
    out = run_available_now(
        windowed_rollup(ev, window="1 hour", watermark="2 hours"),
        sink,
        str(tmp_path / "ckpt"),
        output_mode="append",
    )
    rows = out.collect()
    # only the finalized 09:00 window is emitted, and the late event did
    # not inflate its count
    assert [(r.window_start, r.cnt) for r in rows] == [(dt.datetime(2024, 1, 1, 9), 1)]
