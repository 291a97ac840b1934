"""Streaming tests with Trigger.AvailableNow (deterministic drain):
the windowed rollup must equal its batch twin, and sessionize must close
sessions at gaps."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from simple_map_reduce_spark.queries import q_events_windowed
from simple_map_reduce_spark.streaming.events import (
    read_events_stream,
    run_available_now,
    sessionize,
    windowed_rollup,
)
from tests.conftest import SF_SMOKE


def test_streaming_rollup_equals_batch(spark, tmp_path):
    """availableNow drain over the same parquet must reproduce the batch
    events_windowed result exactly (complete mode: final aggregates)."""
    # file-stream sources need a directory; the testdata table is a file
    import shutil

    src = str(tmp_path / "events_dir")
    os.makedirs(src)
    shutil.copy(os.path.join(SF_SMOKE, "events.parquet"), src)
    stream = read_events_stream(spark, src)
    out = run_available_now(
        windowed_rollup(stream),
        "rollup_test",
        str(tmp_path / "ckpt"),
        output_mode="complete",
    )
    got = {
        (r["window_start"], r["event_type"]): (r["cnt"], r["sum_value"])
        for r in out.collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["cnt"], r["sum_value"])
        for r in q_events_windowed(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_sessionize_closes_on_gap(spark, tmp_path):
    """User 1: two bursts separated by > gap → one closed session emitted
    (the open tail stays in state); user 2: single burst → nothing closed."""
    t0 = pd.Timestamp("2024-01-01 10:00:00")
    rows = []
    for i in range(3):  # burst A (closed by the later gap)
        rows.append((i, t0 + pd.Timedelta(minutes=i), 1, "click", 1.0, "{}"))
    for i in range(2):  # burst B, 2 h later (stays open in state)
        rows.append((10 + i, t0 + pd.Timedelta(hours=2, minutes=i), 1, "click", 1.0, "{}"))
    rows.append((20, t0, 2, "view", 1.0, "{}"))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    # write as the stream source (ts as nanos to match EVENTS_DDL)
    pdf["ts"] = pd.DatetimeIndex(pdf["ts"]).astype("int64")
    src = str(tmp_path / "events_src")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)

    stream = read_events_stream(spark, src)
    out = run_available_now(
        sessionize(stream, gap_minutes=30), "sessions_test", str(tmp_path / "ckpt2")
    )
    sessions = [
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in out.collect()
    ]
    assert sessions == [(1, t0.to_pydatetime(), (t0 + pd.Timedelta(minutes=2)).to_pydatetime(), 3)]


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """Exactly-once recovery: restarting a query on the SAME checkpoint
    must process only files that arrived since the last run — counts keep
    accumulating, nothing is double-counted. This is the property that
    replaces the reference's append-under-file-lock shuffle delivery
    (server.rs:517-563) with replayable source offsets + idempotent state.
    """
    import pandas as pd

    from pyspark.sql import functions as F

    def write_batch(path, ids):
        pdf = pd.DataFrame(
            [(i, pd.Timestamp("2024-01-01") .value, 1, "click", 1.0, "{}") for i in ids],
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)

    src = str(tmp_path / "inc_src")
    ckpt = str(tmp_path / "inc_ckpt")
    write_batch(src, range(5))

    def run_count(qname):
        stream = read_events_stream(spark, src)
        counts = stream.groupBy("event_type").agg(F.count("*").alias("cnt"))
        return run_available_now(counts, qname, ckpt, output_mode="complete")

    first = {r["event_type"]: r["cnt"] for r in run_count("inc_t1").collect()}
    assert first == {"click": 5}

    write_batch(src, range(100, 103))  # 3 new events arrive
    second = {r["event_type"]: r["cnt"] for r in run_count("inc_t2").collect()}
    # resumed from the checkpoint: old state + only the 3 new rows
    assert second == {"click": 8}
