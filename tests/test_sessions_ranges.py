"""Unit tests for batch sessionization and the range-join operators
(operators/sessions.py, operators/joins.py::range_join /
interval_join_bucketed) on small inline DataFrames with hand-computed
expected outputs."""

from __future__ import annotations

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_spark.operators.joins import interval_join_bucketed, range_join
from simple_map_reduce_spark.operators.sessions import session_rollup, sessionize_batch


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_sessionize_batch_gap_boundaries(spark):
    ev = spark.createDataFrame(
        [
            # user 1: 3 events, the 3rd exactly 30min after the 2nd (same session,
            # boundary is strict >), then one 31min later (new session)
            (1, _ts(9, 0), 10),
            (2, _ts(9, 10), 10),
            (3, _ts(9, 40), 10),
            (4, _ts(10, 11), 10),
            # user 2: single event
            (5, _ts(9, 0), 20),
        ],
        "event_id int, ts timestamp, user_id int",
    )
    out = sessionize_batch(ev, "user_id", "ts", 1800, "event_id")
    got = {r.event_id: r.session_seq for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_session_rollup_aggregates(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(9, 0), 10, 1.5),
            (2, _ts(9, 10), 10, 2.5),
            (3, _ts(12, 0), 10, 1.0),
        ],
        "event_id int, ts timestamp, user_id int, value double",
    )
    out = session_rollup(ev, "user_id", "ts", 1800, "event_id", "value").collect()
    by_seq = {r.session_seq: r for r in out}
    assert len(by_seq) == 2
    assert by_seq[1].n_events == 2 and by_seq[1].sum_value == 4.0
    assert by_seq[1].session_start == _ts(9, 0) and by_seq[1].session_end == _ts(9, 10)
    assert by_seq[2].n_events == 1 and by_seq[2].sum_value == 1.0


def test_range_join_half_open(spark):
    pts = spark.createDataFrame(
        [(1, 100, _ts(9, 0)), (2, 100, _ts(10, 0)), (3, 200, _ts(9, 30))],
        "pid int, k int, t timestamp",
    )
    ivs = spark.createDataFrame(
        # interval [9:00, 10:00) for key 100 — point at 10:00 excluded;
        # key 300 never matches
        [(7, 100, _ts(9, 0), _ts(10, 0)), (8, 300, _ts(9, 0), _ts(23, 0))],
        "iid int, ik int, s timestamp, e timestamp",
    )
    out = range_join(pts, ivs, "k", "ik", "t", "s", "e").select("pid", "iid").collect()
    assert [(r.pid, r.iid) for r in out] == [(1, 7)]


def test_interval_join_bucketed_matches_naive(spark):
    pts = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1 + i // 4, 6 * (i % 4))) for i in range(12)],
        "pid int, t timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (100, dt.datetime(2024, 1, 1, 3), dt.datetime(2024, 1, 2, 3)),
            (200, dt.datetime(2024, 1, 2, 0), dt.datetime(2024, 1, 2, 0, 1)),
        ],
        "iid int, s timestamp, e timestamp",
    )
    fast = interval_join_bucketed(pts, ivs, "t", "s", "e", bucket_seconds=6 * 3600)
    naive = pts.join(ivs, (pts.t >= ivs.s) & (pts.t < ivs.e))
    f = sorted((r.pid, r.iid) for r in fast.select("pid", "iid").collect())
    n = sorted((r.pid, r.iid) for r in naive.select("pid", "iid").collect())
    assert f == n and len(f) > 0
