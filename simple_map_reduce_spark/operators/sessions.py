"""Batch sessionization: gap-based session assembly over an event log.

The batch twin of ``streaming.events.sessionize`` (which folds state with
``applyInPandasWithState``): a session is a maximal run of events for one
key where consecutive events are at most ``gap`` apart; a strictly larger
gap starts a new session. The reference has no notion of sessions or even
timestamps (SURVEY.md §2.9) — this is part of the [EXT] pipeline surface.

Scale shape: one shuffle on the session key, then two in-partition window
passes (lag → boundary flag → running sum) and a partial-aggregatable
groupBy. No row blowup, no driver-side state; skewed keys (one user with
billions of events) are bounded by the window sort, which spills — for
pathological keys pre-split by day first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_batch(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign a per-key session sequence number to every event.

    Returns the input plus ``session_seq`` (1-based, per key, in time
    order). Ordering inside a key is (ts, tiebreak) so runs are
    deterministic even with timestamp ties.
    """
    order_cols = [F.col(ts_col)]
    if order_tiebreak:
        order_cols.append(F.col(order_tiebreak))
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # full-precision (microsecond) gap comparison — matches the streaming
    # sessionizer's pandas timedelta arithmetic, no truncation to seconds
    is_new = F.when(
        prev_ts.isNull()
        | (F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {int(gap_seconds)} SECONDS")),
        1,
    ).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("__is_new", is_new).withColumn(
        "session_seq", F.sum("__is_new").over(run)
    ).drop("__is_new")


def session_rollup(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """One row per session: key, session_seq, start/end, event count and
    (optionally) an exact decimal sum of ``value_col`` exposed as double."""
    tagged = sessionize_batch(events, key_col, ts_col, gap_seconds, order_tiebreak)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    ]
    if value_col:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(12,2)")).cast("double").alias("sum_value")
        )
    return tagged.groupBy(key_col, "session_seq").agg(*aggs)
