"""Structured Streaming over the events table [EXT].

The reference is batch-only (SURVEY.md §2.9 — jobs fire from an
interactive prompt; no watermarks/state anywhere). This module adds the
streaming tier a production pipeline needs, as thin compositions of
Structured Streaming primitives:

- ``read_events_stream``  — file-source stream with the same schema/ts
  normalisation as the batch reader (micro-batches of newly arrived
  parquet files).
- ``windowed_rollup``     — watermarked tumbling-window aggregation; the
  streaming twin of the batch ``events_windowed`` query (same output
  schema, so batch backfill and streaming tail can be unioned).
- ``sessionize``          — custom stateful operator via
  ``applyInPandasWithState``: per-user session assembly with a gap
  threshold. This is the pattern slot for any operator Spark lacks
  natively (SURVEY.md §2.8's "generic stage" reborn as managed state).
- ``run_available_now``   — drains everything currently in the source in
  micro-batches then stops: deterministic for tests/backfills.

Scale: state is keyed by (window, event_type) / user_id and bounded by
the watermark — late data past the watermark is dropped, state is
evicted, so long-running state size is O(active keys), not O(history).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_DDL = (
    "event_id bigint, ts bigint, user_id bigint, "
    "event_type string, value double, props string"
)

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)


def read_events_stream(
    spark: SparkSession, source_dir: str, glob: str | None = None
) -> DataFrame:
    """File-source stream of events parquet with ``ts`` normalised to a
    timestamp — THE single stream-source helper (every streaming query
    goes through here; three divergent copies of this normalisation once
    shipped a wrong-timestamp bug).

    Environments differ in how parquet TIMESTAMP(NANOS) is delivered:
    some readers hand it over as a nanosecond ``bigint`` (via
    ``spark.sql.legacy.parquet.nanosAsLong``), newer ones as a native
    ``timestamp_ntz``. File streams require a declared schema, so we
    probe with a batch read of the same path and branch on the dtype it
    actually delivers — mirroring the batch reader
    (``sources/readers.py``), never assuming either encoding.
    """
    # The probe needs nanosAsLong on; scope the flip so calling this
    # helper never silently changes how *batch* parquet reads elsewhere
    # in a caller's session deliver TIMESTAMP(NANOS). The one case where
    # the conf must STAY on is bigint delivery below: there the file
    # source re-reads parquet under this conf at every micro-batch, so
    # restoring it would break the stream itself — get_session() already
    # sets it at construction, making this a no-op in that case.
    _CONF = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(_CONF, None)
    spark.conf.set(_CONF, "true")
    restore = True
    try:
        probe = spark.read
        reader = spark.readStream
        if glob is not None:
            probe = probe.option("pathGlobFilter", glob)
            reader = reader.option("pathGlobFilter", glob)
        raw = reader.schema(probe.parquet(source_dir).schema).parquet(source_dir)
        delivered = dict(raw.dtypes).get("ts")
        restore = delivered != "bigint"
    finally:
        # restore on every path (incl. a probe AnalysisException) EXCEPT
        # bigint delivery, where micro-batch reads need the conf live
        if restore:
            if prior is None:
                spark.conf.unset(_CONF)
            else:
                spark.conf.set(_CONF, prior)
    if delivered == "bigint":  # nanos-as-long delivery
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif delivered == "timestamp_ntz":
        # watermarks demand TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE);
        # the session tz is pinned to UTC so this cast is value-preserving
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def windowed_rollup(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling rollup: (window_start, event_type, cnt,
    sum_value). Streaming twin of the batch ``events_windowed`` query."""
    val = F.col("value").cast("decimal(12,2)")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.sum(val).cast("double").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "sum_value")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessionization with a gap threshold — a custom stateful
    operator through ``applyInPandasWithState``.

    A session closes when the *observed* stream for that user contains a
    gap > ``gap_minutes``; closed sessions are emitted, the open tail
    stays in state (flushed by later batches or processing-time timeout).
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, n = state.get
            start, last = pd.Timestamp(start), pd.Timestamp(last)
        else:
            start = last = None
            n = 0
        closed: list[tuple[int, pd.Timestamp, pd.Timestamp, int]] = []
        for pdf in pdfs:
            for ts in sorted(pdf["ts"]):
                ts = pd.Timestamp(ts)
                if start is None:
                    start = last = ts
                    n = 1
                elif ts - last > gap:
                    closed.append((user_id, start, last, n))
                    start = last = ts
                    n = 1
                else:
                    last = max(last, ts)
                    n += 1
        if start is not None:
            state.update((start.to_pydatetime(), last.to_pydatetime(), n))
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "session_start", "session_end", "n_events"]
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_SCHEMA,
        stateStructType="start timestamp, last timestamp, n bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key_cond,
    left_time: str,
    right_start: str,
    right_end: str,
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with a time-interval condition — the
    canonical two-stream join: ``left.{left_time}`` must fall inside
    ``[right.{right_start}, right.{right_end}]`` and ``key_cond`` must
    hold.

    Both sides are watermarked; with the interval bound, Spark derives a
    state-retention horizon per side and evicts buffered rows past it —
    state is O(watermark-window of both streams), not O(history). Inner
    join results are emitted as soon as both sides arrive (no watermark
    wait), so an AvailableNow drain yields the exact batch-join answer.
    """
    l = left.withWatermark(left_time, left_watermark)
    r = right.withWatermark(right_start, right_watermark)
    cond = (
        key_cond
        & (F.col(left_time) >= F.col(right_start))
        & (F.col(left_time) <= F.col(right_end))
    )
    return l.join(r, cond)


def run_available_now(
    stream_df: DataFrame, name: str, checkpoint_dir: str, output_mode: str = "append"
) -> DataFrame:
    """Drain the source with Trigger.AvailableNow into an in-memory table;
    returns the result as a DataFrame. Deterministic: processes exactly
    the data present at start, then stops."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
