"""SparkSession factory for the engine.

The reference (MinhPhan8803/simple-map-reduce) hand-rolls its cluster
services: gossip membership (``sdfs/src/sender.rs:36-119``), bully leader
election (``sdfs/src/receiver.rs:19-209``), task retry
(``sdfs/src/leader.rs:401-439``) and a FIFO job queue
(``sdfs/src/leader.rs:1126-1186``).  None of that is re-implemented here:
Spark's cluster manager, heartbeats, ``spark.task.maxFailures`` and the
scheduler provide each property (SURVEY.md §2.10).  This module only pins
the configuration that matters for correct, scale-safe execution.

Scale notes (100 TB posture):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast-join conversion replace any hand-tuned task count
  (the reference hardcodes 7 map / 7 reduce tasks, ``client.rs:508,512``).
- ``shuffle.partitions`` here is a *local test* default (32 = local cores);
  on a real cluster leave it high (e.g. 2000+) and let AQE coalesce.
- Arrow enabled so every Pandas-UDF surface (maple/juice, multimodal)
  moves batches, not rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_session(
    app_name: str = "simple-map-reduce-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-safe defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: coalesce post-shuffle partitions, split skewed joins, convert
        # to broadcast at runtime — replaces the reference's fixed task count.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for all pandas_udf / mapInPandas / applyInPandas surfaces.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Read parquet TIMESTAMP(NANOS) (e.g. the events table) as long;
        # sources.load_table converts to a microsecond timestamp column.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
