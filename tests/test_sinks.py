"""Sink tests: partition layout on disk, partition pruning in the plan,
and sorted-within-partition clustering."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simple_map_reduce_spark.sources.sinks import (
    write_partitioned,
    write_sorted_within_partitions,
    write_table,
)


def test_partitioned_write_layout_and_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], i * 1.0) for i in range(300)],
        ["id", "cat", "v"],
    )
    path = str(tmp_path / "pt")
    write_partitioned(df, path, ["cat"])
    # hive layout on disk
    assert sorted(d for d in os.listdir(path) if d.startswith("cat=")) == [
        "cat=a",
        "cat=b",
        "cat=c",
    ]
    back = spark.read.parquet(path).filter(F.col("cat") == "b")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the filter must appear as a PartitionFilter (planning-time pruning),
    # not a post-scan DataFilter
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "cat" in pf
    assert back.count() == 100


def test_roundtrip_and_sorted_write(spark, tmp_path):
    df = spark.createDataFrame([(i, i % 7) for i in range(100)], ["id", "k"])
    p1 = str(tmp_path / "plain")
    write_table(df, p1)
    assert spark.read.parquet(p1).count() == 100

    p2 = str(tmp_path / "sorted")
    write_sorted_within_partitions(df.repartition(2), p2, ["id"])
    back = spark.read.parquet(p2)
    assert back.count() == 100
    # row-group clustering: within each file, ids are non-decreasing
    rows = back.select(F.input_file_name().alias("f"), "id").collect()
    by_file: dict[str, list[int]] = {}
    for r in rows:
        by_file.setdefault(r["f"], []).append(r["id"])
    # collect() preserves within-file read order for parquet scans
    assert all(v == sorted(v) for v in by_file.values())
