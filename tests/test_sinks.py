"""Sink tests: partition layout on disk, partition pruning in the plan,
and sorted-within-partition clustering."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simple_map_reduce_spark.sources.readers import read_format
from simple_map_reduce_spark.sources.sinks import (
    write_format,
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


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    df = spark.createDataFrame([(i, f"n{i}") for i in range(1000)], ["id", "name"])
    path = str(tmp_path / "orc")
    write_format(df, path, fmt="orc")
    back = read_format(spark, path, fmt="orc").filter(F.col("id") < 10).select("id")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # ORC scan must receive both the pushed predicate and the pruned schema
    assert "PushedFilters: [" in plan and "id" in plan.split("PushedFilters: [")[1].split("]")[0]
    assert "name" not in plan.split("ReadSchema:")[1].split("\n")[0]
    assert back.count() == 10


def test_json_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "s"])
    pj = str(tmp_path / "j")
    write_format(df, pj, fmt="json")
    assert sorted(
        (r.id, r.s) for r in read_format(spark, pj, fmt="json").collect()
    ) == [(1, "x"), (2, "y")]
    pc = str(tmp_path / "c")
    write_format(df, pc, fmt="csv", header="true")
    got = read_format(spark, pc, fmt="csv", header="true", inferSchema="true")
    assert sorted((r.id, r.s) for r in got.collect()) == [(1, "x"), (2, "y")]
