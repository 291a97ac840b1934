"""Write sinks.

The reference's only sink is "append lines to one SDFS file"
(``server.rs:517-563``). Here the sink tier is what a lakehouse pipeline
needs, each with the scale rationale in place:

- ``write_table``        — plain parquet, atomic via Spark's output
  committer (replaces the reference's per-file locking, SURVEY §1).
- ``write_partitioned``  — hive-style partition layout; readers with a
  partition predicate scan only matching directories (partition pruning —
  demonstrated in tests via ``PartitionFilters``).
- ``write_sorted_within_partitions`` — per-file clustering for better
  parquet min/max row-group skipping on the sort column.
- ``Catalog.put_bucketed`` (catalog.py) — bucketed layout for repeated
  co-located joins.

Partition-count guidance at 100 TB: choose partition columns with
bounded cardinality (date, category — NOT user id); each partition
directory should hold ≥ 1 file of 100 MB–1 GB. ``max_records_per_file``
caps pathological file sizes without a repartition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Hive-partitioned parquet: one directory per partition value
    combination; filters on ``partition_cols`` prune at planning time."""
    writer = df.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def write_sorted_within_partitions(
    df: DataFrame, path: str, sort_cols: list[str], mode: str = "overwrite"
) -> None:
    """Cluster rows inside each output file by ``sort_cols`` so parquet
    min/max statistics make range predicates on those columns skip whole
    row groups. No global sort — only a per-partition sort."""
    df.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def write_format(
    df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite", **options
) -> None:
    """Format-parameterized sink: parquet / orc / json / csv — the
    columnar formats keep predicate pushdown + column pruning; json/csv
    are interchange sinks (the reference's universe was line-oriented
    text only, ``server.rs:147-176``)."""
    df.write.mode(mode).options(**options).format(fmt).save(path)
