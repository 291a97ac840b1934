"""Source readers.

The reference scans are strictly line-oriented text/CSV
(``sdfs/src/server.rs:147-176``; CSV parsed positionally inside executors,
``executors/Sdemo1map.py:13``). Here every named test table is a parquet
directory (splittable, column-pruned), and ``lines_view`` reconstructs the
reference's *whole-line* view of a table when raw-line regex semantics are
required (``executors/selectmap.py:14`` matches the raw CSV line, not a
column — SURVEY.md §1 "model mapping decision").

Scale: parquet scans get predicate pushdown + column pruning from Catalyst
for free; ``lines_view`` is a projection (concat_ws), which stays inside
WholeStageCodegen — no Python round-trip.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one named parquet table from a testdata scale-factor dir.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` (set in
    session.py) it arrives as a nanosecond long and is converted here to a
    microsecond timestamp (matching DuckDB's cast-to-TIMESTAMP view).
    """
    if name == "events":
        # set on the CALLER's session, not only our builder: the driver
        # harness passes its own SparkSession, which would otherwise fail
        # on the nanos-typed ts column with PARQUET_TYPE_ILLEGAL
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ONLY when the plan is under-partitioned.

    Locally, a small parquet table is one row group → one input split →
    explode/hash-heavy operators run single-threaded. On a real cluster
    inputs arrive with many splits and this is a no-op — the guard is
    what makes it safe to call inside operators (an unconditional
    ``repartition`` would add a full shuffle at 100 TB for nothing).
    """
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def lines_view(df: DataFrame, sep: str = ",") -> DataFrame:
    """Whole-line view of a table: one ``value: string`` column, columns
    joined by ``sep`` in schema order — the record shape every reference
    executor consumes (one text line, SURVEY.md §1)."""
    return df.select(
        F.concat_ws(sep, *[F.col(c).cast("string") for c in df.columns]).alias("value")
    )


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented file scan (reference S3, ``server.rs:147-176``)."""
    return spark.read.text(path)


def read_csv(
    spark: SparkSession, path: str, header: bool = True, schema=None
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_format(spark: SparkSession, path: str, fmt: str = "parquet", **options) -> DataFrame:
    """Format-parameterized scan: parquet / orc / json / csv / text.
    Columnar formats (parquet, orc) get predicate pushdown + column
    pruning from the file source; see ``sinks.write_format`` for the
    writing side."""
    return spark.read.options(**options).format(fmt).load(path)
