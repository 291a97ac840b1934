"""Filter operators.

Reference parity (SURVEY.md §2.2):
- F1 ``regex_filter``: the map side of ``SELECT ALL FROM d WHERE <regex>``
  — keep lines where ``re.search(regex, line)`` matches
  (``executors/selectmap.py:4-19``, wired ``client.rs:505-521``).
  Idiomatic Spark: ``rlike`` on the raw-line column. The reference's
  reduce side (``selectreduce.py:4-16``) merely concatenates partial
  outputs — a no-op under Spark's execution model.
- F3 ``column_filter``: string equality on one column with header/short-row
  guards (``executors/Sdemo1map.py:16-21``).

Scale: ``rlike``/``=`` predicates are JVM-side Catalyst expressions —
evaluated inside WholeStageCodegen, pushed toward the scan. Equality
predicates on parquet columns push down to the reader (PushedFilters);
regex on a concatenated line necessarily evaluates post-scan but never
leaves the JVM and never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def regex_filter(df: DataFrame, regex: str, column: str = "value") -> DataFrame:
    """Keep rows whose ``column`` matches ``regex`` (Java regex, unanchored
    search — same observable semantics as Python ``re.search`` for the
    reference's quote-free, space-free patterns, ``README.md:113``)."""
    return df.filter(F.col(column).rlike(regex))


def column_filter(df: DataFrame, column: str | Column, value) -> DataFrame:
    """Equality filter on a named column (reference F3). Header-sentinel and
    short-row guards are schema concerns that a typed reader already
    handles (SURVEY.md §1 'Types')."""
    col = F.col(column) if isinstance(column, str) else column
    return df.filter(col == F.lit(value))
