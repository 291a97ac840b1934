"""Join operators.

Reference parity (SURVEY.md §2.5, J1): the SQL layer declares
``SELECT ALL FROM d1 d2 WHERE d1.f1 = d2.f2`` — an inner equi-join compiled
to two map stages + one reduce stage (``client.rs:523-541``,
``main.rs:297-299``). The executors (``joinmap.py``/``joinreduce.py``) are
*missing from the reference repo* (``client.rs:526,531``), so this module
implements the declared-but-unshipped capability.

Scale:
- The physical strategy is left to Catalyst + AQE: sort-merge for
  large×large, dynamically converted to broadcast-hash when one side is
  below the threshold, skew-split by AQE.
- ``broadcast_hint=True`` forces a broadcast for known-small dimensions
  (nation/region-sized) — kills the shuffle entirely.
- Column collisions are disambiguated with table prefixes so downstream
  consumers (and the duckdb oracle) see stable names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    how: str = "inner",
    broadcast_right: bool = False,
    prefixes: tuple[str, str] | None = None,
) -> DataFrame:
    """Inner (default) equi-join of two datasets on one column each —
    the reference's second SQL statement. Returns all columns of both
    sides; colliding names get ``{prefix}_`` disambiguation."""
    r = F.broadcast(right) if broadcast_right else right
    joined = left.join(r, left[left_on] == r[right_on], how)

    overlap = set(left.columns) & set(right.columns)
    if overlap:
        lp, rp = prefixes or ("l", "r")
        cols = [
            left[c].alias(f"{lp}_{c}") if c in overlap else left[c] for c in left.columns
        ] + [
            right[c].alias(f"{rp}_{c}") if c in overlap else right[c]
            for c in right.columns
        ]
        joined = joined.select(*cols)
    return joined


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """Backward as-of join (a custom operator Spark lacks natively): for
    each left row, attach the payload of the right row with the greatest
    ``right_time`` ≤ ``left_time`` within the same key — or NULLs if none
    (left-outer semantics).

    Implemented as the union-sort-window technique, NOT a range join:
    tag both sides, union, and take ``last_value(payload) IGNORE NULLS``
    over a per-key window ordered by (time, right-before-left). One
    shuffle on the key, in-partition sort, zero row blowup — the
    100 TB-safe shape (a naive ``left.time >= right.time`` range join is
    |left|×|right| per key before aggregation).

    Ties: callers must pre-deduplicate the right side to one row per
    (key, time) — with intra-key time ties the winner would otherwise be
    engine-dependent (DuckDB's native ASOF JOIN, the oracle, picks
    arbitrarily among tied rows).
    """
    lcols = left.columns
    tagged_left = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__p_{c}") for c in payload_cols],
    )
    tagged_right = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    # right rows sort before left rows at equal time => "ts >= right_time"
    # inclusive semantics
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "__is_left",
        *lcols,
        *[
            F.last(F.col(f"__p_{c}"), ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ],
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left")
