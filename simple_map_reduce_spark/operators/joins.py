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


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_point: str,
    right_start: str,
    right_end: str,
) -> DataFrame:
    """Keyed point-in-interval join: each left row (a point ``left_point``)
    matches right rows whose half-open interval ``[right_start, right_end)``
    contains it, within the same key. A custom operator the reference lacks
    entirely (its only join is the equi-join J1, SURVEY.md §2.5).

    Scale shape: the *equality* key carries the shuffle — Catalyst plans a
    hash/sort-merge join on ``left_key = right_key`` and evaluates the range
    predicate as a post-join filter inside each key group, so there is no
    cross product beyond a key's own rows. For keyless interval joins use
    :func:`interval_join_bucketed`, which manufactures an equality key.
    """
    cond = (
        (left[left_key] == right[right_key])
        & (left[left_point] >= right[right_start])
        & (left[left_point] < right[right_end])
    )
    return left.join(right, cond, "inner")


def interval_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Keyless point-in-interval join made shuffle-joinable: explode each
    right interval into the fixed-width time buckets it overlaps, bucket
    each left point, and equi-join on the bucket id before applying the
    exact range predicate.

    This turns an O(|L|·|R|) nested-loop (Spark's only native plan for a
    pure theta join) into one shuffle on the bucket key — the standard
    trick for interval joins at 100 TB. ``bucket_seconds`` should be close
    to the typical interval length: too small explodes the right side,
    too large piles unrelated rows into one bucket.
    """
    bucket = F.lit(int(bucket_seconds)).cast("long")
    lp = F.unix_timestamp(F.col(left_point))
    rs = F.unix_timestamp(F.col(right_start))
    re_ = F.unix_timestamp(F.col(right_end))

    lb = left.withColumn("__bucket", (lp / bucket).cast("long"))
    rb = right.withColumn(
        "__bucket",
        F.explode(F.sequence((rs / bucket).cast("long"), (re_ / bucket).cast("long"))),
    )
    joined = lb.join(rb, "__bucket", "inner").filter(
        (F.col(left_point) >= F.col(right_start)) & (F.col(left_point) < F.col(right_end))
    )
    return joined.drop("__bucket")


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
