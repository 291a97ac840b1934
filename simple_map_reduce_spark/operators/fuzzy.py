"""Fuzzy string matching [EXT]: edit-distance joins without a cross join.

No reference counterpart (the reference's only join is the declared
equi-join, SURVEY.md §2.5 J1); this is the string analog of the LSH dedup
tier — useful for entity resolution over names/titles in a training-data
pipeline.

Algorithm: **FastSS deletion neighborhoods** (Bocek et al., 2007, "Fast
Similarity Search in Large Dictionaries"). For edit distance ≤ d, two
strings must share at least one member of their deletion neighborhoods
U_d(s) = {s with up to d characters deleted}. Generating U_d and joining
on the variants is therefore a *complete* candidate generator (no recall
loss); exact ``levenshtein`` verification removes false positives.

Scale properties:
- |U_1(s)| = L+1 and |U_2(s)| ≈ L²/2 variants per string — candidate
  generation is a map-side explode, cost linear in corpus size for
  fixed d, never |corpus|².
- The variant join shuffles on the variant string; hot variants (very
  short strings collapse to few variants) are bounded by ``max_bucket``
  the same way LSH dedup bounds hot buckets.
- Verification computes ``levenshtein`` only on candidate pairs, JVM-side
  (`pyspark.sql.functions.levenshtein` — no Python round trip).
- All expressions are Catalyst higher-order functions
  (transform/flatten/explode) inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _delete_one(s: Column) -> Column:
    """Array of all strings formed by deleting exactly one char of ``s``
    (plus ``s`` itself is NOT included here — handled by the caller)."""
    L = F.length(s)
    return F.transform(
        F.sequence(F.lit(1), L),
        lambda i: F.concat(F.substring(s, F.lit(1), (i - 1)), F.substring(s, i + 1, L)),
    )


def deletion_neighborhood(s: Column, max_dist: int) -> Column:
    """U_{max_dist}(s): the string itself plus every variant reachable by
    deleting up to ``max_dist`` characters, deduplicated."""
    tiers = [F.array(s)]
    for _ in range(max_dist):
        prev = tiers[-1]
        tiers.append(
            F.array_distinct(F.flatten(F.transform(prev, lambda v: _delete_one(v))))
        )
    return F.array_distinct(F.concat(*tiers))


def _variants(df: DataFrame, id_col: str, str_col: str, max_dist: int) -> DataFrame:
    """(id, s, variant) — one row per deletion-neighborhood member."""
    from ..sources.readers import ensure_parallelism

    base = ensure_parallelism(
        df.select(F.col(id_col).alias("id"), F.col(str_col).alias("s"))
    )
    return base.select(
        "id", "s", F.explode(deletion_neighborhood(F.col("s"), max_dist)).alias("variant")
    )


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
    max_bucket: int = 10_000,
) -> DataFrame:
    """All pairs (id_a < id_b) with ``levenshtein(s_a, s_b) <= max_dist``.

    Output: (id_a, id_b, s_a, s_b, dist). FastSS blocking itself has no
    false negatives; ``max_bucket`` caps degenerate variant buckets
    (e.g. near-empty strings) exactly like the LSH hot-bucket guard —
    pairs whose only shared variant sits in a dropped bucket are lost,
    so set ``max_bucket=0`` for the strict completeness guarantee.
    """
    var = _variants(df, id_col, str_col, max_dist)
    if max_bucket:
        sizes = var.groupBy("variant").agg(F.count("*").alias("bsz"))
        var = var.join(sizes.filter(F.col("bsz") <= max_bucket), "variant").drop("bsz")
    a = var.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"), "variant")
    b = var.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"), "variant")
    return (
        a.join(b, "variant")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "s_a", "s_b")
        .distinct()
        .withColumn("dist", F.levenshtein(F.col("s_a"), F.col("s_b")).cast("bigint"))
        .filter(F.col("dist") <= max_dist)
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_str: str,
    right_id: str,
    right_str: str,
    max_dist: int = 1,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Two-table edit-distance join: every (left, right) pair with
    ``levenshtein <= max_dist``. Output: (left_id, right_id, left_s,
    right_s, dist).

    ``max_bucket`` caps the variant bucket on BOTH sides (a degenerate
    hot variant — e.g. near-empty strings — can occur in either table).
    Like the LSH hot-bucket guard, the cap trades completeness for skew
    safety: pairs whose only shared variant sits in a dropped bucket are
    lost. Set ``max_bucket=0`` to disable the cap and keep the FastSS
    completeness guarantee."""
    lv = _variants(left, left_id, left_str, max_dist).withColumnRenamed(
        "id", "left_id"
    ).withColumnRenamed("s", "left_s")
    rv = _variants(right, right_id, right_str, max_dist).withColumnRenamed(
        "id", "right_id"
    ).withColumnRenamed("s", "right_s")
    if max_bucket:
        lsizes = lv.groupBy("variant").agg(F.count("*").alias("bsz"))
        lv = lv.join(lsizes.filter(F.col("bsz") <= max_bucket), "variant").drop("bsz")
        rsizes = rv.groupBy("variant").agg(F.count("*").alias("bsz"))
        rv = rv.join(rsizes.filter(F.col("bsz") <= max_bucket), "variant").drop("bsz")
    return (
        lv.join(rv, "variant")
        .select("left_id", "right_id", "left_s", "right_s")
        .distinct()
        .withColumn("dist", F.levenshtein(F.col("left_s"), F.col("right_s")).cast("bigint"))
        .filter(F.col("dist") <= max_dist)
    )
