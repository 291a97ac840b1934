"""Fuzzy (edit-distance) join: FastSS blocking completeness vs brute force."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from simple_map_reduce_spark.operators.fuzzy import fuzzy_join, fuzzy_self_join

WORDS = [
    "widget", "widgets", "wadget", "gadget", "gasket", "bolt", "bolts",
    "volt", "jolt", "ring", "rings", "rink", "king", "",  "a", "ab",
    "blue bolt", "blue bolts", "red bolt", "red belt",
]


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("max_dist", [1, 2])
def test_self_join_matches_brute_force(spark, max_dist):
    df = spark.createDataFrame([(w, w) for w in WORDS], ["id", "s"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_self_join(df, "id", "s", max_dist=max_dist).collect()
    }
    want = {
        (min(a, b), max(a, b), _lev(a, b))
        for a, b in itertools.combinations(WORDS, 2)
        if _lev(a, b) <= max_dist
    }
    assert got == want


def test_two_table_join(spark):
    left = spark.createDataFrame([(1, "bolt"), (2, "ring")], ["lid", "ls"])
    right = spark.createDataFrame(
        [(10, "bolts"), (11, "rink"), (12, "gasket")], ["rid", "rs"]
    )
    got = {
        (r.left_id, r.right_id, r.dist)
        for r in fuzzy_join(left, right, "lid", "ls", "rid", "rs", max_dist=1).collect()
    }
    assert got == {(1, 10, 1), (2, 11, 1)}


def test_randomized_completeness(spark):
    """FastSS blocking must find EVERY lev≤2 pair in a seeded random
    corpus (no recall loss — the property that justifies calling the
    blocking 'complete')."""
    import random

    rng = random.Random(42)
    alphabet = "abc"  # small alphabet → dense near-pairs
    words = list({"".join(rng.choice(alphabet) for _ in range(rng.randint(0, 6)))
                  for _ in range(120)})
    df = spark.createDataFrame([(w, w) for w in words], ["id", "s"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_self_join(df, "id", "s", max_dist=2).collect()
    }
    want = {
        (min(a, b), max(a, b), _lev(a, b))
        for a, b in itertools.combinations(words, 2)
        if _lev(a, b) <= 2
    }
    assert got == want and len(want) > 50


def test_dist_zero_pairs_counted(spark):
    # identical strings under different ids are distance-0 pairs
    df = spark.createDataFrame([(1, "same"), (2, "same")], ["id", "s"])
    rows = fuzzy_self_join(df, "id", "s", max_dist=1).collect()
    assert [(r.id_a, r.id_b, r.dist) for r in rows] == [(1, 2, 0)]
