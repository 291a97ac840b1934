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


def test_two_table_join_caps_both_sides(spark):
    """The hot-variant guard must apply to the LEFT stream too: a
    degenerate left side (many near-empty strings sharing one variant)
    is dropped by the cap, and max_bucket=0 restores completeness."""
    left_rows = [(i, "a") for i in range(30)] + [(100, "bolt")]
    right_rows = [(0, "b"), (1, "bolts")]
    left = spark.createDataFrame(left_rows, ["lid", "s"])
    right = spark.createDataFrame(right_rows, ["rid", "s"])
    capped = fuzzy_join(left, right, "lid", "s", "rid", "s", max_dist=1, max_bucket=5)
    # the 30 'a' rows all collapse to variants {'a',''}, bucket size 30+ > 5
    got = {(r["left_id"], r["right_id"]) for r in capped.collect()}
    assert (0, 0) not in got          # 'a'~'b' pair lost to the left cap
    assert (100, 1) in got            # bolt~bolts survives
    full = fuzzy_join(left, right, "lid", "s", "rid", "s", max_dist=1, max_bucket=0)
    got_full = {(r["left_id"], r["right_id"]) for r in full.collect()}
    assert all((i, 0) in got_full for i in range(30))  # completeness restored
