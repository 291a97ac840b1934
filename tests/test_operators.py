"""Unit tests for operators with small inline DataFrames, plus the
reference's own golden end-to-end test (SURVEY.md §5): the Video,Radio
regex filter over Traffic_Signal_Intersections.csv must reproduce the
checked-in golden output, order-insensitively.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simple_map_reduce_spark.operators.aggregates import (
    filter_group_count_percent,
    wordcount,
    wordcount_total,
)
from simple_map_reduce_spark.operators.filters import column_filter, regex_filter
from simple_map_reduce_spark.operators.joins import equi_join

GOLDEN_CSV = "/root/reference/sdfs/data/Traffic_Signal_Intersections.csv"
GOLDEN_OUT = "/root/reference/sdfs/Traffic_Signal_Intersections_filter"


@pytest.mark.skipif(not os.path.exists(GOLDEN_CSV), reason="reference data absent")
def test_golden_regex_filter(spark):
    """The only expected-output artifact in the reference repo
    (``sdfs/Traffic_Signal_Intersections_filter``): lines matching
    ``Video,Radio``. Order-insensitive — reference output order is
    nondeterministic append order (SURVEY.md §2.6).

    Documented deviation: the golden file holds 10 lines, but 13 lines of
    the input genuinely match the regex (verified with Python ``re`` and
    positionally) — the reference's recorded run dropped 3 rows, in line
    with its input-split quirks (SURVEY.md §7 risk 4). We assert the
    *correct* semantics: every golden line is produced, and the full
    result is exactly the true match set."""
    lines = spark.read.text(GOLDEN_CSV)
    got = sorted(r["value"] for r in regex_filter(lines, "Video,Radio").collect())
    with open(GOLDEN_OUT) as f:
        golden = sorted(line.rstrip("\n") for line in f if line.strip())
    assert set(golden) <= set(got), "golden lines must all be present"
    import re as _re

    true_matches = sorted(
        l.rstrip("\n")
        for l in open(GOLDEN_CSV)
        if _re.search("Video,Radio", l)
    )
    assert got == true_matches
    assert len(golden) == 10 and len(got) == 13


def test_column_filter(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2), ("a", 3)], ["k", "v"])
    assert column_filter(df, "k", "a").count() == 2


def test_equi_join_disambiguates_collisions(spark):
    left = spark.createDataFrame([(1, "x")], ["id", "name"])
    right = spark.createDataFrame([(1, "y")], ["id", "name"])
    out = equi_join(left, right, "id", "id", prefixes=("cars", "trucks"))
    assert set(out.columns) == {"cars_id", "cars_name", "trucks_id", "trucks_name"}
    assert out.count() == 1


def test_wordcount_semantics(spark):
    """Matches re.findall(r'\\w+', text.lower()) (wordcountmap.py:13)."""
    df = spark.createDataFrame([("Hello, hello WORLD!",), ("it's a-b",)], ["text"])
    got = {r["word"]: r["cnt"] for r in wordcount(df).collect()}
    assert got == {"hello": 2, "world": 1, "it": 1, "s": 1, "a": 1, "b": 1}
    assert wordcount_total(df).collect()[0]["total_words"] == 7


def test_asof_join_semantics(spark):
    """Backward as-of: greatest right_time <= left_time per key, inclusive
    boundary, NULLs when no prior right row, keys fully independent."""
    from simple_map_reduce_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 20, "e2"), (1, 5, "e0"), (2, 50, "e3")],
        ["k", "t", "ev"],
    )
    right = spark.createDataFrame(
        [(1, 10, "r@10"), (1, 15, "r@15"), (2, 99, "r@99")],
        ["k2", "t2", "payload"],
    )
    out = asof_join(left, right, "k", "k2", "t", "t2", ["payload"])
    got = {r["ev"]: r["payload"] for r in out.collect()}
    assert got == {
        "e0": None,     # before any right row
        "e1": "r@10",   # inclusive boundary: t == t2 matches
        "e2": "r@15",   # greatest right_time <= 20
        "e3": None,     # key 2's only right row is later (99 > 50)
    }
    assert out.count() == 4  # left-outer: every left row survives


def test_percent_of_total_is_global(spark):
    """The reference computes percent within each reducer's key subset
    (per-partition bug, SURVEY.md §2.4 A3); ours must be global even with
    many shuffle partitions."""
    rows = [("x", "g1")] * 3 + [("x", "g2")] * 1
    df = spark.createDataFrame(rows, ["f", "g"]).repartition(8)
    out = {r["grp"]: r["pct"] for r in filter_group_count_percent(df, "f", "x", "g").collect()}
    assert out == {"g1": 75.0, "g2": 25.0}


def test_stratified_sample_rates_and_determinism(spark):
    """Full-rate strata survive whole, zero/unlisted strata vanish,
    fractional strata keep a subset; membership is stable across calls
    and the whole decision is scan-local (no Exchange in the plan)."""
    from simple_map_reduce_spark.operators.sampling import stratified_sample

    rows = [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else "xx"))
            for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "lang"])
    out = stratified_sample(df, "id", "lang", {"en": 1.0, "de": 0.5})
    got = out.groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in got}
    assert counts.get("en") == 100          # rate 1.0 keeps everything
    assert "xx" not in counts               # unlisted stratum dropped
    assert 20 <= counts.get("de", 0) <= 80  # fractional stratum: a real subset
    ids_a = sorted(r["id"] for r in out.collect())
    ids_b = sorted(r["id"] for r in stratified_sample(
        df, "id", "lang", {"en": 1.0, "de": 0.5}).collect())
    assert ids_a == ids_b                   # pure function of the key
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_sample_threshold_rounds_not_truncates(spark):
    """0.29 * denom is 28.999… in binary floating point; the threshold
    must round to 29, not truncate to 28 (ADVICE r1)."""
    from simple_map_reduce_spark.operators.sampling import hash_bucket, stratified_sample
    from pyspark.sql import functions as F

    df = spark.range(2000).select(
        F.col("id").alias("k"), F.lit("en").alias("lang")
    )
    got = stratified_sample(df, "k", "lang", {"en": 0.29}, denom=100)
    expected = df.filter(hash_bucket(F.col("k"), 100) < 29)
    assert got.count() == expected.count() > 0
    assert int(0.29 * 100) == 28  # the bug this guards against
