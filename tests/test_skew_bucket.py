"""Skew utilities + bucketed-table tests: correctness of salted
aggregation/join under a hot key, and the bucketed join's shuffle-free
plan."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simple_map_reduce_spark.catalog import Catalog
from simple_map_reduce_spark.operators.skew import (
    salted_aggregation,
    salted_broadcast_left,
    with_salt,
)


def _skewed(spark):
    # one hot key (90%) + long tail
    hot = [("hot", i * 1.0) for i in range(900)]
    tail = [(f"k{i}", i * 1.0) for i in range(100)]
    return spark.createDataFrame(hot + tail, ["k", "v"])


def test_salt_spreads_hot_key(spark):
    df = with_salt(_skewed(spark), salts=8)
    n_salts = df.filter(F.col("k") == "hot").select("_salt").distinct().count()
    assert n_salts >= 6  # hot key lands on most salt values


def test_salted_aggregation_matches_plain(spark):
    df = _skewed(spark)
    got = {
        (r["k"]): (r["cnt"], r["total"], r["mx"])
        for r in salted_aggregation(
            df,
            ["k"],
            {
                "cnt": ("sum", F.count("*")),
                "total": ("sum", F.sum("v")),
                "mx": ("max", F.max("v")),
            },
            salts=8,
        ).collect()
    }
    want = {
        (r["k"]): (r["cnt"], r["total"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("cnt"), F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == want


def test_salted_join_matches_plain(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k2", "K2")], ["k2_", "label"]
    )
    got = salted_broadcast_left(fact, dim, "k", "k2_", salts=4)
    plain = fact.join(dim, fact["k"] == dim["k2_"])
    assert got.count() == plain.count() == 902
    assert got.filter(F.col("label") == "HOT").count() == 900


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key: the join plan must contain no
    Exchange — the write-time bucketing replaces the runtime shuffle."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    orders = spark.range(0, 1000).select(
        F.col("id").alias("o_key"), (F.col("id") % 97).alias("o_val")
    )
    items = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("i_key"), F.col("id").alias("i_val")
    )
    cat.put_bucketed(orders, "b_orders", "o_key", num_buckets=8)
    cat.put_bucketed(items, "b_items", "i_key", num_buckets=8)
    # disable broadcast so the planner exercises the bucketed SMJ path
    # (at test scale it would otherwise broadcast and ignore buckets)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = cat.get_bucketed("b_orders")
        b = cat.get_bucketed("b_items")
        joined = a.join(b, a["o_key"] == b["i_key"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join must not shuffle:\n" + plan
        )
        assert "Bucketed: true" in plan
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")
