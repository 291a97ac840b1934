"""Composed corpus-prep pipeline: stage semantics and single-pass fusion."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simple_map_reduce_spark.pipelines import prepare_corpus

DOCS = [
    # two exact duplicates of a decent english doc -> one survivor (min id)
    (1, "the cat and the dog are in the house with the other animals today"),
    (2, "the cat and the dog are in the house with the other animals today"),
    # junk: pure punctuation -> filtered by quality
    (3, "!!! ??? ... ;;; ::: !!! ??? ... ;;; :::"),
    (4, "the quick brown fox jumps over the lazy dog and then it sleeps"),
]


def test_dedup_keeps_min_id_and_filters_junk(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = prepare_corpus(docs, min_quality=0.2).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert 2 not in ids  # duplicate dropped, min-id representative kept
    assert 1 in ids and 4 in ids
    assert 3 not in ids  # junk below quality floor
    row = next(r for r in out if r["doc_id"] == 1)
    assert row["lang_pred"] == "en" and row["n_ws"] > 0 and row["n_bpe"] > 0


def test_no_dedup_keeps_both_copies(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = prepare_corpus(docs, min_quality=0.2, dedup=False)
    assert {r["doc_id"] for r in out.collect()} >= {1, 2, 4}


def test_scoring_stages_fuse_into_one_scan(spark, tmp_path):
    """Quality + lang scoring + filter must not introduce a shuffle —
    everything up to the dedup groupBy is one map-side pass."""
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = (
        prepare_corpus(docs, min_quality=0.2, dedup=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
