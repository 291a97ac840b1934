"""Sequence-packing operator tests: the sharded two-level prefix sum must
be output-identical to the single-window form (that identity is what lets
the unsharded SQL serve as the sharded query's oracle)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_spark.operators.packing import (
    chunk_assignment,
    chunk_assignment_sharded,
)

ROWS = [
    # (doc_id, lang, n_tokens) — gappy ids, uneven shards, multi-group
    (0, "en", 100), (1, "en", 300), (2, "en", 200), (5, "en", 513),
    (7, "en", 1), (11, "en", 511), (12, "en", 0), (30, "en", 999),
    (3, "fr", 512), (4, "fr", 512), (6, "fr", 1), (8, "fr", 700),
    (9, "de", 5),
]


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def test_sharded_equals_single_window(spark):
    sized = spark.createDataFrame(ROWS, "doc_id bigint, lang string, n_tokens bigint")
    simple = _collect(chunk_assignment(sized, chunk_tokens=512))
    for span in (1, 3, 7, 1000):  # 1 = one id per shard; 1000 = one shard
        sharded = _collect(
            chunk_assignment_sharded(sized, chunk_tokens=512, span=span)
        )
        assert sharded == simple, f"span={span} diverged"


def test_prefix_sum_is_exclusive_and_exact(spark):
    sized = spark.createDataFrame(ROWS, "doc_id bigint, lang string, n_tokens bigint")
    out = {
        (r.doc_id): (r.chunk_id, r.chunk_offset)
        for r in chunk_assignment_sharded(sized, chunk_tokens=512, span=3).collect()
        if r.lang == "en"
    }
    # en cumulative starts: 0,100,400,600,1113,1114,1625,1625
    assert out[0] == (0, 0)
    assert out[1] == (0, 100)
    assert out[2] == (0, 400)
    assert out[5] == (1, 88)      # start 600
    assert out[7] == (2, 89)      # start 1113
    assert out[11] == (2, 90)     # start 1114
    assert out[12] == (3, 89)     # start 1625 (zero-token doc keeps start)
    assert out[30] == (3, 89)     # start 1625


def test_split_assign_is_exhaustive_and_validated(spark):
    import pytest

    from simple_map_reduce_spark.operators.sampling import split_assign

    df = spark.createDataFrame([(i,) for i in range(200)], "k bigint")
    out = split_assign(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = out.collect()
    assert len(rows) == 200                       # every row labelled once
    labels = {r.split for r in rows}
    assert labels <= {"train", "val", "test"} and "train" in labels
    # determinism: a re-run assigns identically
    again = {r.k: r.split for r in split_assign(
        df, "k", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert all(again[r.k] == r.split for r in rows)
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(df, "k", {"train": 0.5, "val": 0.1})


def test_multi_group_packing_partitions_by_both_cols(spark):
    """(lang, split) grouping: prefix sums restart per (lang, split)
    pair, and the sharded form stays output-identical."""
    rows = [
        (0, "en", "train", 400), (1, "en", "train", 200),
        (2, "en", "val", 300), (3, "en", "val", 300),
        (4, "fr", "train", 600), (5, "fr", "val", 100),
        (9, "en", "train", 513),
    ]
    sized = spark.createDataFrame(
        rows, "doc_id bigint, lang string, split string, n_tokens bigint"
    )
    out = {
        r["doc_id"]: (r["chunk_id"], r["chunk_offset"])
        for r in chunk_assignment(
            sized, group_col=("lang", "split"), chunk_tokens=512
        ).collect()
    }
    # each (lang, split) stream starts at chunk 0 offset 0
    assert out[0] == (0, 0) and out[2] == (0, 0)
    assert out[4] == (0, 0) and out[5] == (0, 0)
    assert out[1] == (0, 400)          # en/train continues after doc 0
    assert out[3] == (0, 300)          # en/val continues after doc 2
    assert out[9] == (1, 88)           # 600 tokens in -> chunk 1, offset 88
    sharded = {
        r["doc_id"]: (r["chunk_id"], r["chunk_offset"])
        for r in chunk_assignment_sharded(
            sized, group_col=("lang", "split"), chunk_tokens=512, span=2
        ).collect()
    }
    assert sharded == out
