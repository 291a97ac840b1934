"""Tracked-persist lifecycle: operator caches release on demand."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_spark.cache import release_tracked, tracked_persist


def test_release_tracked_unpersists(spark):
    df = tracked_persist(spark.range(100).selectExpr("id", "id * 2 AS v"))
    df.count()  # materialize the cache
    assert df.storageLevel.useMemory or df.storageLevel.useDisk
    released = release_tracked()
    assert released >= 1
    assert not (df.storageLevel.useMemory or df.storageLevel.useDisk)
    # idempotent: nothing tracked afterwards
    assert release_tracked() == 0


def test_lsh_dedup_leaves_no_cache_after_release(spark):
    from simple_map_reduce_spark.operators.dedup import minhash_dup_pairs

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumped"),
         (3, "completely different text here now")],
        ["doc_id", "text"],
    )
    minhash_dup_pairs(docs, "doc_id", "text").collect()
    assert release_tracked() >= 2  # shingles + buckets were tracked
