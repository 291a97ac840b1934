"""ANN capacity sizing (ivf_capacity's √N rule): the auto-sized index
holds recall against the exact tier at two scale factors, and the rule
itself has the right asymptotics. VERDICT r7 item 5: fixture constants
(16 centroids) stop making sense at 100× corpus scale — posting lists
grow linearly and per-check cost follows cluster population."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from simple_map_reduce_spark.catalog import Catalog
from simple_map_reduce_spark.operators.similarity import (
    IvfIndex,
    cosine_topk,
    ivf_capacity,
)
from simple_map_reduce_spark.sources.readers import load_table


def test_ivf_capacity_rule_shape():
    # √N centroids, N^(1/4) probes — candidate work N^(3/4), sublinear
    assert ivf_capacity(0) == (1, 1)
    assert ivf_capacity(1) == (1, 1)
    assert ivf_capacity(100) == (10, 3)
    assert ivf_capacity(10_000) == (100, 10)
    nc, npr = ivf_capacity(10**12)  # a 100 TB-ish vector count
    assert nc == 65536  # broadcast-quantizer ceiling
    assert npr == 256
    # monotone, never exceeding N
    prev = (1, 1)
    for n in (1, 5, 50, 500, 5_000, 50_000):
        cur = ivf_capacity(n)
        assert cur[0] <= n and cur[1] <= cur[0]
        assert cur >= prev
        prev = cur


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_autosized_index_recall_against_exact(spark, tmp_path, sf_dir):
    """Recall@5 gate at two scale factors: an IvfIndex built with NO
    capacity parameters (the √N rule end to end, including the stored-
    quantizer nprobe resolution at query time) finds ≥ 0.8 of the exact
    tier's neighbors. Measured 0.88 at N=500 and 1.00 at N=2000 —
    the gate has slack for testdata regeneration, not for a broken
    sizing rule (a fixture-constant 16/4 at N=2000 probes 25% of a
    16-cluster layout; √N probes 7/45 ≈ 16% of a far finer one and
    still holds recall because each posting list is 3× smaller)."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    qids = [0, 1, 2, 3, 4]
    k = 5
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(emb, qids, k=k).collect()
    }
    cat = Catalog(spark, str(tmp_path / "capwh"))
    idx = IvfIndex(cat, "cap_t")  # NO capacity params: the rule decides
    idx.build(emb)
    nc, npr = ivf_capacity(n)
    assert cat.get(idx.centroids_table).count() == nc
    assert idx._resolved_nprobe() == npr
    got = {
        (r.query_id, r.neighbor_id)
        for r in idx.search_ids(qids, k=k).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.8, f"recall {recall:.2f} at N={n} (nc={nc}, nprobe={npr})"


def test_autosized_rebuild_rescales_with_corpus(spark, tmp_path):
    """An auto-sized index REBUILT after growth re-resolves its capacity
    from the new corpus count — the maintain/rebuild loop keeps the √N
    invariant as the index grows, instead of freezing day-1 sizing."""
    rows = [(i, [float(i % 7), float(i % 5), 1.0, 0.0]) for i in range(16)]
    emb16 = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cat = Catalog(spark, str(tmp_path / "growwh"))
    idx = IvfIndex(cat, "grow_t")
    idx.build(emb16)
    assert cat.get(idx.centroids_table).count() == ivf_capacity(16)[0]  # 4
    rows2 = [(i, [float(i % 7), float(i % 5), 1.0, 0.0]) for i in range(100)]
    idx.build(spark.createDataFrame(rows2, ["vec_id", "embedding"]))
    assert cat.get(idx.centroids_table).count() == ivf_capacity(100)[0]  # 10
    # rebuild over the standing 100 vectors keeps the rescaled size
    idx.rebuild()
    assert cat.get(idx.centroids_table).count() == 10
    assert math.isclose(idx._resolved_nprobe(), 3)
