"""The closed maintenance loop (IvfIndex.maintain / NearDupIndex.maintain):
a drifted index trips its threshold and self-remedies; a healthy one is a
no-op; every signal lands in the report either way."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_spark.catalog import Catalog
from simple_map_reduce_spark.operators.dedup import NearDupIndex
from simple_map_reduce_spark.operators.similarity import IvfIndex

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep dark forest to hide from every hunter"
)
NEAR = BASE.replace("dark", "misty")
FAR = "completely different content about databases and distributed query engines at scale"


def _skewed_emb(spark):
    """ids 0,1 are near-identical x-axis seeds → both seed centroids sit
    in the x cluster and every y vector piles onto one of them (the
    cluster_stats/rebuild fixture)."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0, 0.0]),
        (2, [0.98, 0.02, 0.0, 0.0]),
        (3, [0.97, 0.01, 0.0, 0.0]),
        (4, [0.0, 1.0, 0.0, 0.0]),
        (5, [0.01, 0.99, 0.0, 0.0]),
        (6, [0.02, 0.98, 0.0, 0.0]),
        (7, [0.0, 0.97, 0.01, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_ivf_maintain_rebuilds_on_skew_and_search_is_stable(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "mwh_a"))
    idx = IvfIndex(cat, "mnt_a", n_centroids=2, nprobe=2)
    idx.build(_skewed_emb(spark))
    before = sorted(map(tuple, idx.search_ids([0, 4], k=2).collect()))
    report = idx.maintain(max_skew=1.4)
    assert report["action"] == "rebuild"
    assert report["max_skew"] > 1.4
    # rebalanced: the refined quantizer splits the clusters 4/4
    stats = idx.cluster_stats().collect()
    assert sorted(r.n_vectors for r in stats) == [4, 4]
    assert max(r.skew for r in stats) < report["max_skew"]
    # the quantizer changes the PHYSICAL layout, not these answers
    after = sorted(map(tuple, idx.search_ids([0, 4], k=2).collect()))
    assert after == before
    # and the now-healthy index is a no-op on the next sweep
    assert idx.maintain(max_skew=1.4)["action"] == "none"


def test_ivf_maintain_vacuums_on_tombstone_debt(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "mwh_b"))
    idx = IvfIndex(cat, "mnt_b", n_centroids=2, nprobe=2)
    idx.build(_skewed_emb(spark))
    idx.delete([2, 3, 6])  # 3 dead / 5 live = 0.6 > the 0.2 default
    report = idx.maintain(max_skew=100.0)  # skew check disarmed
    assert report["action"] == "vacuum"
    assert report["tombstone_share"] == 3 / 5
    assert not cat.exists(idx.tombstones_table)
    stored = {r.id for r in cat.get_bucketed(idx.vectors_table).select("id").collect()}
    assert stored == {0, 1, 4, 5, 7}


def test_ivf_maintain_compacts_on_fragmentation(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "mwh_c"))
    idx = IvfIndex(cat, "mnt_c", n_centroids=2, nprobe=2, num_buckets=4)
    idx.build(_skewed_emb(spark))
    # two ingest epochs append two more file sets per state table
    for i, vec in ((100, [0.0, 0.0, 1.0, 0.0]), (200, [0.0, 0.0, 0.0, 1.0])):
        idx.ingest(
            spark.createDataFrame([(i, vec)], ["vec_id", "embedding"]), tau=0.99
        )
    frag = cat.file_count(idx.assign_table) / idx.num_buckets
    report = idx.maintain(max_skew=100.0, max_files_per_bucket=1)
    assert report["action"] == "compact"
    assert report["max_files_per_bucket"] >= frag
    assert cat.file_count(idx.assign_table) <= idx.num_buckets * 4  # bounded
    assert cat.file_count(idx.assign_table) < frag * idx.num_buckets or frag <= 4
    # state intact after the rewrite
    stored = {r.id for r in cat.get_bucketed(idx.vectors_table).select("id").collect()}
    assert stored == set(range(8)) | {100, 200}


def test_neardup_maintain_signals_and_vacuum(spark, tmp_path):
    corpus = spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, FAR)], "doc_id bigint, text string"
    )
    cat = Catalog(spark, str(tmp_path / "mwh_d"))
    # max_bucket=1: docs 1 and 2 share band buckets, so the cap excludes
    # rows → a real capped_share signal without synthetic state
    idx = NearDupIndex(cat, "mnt_d", threshold=0.3, max_bucket=1)
    idx.build(corpus)
    report = idx.maintain()
    assert report["action"] == "none"
    assert report["capped_share"] > 0.0
    assert report["reband_recommended"] is True  # signal, never auto-fix
    # takedown debt → vacuum
    idx.delete([1])
    report2 = idx.maintain()
    assert report2["action"] == "vacuum"
    assert report2["tombstone_share"] == 1 / 2
    assert not cat.exists(idx.tombstones_table)
    assert cat.get(idx.sizes_table).filter("id = 1").count() == 0


def test_neardup_maintain_compacts_on_fragmentation(spark, tmp_path):
    corpus = spark.createDataFrame([(1, FAR)], "doc_id bigint, text string")
    cat = Catalog(spark, str(tmp_path / "mwh_e"))
    idx = NearDupIndex(cat, "mnt_e", threshold=0.3, num_buckets=4)
    idx.build(corpus)
    idx.ingest(spark.createDataFrame([(10, BASE)], "doc_id bigint, text string"))
    report = idx.maintain(max_files_per_bucket=1)
    assert report["action"] == "compact"
    # check still answers correctly over the compacted layout
    got = {
        r.id_corpus
        for r in idx.check(
            spark.createDataFrame([(20, NEAR)], "doc_id bigint, text string")
        ).collect()
    }
    assert got == {10}
