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
FAR2 = "another unrelated passage concerning orchestral music and the history of violins"


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


def test_neardup_maintain_counts_live_docs_directly(spark, tmp_path):
    """ADVICE r8: delete() accepts absent ids harmlessly, so maintain
    must count live docs via the anti-join (the IvfIndex idiom), not as
    corpus − |tombstones| — absent-id tombstones would deflate n_live,
    inflate tombstone_share, and trigger premature vacuums."""
    corpus = spark.createDataFrame(
        [(i, f"{FAR} variant {i} token{i} extra{i}") for i in range(11)],
        "doc_id bigint, text string",
    )
    cat = Catalog(spark, str(tmp_path / "mwh_f"))
    idx = NearDupIndex(cat, "mnt_f", threshold=0.3)
    idx.build(corpus)
    assert idx.delete([901, 902]) == 2  # ids never admitted
    report = idx.maintain()
    # exact share: 2 tombstones over 11 LIVE docs (the subtraction form
    # would read 2/9 ≈ 0.22 > 0.2 and vacuum a healthy index)
    assert report["tombstone_share"] == 2 / 11
    assert report["action"] == "none"
    assert cat.exists(idx.tombstones_table)  # no premature vacuum


def _stream_of(spark, tmp_path, rows_per_epoch):
    import shutil

    src = tmp_path / "doc-stream"
    src.mkdir(parents=True)
    for i, rows in enumerate(rows_per_epoch):
        out = src.parent / f"stage-{i}"
        spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
            1
        ).write.parquet(str(out))
        pf = next(p for p in out.iterdir() if p.name.endswith(".parquet"))
        dst = src / f"{i}.parquet"
        shutil.move(str(pf), str(dst))
        os.utime(dst, (1_000_000_000 + i * 1000,) * 2)
    return (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )


EPOCH_ROWS = [
    [(10, BASE)],
    [(20, FAR + " with several additional trailing words appended")],
    [(30, "a third completely novel document about sailing ships and tides")],
]


def test_ingest_stream_scheduler_runs_maintain(spark, tmp_path):
    """VERDICT r8 item 4: maintain() finally has a scheduler. With
    maintain_every=1 and a zero fragmentation threshold, every committed
    epoch ends in a compaction WITHOUT any manual maintain() call — the
    append-era file sets are folded back to ~one per bucket."""
    corpus = spark.createDataFrame([(1, FAR2)], "doc_id bigint, text string")
    cat = Catalog(spark, str(tmp_path / "mwh_g"))
    idx = NearDupIndex(cat, "mnt_g", threshold=0.3, num_buckets=2)
    idx.build(corpus)
    stream = _stream_of(spark, tmp_path, EPOCH_ROWS)
    idx.ingest_stream(
        stream,
        str(tmp_path / "ckpt"),
        maintain_every=1,
        maintain_kwargs={"max_files_per_bucket": 0},
    )
    # the no-maintain twin over the SAME epochs accumulates one file set
    # per append; the scheduled compactions fold them back under the
    # compactor's floor (parallelism × buckets)
    cat2 = Catalog(spark, str(tmp_path / "mwh_g2"))
    twin = NearDupIndex(cat2, "mnt_g2", threshold=0.3, num_buckets=2)
    twin.build(corpus)
    stream2 = _stream_of(spark, tmp_path / "twin", EPOCH_ROWS)
    twin.ingest_stream(stream2, str(tmp_path / "ckpt2"))
    for table in ("buckets_table", "shingles_table"):
        n_maintained = cat.file_count(getattr(idx, table))
        n_twin = cat2.file_count(getattr(twin, table))
        assert n_maintained < n_twin, (table, n_maintained, n_twin)
        assert n_maintained <= idx.num_buckets * idx.num_buckets
    # state is intact after the scheduled compactions
    got = {
        r.id_corpus
        for r in idx.check(
            spark.createDataFrame([(99, NEAR)], "doc_id bigint, text string")
        ).collect()
    }
    assert got == {10}


def test_ingest_stream_scheduler_below_threshold_is_noop(spark, tmp_path):
    """The same schedule with default thresholds leaves the per-epoch
    file sets in place — the scheduler runs the loop, the loop decides
    nothing needs doing."""
    corpus = spark.createDataFrame([(1, FAR2)], "doc_id bigint, text string")
    cat = Catalog(spark, str(tmp_path / "mwh_h"))
    idx = NearDupIndex(cat, "mnt_h", threshold=0.3, num_buckets=2)
    idx.build(corpus)
    stream = _stream_of(spark, tmp_path, EPOCH_ROWS)
    idx.ingest_stream(stream, str(tmp_path / "ckpt"), maintain_every=1)
    assert cat.file_count(idx.buckets_table) > idx.num_buckets


def test_maintain_sweeps_leaked_epoch_pins(spark, tmp_path):
    """r11 (VERDICT r10 item 6): snapshot trees and __snaps rows leaked
    by crashed keep-best epochs — previously healed only if the SAME
    epoch replayed — are collected by the next maintain(), while an
    UNCOMMITTED epoch's pins (a replay may still need them) survive."""
    from pyspark.sql import functions as F

    cat = Catalog(spark, str(tmp_path / "mwh_sweep"))
    docs = spark.createDataFrame(
        [(0, BASE, 100), (1, NEAR, 90), (2, FAR, 80), (3, FAR2, 70)],
        ["doc_id", "text", "q"],
    )
    idx = NearDupIndex(cat, "sweep_idx")
    idx.build(docs, quality_col="q")

    # leak class 1: trees with NO snaps row (crash between the
    # snapshots and the ONE atomic snaps append)
    orphan_v = cat.snapshot(idx.buckets_table)
    # leak class 2: snaps rows + trees of a COMMITTED epoch (crash
    # between the marker commit and the best-effort pin release)
    committed_pins = {t: cat.snapshot(t) for t in
                      (idx.shingles_table, idx.sizes_table)}
    # and pins of an UNCOMMITTED epoch, which MUST survive the sweep
    live_pin_v = cat.snapshot(idx.quality_table)
    cat.put(
        spark.createDataFrame(
            [(7, t, v) for t, v in committed_pins.items()]
            + [(9, idx.quality_table, live_pin_v)],
            "epoch_id BIGINT, table_name STRING, version BIGINT",
        ),
        idx.snaps_table,
    )
    cat.put(spark.createDataFrame([(7,)], "epoch_id bigint"), idx.kb_epochs_table)

    report = idx.maintain()
    assert report["pins_dropped"] == 3  # orphan + the 2 committed pins
    assert report["snaps_rows_dropped"] == 2  # epoch 7's rows
    assert cat.versions(idx.buckets_table) == []
    assert all(cat.versions(t) == [] for t in committed_pins)
    # the uncommitted epoch's pin and snaps row survive intact
    assert cat.versions(idx.quality_table) == [live_pin_v]
    snaps = cat.get(idx.snaps_table).collect()
    assert [(int(r.epoch_id), r.table_name, int(r.version)) for r in snaps] == [
        (9, idx.quality_table, live_pin_v)
    ]
    # idempotent: a second sweep finds nothing
    report2 = idx.maintain()
    assert report2["pins_dropped"] == 0 and report2["snaps_rows_dropped"] == 0
    assert cat.versions(idx.quality_table) == [live_pin_v]
