"""Takedown/tombstone deletion matrix for the standing indexes.

The invariants under test (operators/tombstones.py):
- after delete(ids), every read path behaves EXACTLY as a from-scratch
  build without those ids (same quantizer/banding — the id-ordered
  seeds survive when the deleted ids aren't seeds);
- delete is idempotent (retry converges, returns 0 new);
- ingest REFUSES a batch carrying a tombstoned id (fail fast — the
  silent alternative is an "accepted" row invisible to every read);
- vacuum physically purges, drops the tombstone table LAST, and leaves
  read results bit-identical to the tombstoned state; after vacuum the
  id may be re-admitted;
- a PARTIAL vacuum (crash between the table rewrites and the tombstone
  drop) leaves every read correct — the crash-safety ordering argument.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

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


def _clustered_emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.95, 0.05, 0.0, 0.0]),
        (3, [0.9, 0.02, 0.0, 0.0]),
        (4, [0.05, 0.95, 0.0, 0.0]),
        (5, [0.02, 0.9, 0.0, 0.0]),
        (6, [0.97, 0.01, 0.0, 0.0]),
        (7, [0.01, 0.97, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _search_set(idx, qids, k=5):
    return {
        (r.query_id, r.neighbor_id, r.score, r.rank)
        for r in idx.search_ids(qids, k=k).collect()
    }


# ---------------------------------------------------------------- IVF


def test_ivf_delete_matches_fresh_build_without_ids(spark, tmp_path):
    """The VERDICT-r7 'done' criterion: search results after delete are
    identical to a from-scratch build that never saw the deleted ids
    (seeds 0 and 1 survive, so the quantizer is the same)."""
    cat = Catalog(spark, str(tmp_path / "wh_a"))
    idx = IvfIndex(cat, "del_a", n_centroids=2)
    idx.build(_clustered_emb(spark))
    assert idx.delete([2, 6]) == 2

    cat_ref = Catalog(spark, str(tmp_path / "wh_ref"))
    ref = IvfIndex(cat_ref, "ref_a", n_centroids=2)
    ref.build(_clustered_emb(spark).filter("vec_id NOT IN (2, 6)"))

    assert _search_set(idx, [0, 1]) == _search_set(ref, [0, 1])
    # the external-query path funnels through the same live view
    q = spark.createDataFrame([(-1, [0.98, 0.02, 0.0, 0.0])], ["vec_id", "embedding"])
    got = {r.neighbor_id for r in idx.search(q, k=10).collect()}
    assert got and 2 not in got and 6 not in got
    # a tombstoned query id is absent — no rows, like never admitted
    assert idx.search_ids([2], k=5).count() == 0
    # neardup_check never matches a deleted vector
    batch = spark.createDataFrame([(100, [0.95, 0.05, 0.0, 0.0])], ["vec_id", "embedding"])
    kept = {r.kept_id for r in idx.neardup_check(batch, tau=0.9).collect()}
    assert kept and 2 not in kept and 6 not in kept
    # cluster_stats counts live vectors only
    live_total = sum(
        r.n_vectors for r in idx.cluster_stats().collect()
    )
    assert live_total == 6


def test_ivf_delete_idempotent_and_ingest_refuses(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh_b"))
    idx = IvfIndex(cat, "del_b", n_centroids=2)
    idx.build(_clustered_emb(spark))
    assert idx.delete([3, 999]) == 2  # absent ids tombstone harmlessly
    assert idx.delete([3]) == 0       # retry converges
    batch = spark.createDataFrame(
        [(3, [0.9, 0.02, 0.0, 0.0]), (200, [0.0, 0.0, 1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    with pytest.raises(ValueError, match="tombstoned"):
        idx.ingest(batch, tau=0.9)
    # the refused ingest wrote nothing
    stored = {r.id for r in cat.get_bucketed(idx.vectors_table).select("id").collect()}
    assert stored == set(range(8))


def test_ivf_vacuum_purges_and_readmits(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh_c"))
    idx = IvfIndex(cat, "del_c", n_centroids=2)
    idx.build(_clustered_emb(spark))
    idx.delete([2, 6])
    before = _search_set(idx, [0, 1])
    assert idx.vacuum() == 2
    # physically gone, tombstone table gone, reads bit-identical
    stored = {r.id for r in cat.get_bucketed(idx.vectors_table).select("id").collect()}
    assert stored == {0, 1, 3, 4, 5, 7}
    assigned = {r.id for r in cat.get_bucketed(idx.assign_table).select("id").collect()}
    assert assigned == stored
    assert not cat.exists(idx.tombstones_table)
    assert _search_set(idx, [0, 1]) == before
    assert idx.vacuum() == 0  # no tombstones → no-op
    # after vacuum the id is re-admittable (novel again)
    report = idx.ingest(
        spark.createDataFrame([(6, [0.0, 0.0, 1.0, 0.0])], ["vec_id", "embedding"]),
        tau=0.9,
    )
    assert report.count() == 0  # accepted, no dup match
    stored2 = {r.id for r in cat.get_bucketed(idx.vectors_table).select("id").collect()}
    assert 6 in stored2


def test_ivf_partial_vacuum_crash_keeps_reads_correct(spark, tmp_path):
    """Crash matrix: vacuum rewrites assign, then vectors, then drops
    tombstones. Emulate a crash after the FIRST rewrite — the tombstone
    table is still in force, so every read stays correct, and a retried
    vacuum heals to the clean state."""
    from pyspark.sql import functions as F

    cat = Catalog(spark, str(tmp_path / "wh_d"))
    idx = IvfIndex(cat, "del_d", n_centroids=2)
    idx.build(_clustered_emb(spark))
    idx.delete([2, 6])
    want = _search_set(idx, [0, 1])
    # crash prefix: assign rewritten live, vectors NOT, tombstones kept
    ts = cat.get(idx.tombstones_table).select("id")
    assign_live = (
        cat.get_bucketed(idx.assign_table)
        .join(F.broadcast(ts), "id", "left_anti")
        .localCheckpoint()
    )
    cat.put_bucketed(assign_live, idx.assign_table, "centroid_id", idx.num_buckets)
    assert cat.exists(idx.tombstones_table)
    assert _search_set(idx, [0, 1]) == want  # reads correct mid-crash
    assert idx.vacuum() == 2  # retry heals
    assert not cat.exists(idx.tombstones_table)
    assert _search_set(idx, [0, 1]) == want


def test_ivf_rebuild_purges_tombstones(spark, tmp_path):
    """rebuild() doubles as vacuum-with-retraining: live vectors only,
    tombstones dropped, results match a fresh build without the ids."""
    cat = Catalog(spark, str(tmp_path / "wh_e"))
    idx = IvfIndex(cat, "del_e", n_centroids=2)
    idx.build(_clustered_emb(spark))
    idx.delete([2, 6])
    idx.rebuild()
    assert not cat.exists(idx.tombstones_table)
    stored = {r.id for r in cat.get_bucketed(idx.vectors_table).select("id").collect()}
    assert stored == {0, 1, 3, 4, 5, 7}
    cat_ref = Catalog(spark, str(tmp_path / "wh_eref"))
    ref = IvfIndex(cat_ref, "ref_e", n_centroids=2)
    ref.build(_clustered_emb(spark).filter("vec_id NOT IN (2, 6)"))
    assert _search_set(idx, [0, 1]) == _search_set(ref, [0, 1])


# ------------------------------------------------------------ NearDup


def test_neardup_delete_matches_fresh_build_without_ids(spark, tmp_path):
    corpus = spark.createDataFrame(
        [(1, BASE), (2, FAR), (3, FAR2)], "doc_id bigint, text string"
    )
    batch = spark.createDataFrame([(10, NEAR)], "doc_id bigint, text string")
    cat = Catalog(spark, str(tmp_path / "nwh_a"))
    idx = NearDupIndex(cat, "ndel_a", threshold=0.3)
    idx.build(corpus)
    # sanity: 10 matches 1 before the takedown
    assert {r.id_corpus for r in idx.check(batch).collect()} == {1}
    assert idx.delete([1]) == 1
    assert idx.check(batch).count() == 0
    # identical to a from-scratch build without doc 1
    cat_ref = Catalog(spark, str(tmp_path / "nwh_ref"))
    ref = NearDupIndex(cat_ref, "nref_a", threshold=0.3)
    ref.build(corpus.filter("doc_id != 1"))
    assert (
        idx.check(batch).collect() == ref.check(batch).collect()
    )
    # bucket_stats counts live rows only — equal to the ref index's
    live_rows = sum(r.n_rows for r in idx.bucket_stats().collect())
    ref_rows = sum(r.n_rows for r in ref.bucket_stats().collect())
    assert live_rows == ref_rows


def test_neardup_ingest_refuses_then_vacuum_readmits(spark, tmp_path):
    corpus = spark.createDataFrame(
        [(1, BASE), (2, FAR)], "doc_id bigint, text string"
    )
    cat = Catalog(spark, str(tmp_path / "nwh_b"))
    idx = NearDupIndex(cat, "ndel_b", threshold=0.3)
    idx.build(corpus)
    idx.delete([1])
    assert idx.delete([1]) == 0  # idempotent
    with pytest.raises(ValueError, match="tombstoned"):
        idx.ingest(
            spark.createDataFrame([(1, BASE)], "doc_id bigint, text string")
        )
    assert idx.vacuum() == 1
    assert not cat.exists(idx.tombstones_table)
    for t in (idx.buckets_table, idx.sizes_table, idx.shingles_table):
        assert cat.get(t).filter("id = 1").count() == 0
    # re-admission after vacuum: doc 1 is novel again and is ACCEPTED
    report = idx.ingest(
        spark.createDataFrame([(1, BASE)], "doc_id bigint, text string")
    )
    assert report.count() == 0
    assert cat.get(idx.sizes_table).filter("id = 1").count() == 1
    # and a NEAR batch matches it again
    got = {
        r.id_corpus
        for r in idx.check(
            spark.createDataFrame([(20, NEAR)], "doc_id bigint, text string")
        ).collect()
    }
    assert got == {1}


def test_neardup_partial_vacuum_crash_keeps_reads_correct(spark, tmp_path):
    """Crash prefix of vacuum (buckets rewritten, sizes/shingles not,
    tombstones kept): check() stays correct; retry heals."""
    from pyspark.sql import functions as F

    corpus = spark.createDataFrame(
        [(1, BASE), (2, FAR), (3, FAR2)], "doc_id bigint, text string"
    )
    batch = spark.createDataFrame([(10, NEAR)], "doc_id bigint, text string")
    cat = Catalog(spark, str(tmp_path / "nwh_c"))
    idx = NearDupIndex(cat, "ndel_c", threshold=0.3)
    idx.build(corpus)
    idx.delete([1])
    ts = cat.get(idx.tombstones_table).select("id")
    bk_live = (
        cat.get_bucketed(idx.buckets_table)
        .join(F.broadcast(ts), "id", "left_anti")
        .localCheckpoint()
    )
    cat.put_bucketed(bk_live, idx.buckets_table, idx._BUCKET_KEYS, idx.num_buckets)
    assert cat.exists(idx.tombstones_table)
    assert idx.check(batch).count() == 0  # reads correct mid-crash
    assert idx.vacuum() == 1
    assert idx.check(batch).count() == 0
    for t in (idx.buckets_table, idx.sizes_table, idx.shingles_table):
        assert cat.get(t).filter("id = 1").count() == 0


def test_tombstone_antijoin_is_broadcast_no_new_exchange(spark, tmp_path):
    """THE scale property of the tombstone design: after a delete, the
    live-view anti-join is a BROADCAST join (explicit hint — survives
    autoBroadcastJoinThreshold=-1), so the bucketed corpus scans still
    reach their consumers with NO shuffle Exchange — deleting 100 ids
    must never add a corpus-sized shuffle to every subsequent read."""
    from pyspark.sql import functions as F

    from simple_map_reduce_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE
    from tests.test_dedup import _scan_ancestries

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    cat = Catalog(spark, str(tmp_path / "planwh"))
    idx = NearDupIndex(cat, "plan_t", threshold=0.3)
    idx.build(corpus)
    idx.delete([1, 11, 21])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = idx.check(batch)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    chains = _scan_ancestries(plan, "__buckets")
    assert chains, "no __buckets scan found in plan"
    for chain in chains:
        joined = next(
            (k for k, l in enumerate(chain)
             if "SortMergeJoin" in l or "HashAggregate" in l),
            len(chain),
        )
        shuffled = next(
            (k for k, l in enumerate(chain)
             if "Exchange" in l and "Broadcast" not in l),
            len(chain),
        )
        assert joined < shuffled, (
            "shuffle Exchange above the tombstone-filtered __buckets scan:\n"
            + "\n".join(chain[: shuffled + 1])
        )


def test_build_clears_stale_tombstones(spark, tmp_path):
    """A full (re)build replaces the state wholesale — tombstones
    against the OLD state must not hide ids in the new corpus."""
    cat = Catalog(spark, str(tmp_path / "nwh_d"))
    idx = NearDupIndex(cat, "ndel_d", threshold=0.3)
    corpus = spark.createDataFrame(
        [(1, BASE), (2, FAR)], "doc_id bigint, text string"
    )
    idx.build(corpus)
    idx.delete([1])
    idx.build(corpus)  # fresh build: the caller chose this corpus
    assert not cat.exists(idx.tombstones_table)
    got = {
        r.id_corpus
        for r in idx.check(
            spark.createDataFrame([(20, NEAR)], "doc_id bigint, text string")
        ).collect()
    }
    assert got == {1}


def test_empty_first_delete_keeps_fast_path(spark, tmp_path):
    """ADVICE r8: delete([]) on an index that has never seen a delete
    must NOT create the tombstone table — an empty one would permanently
    switch every read off the free exists() fast path onto the
    broadcast anti-join."""
    cat = Catalog(spark, str(tmp_path / "wh_empty"))
    idx = IvfIndex(cat, "del_e", n_centroids=2)
    idx.build(_clustered_emb(spark))
    assert idx.delete([]) == 0
    assert not cat.exists(idx.tombstones_table)
    # and the established semantics are unchanged once a real delete runs
    assert idx.delete([3]) == 1
    assert cat.exists(idx.tombstones_table)


# ---------------------------------------------------------------- BM25
# the sparse-retrieval member of the takedown matrix (VERDICT r8 item 2):
# deletion must leave every corpus-GLOBAL statistic (df, N, avgdl) exact,
# not just hide posting rows.

from simple_map_reduce_spark.operators.retrieval import Bm25Index  # noqa: E402

BM25_DOCS = [
    (1, BASE),
    (2, NEAR),
    (3, FAR),
    (4, FAR2),
    (5, "hash join tables with a merge hash strategy"),
    (6, "filter then scan the column store for hash lookups"),
    (7, "scan scan scan the filter"),
]
BM25_Q = [(1, ["hash", "scan"]), (2, ["filter"])]


def _bm25_docs(spark):
    return spark.createDataFrame(BM25_DOCS, "doc_id bigint, text string")


def _ranked(idx, k=5):
    return sorted(map(tuple, idx.search(BM25_Q, k=k).collect()))


def test_bm25_delete_matches_fresh_build_without_ids(spark, tmp_path):
    """After delete, search is bit-identical to a fresh build over the
    pruned corpus — df, N, and avgdl all reflect the survivors (the
    recomputed-exact live path), not just hidden posting rows."""
    cat = Catalog(spark, str(tmp_path / "bwh_a"))
    idx = Bm25Index(cat, "bdel_a")
    idx.build(_bm25_docs(spark))
    before = _ranked(idx)
    assert idx.delete([5, 7]) == 2
    ref = Bm25Index(Catalog(spark, str(tmp_path / "bwh_aref")), "bref_a")
    ref.build(_bm25_docs(spark).filter("doc_id NOT IN (5, 7)"))
    got = _ranked(idx)
    assert got == _ranked(ref) and got
    assert got != before  # the takedown visibly changed the results


def test_bm25_delete_idempotent_and_ingest_refuses(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "bwh_b"))
    idx = Bm25Index(cat, "bdel_b")
    idx.build(_bm25_docs(spark))
    assert idx.delete([5, 999]) == 2  # absent ids tombstone harmlessly
    assert idx.delete([5]) == 0       # retry converges
    with pytest.raises(ValueError, match="tombstoned"):
        idx.ingest(
            spark.createDataFrame(
                [(5, "hash resurrection attempt")], "doc_id bigint, text string"
            )
        )
    # the refused ingest wrote nothing
    assert cat.get_bucketed(idx.lengths_table).count() == len(BM25_DOCS)


def test_bm25_vacuum_purges_restores_fast_path_and_readmits(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "bwh_c"))
    idx = Bm25Index(cat, "bdel_c")
    idx.build(_bm25_docs(spark))
    idx.delete([5, 7])
    tombstoned = _ranked(idx)
    assert idx.vacuum() == 2
    assert not cat.exists(idx.tombstones_table)
    # bit-identical through the purge, now on the precomputed fast path
    assert _ranked(idx) == tombstoned
    assert cat.get(idx.stats_table).collect()[0].n_docs == len(BM25_DOCS) - 2
    # after vacuum the id may be re-admitted
    assert idx.ingest(
        spark.createDataFrame([(5, BM25_DOCS[4][1])], "doc_id bigint, text string")
    ) == 1
    ref = Bm25Index(Catalog(spark, str(tmp_path / "bwh_cref")), "bref_c")
    ref.build(_bm25_docs(spark).filter("doc_id != 7"))
    assert _ranked(idx) == _ranked(ref)


def test_bm25_partial_vacuum_crash_keeps_reads_correct(spark, tmp_path):
    """Crash after the postings rewrite but before the lengths rewrite /
    stats re-derive / tombstone drop: the tombstones stay in force, so
    the live view keeps every read exact; the vacuum retry heals."""
    from pyspark.sql import functions as F

    cat = Catalog(spark, str(tmp_path / "bwh_d"))
    idx = Bm25Index(cat, "bdel_d")
    idx.build(_bm25_docs(spark))
    idx.delete([5, 7])
    want = _ranked(idx)
    # emulate the crash: ONLY the postings rewrite landed
    from simple_map_reduce_spark.operators.tombstones import read_tombstones

    ts = read_tombstones(cat, idx.name)
    dead = F.broadcast(ts.select(F.col("id").alias("doc_id")))
    post = (
        cat.get_bucketed(idx.postings_table)
        .join(dead, "doc_id", "left_anti")
        .localCheckpoint()
    )
    cat.put_bucketed(post, idx.postings_table, "tok", idx.num_buckets)
    assert _ranked(idx) == want  # reads stay correct through the prefix
    assert idx.vacuum() == 2     # the retry heals
    assert _ranked(idx) == want
    assert not cat.exists(idx.tombstones_table)


def test_bm25_build_clears_stale_tombstones(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "bwh_e"))
    idx = Bm25Index(cat, "bdel_e")
    idx.build(_bm25_docs(spark))
    idx.delete([5])
    idx.build(_bm25_docs(spark))  # fresh build: the caller chose this corpus
    assert not cat.exists(idx.tombstones_table)
    got = {r.doc_id for r in idx.search([(1, ["hash"])], k=10).collect()}
    assert 5 in got


def test_bm25_live_search_stays_bucket_pruned_and_broadcast(spark, tmp_path):
    """The scale property survives the tombstone tier: with tombstones
    outstanding, the postings scan is still bucket-pruned on the query
    terms and the live anti-join is a BROADCAST join — takedown must
    never add a corpus shuffle to the serving path."""
    from simple_map_reduce_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    cat = Catalog(spark, str(tmp_path / "bwh_f"))
    idx = Bm25Index(cat, "bdel_f")
    idx.build(docs)
    idx.delete([1, 11, 21])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            idx.search([(1, ["hash", "join"])], k=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    scans = [
        l for l in plan.splitlines() if "FileScan" in l and "__postings" in l
    ]
    assert scans
    for line in scans:
        assert "Bucketed: true" in line and "In(tok" in line, line
        sel = line.split("SelectedBucketsCount: ")[1]
        picked = int(sel.split(" out of ")[0])
        total = int(sel.split(" out of ")[1].split()[0].rstrip(","))
        assert picked < total, f"postings scan not bucket-pruned: {sel}"


def test_bm25_maintain_vacuums_then_compacts(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "bwh_g"))
    idx = Bm25Index(cat, "bdel_g", num_buckets=2)
    idx.build(_bm25_docs(spark))
    idx.delete([5, 7])  # 2 dead / 5 live = 0.4 > the 0.2 default
    report = idx.maintain()
    assert report["action"] == "vacuum"
    assert report["tombstone_share"] == 2 / 5
    assert not cat.exists(idx.tombstones_table)
    # an ingest appends a second file set → fragmentation trips compact
    idx.ingest(
        spark.createDataFrame(
            [(10, "novel hash content")], "doc_id bigint, text string"
        )
    )
    report2 = idx.maintain(max_files_per_bucket=1)
    assert report2["action"] == "compact"
    ref = Bm25Index(Catalog(spark, str(tmp_path / "bwh_gref")), "bref_g")
    ref.build(
        _bm25_docs(spark)
        .filter("doc_id NOT IN (5, 7)")
        .unionByName(
            spark.createDataFrame(
                [(10, "novel hash content")], "doc_id bigint, text string"
            )
        )
    )
    assert _ranked(idx) == _ranked(ref)
