"""Bm25Index (the standing sparse-retrieval index): bit-parity with the
recompute form, the bucket-pruned serving scan, and the build contract
(zero-token docs still count toward N/avgdl)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simple_map_reduce_spark.catalog import Catalog
from simple_map_reduce_spark.operators.retrieval import Bm25Index, bm25_topk
from simple_map_reduce_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE

QUERIES = [(1, ["hash", "join"]), (2, ["filter", "scan", "column"])]


def test_index_search_matches_recompute_form(spark, tmp_path):
    """The serving path must return EXACTLY what the recompute form
    returns over the same corpus — shared scoring core, shared oracle."""
    docs = load_table(spark, SF_SMOKE, "documents")
    cat = Catalog(spark, str(tmp_path / "bwh"))
    idx = Bm25Index(cat, "b_t")
    idx.build(docs)
    got = sorted(map(tuple, idx.search(QUERIES, k=7).collect()))
    want = sorted(map(tuple, bm25_topk(docs, QUERIES, k=7).collect()))
    assert got == want and got


def test_search_scan_is_bucket_pruned(spark, tmp_path):
    """THE serving-scale property: the term lookup reads ONLY the
    buckets containing query terms (SelectedBucketsCount < total) on
    both the postings and df tables, with the In(tok, …) filter pushed
    to the scan — at 100 TB this is the difference between reading a
    few posting lists and reading the whole inverted index."""
    docs = load_table(spark, SF_SMOKE, "documents")
    cat = Catalog(spark, str(tmp_path / "bwh2"))
    idx = Bm25Index(cat, "b_p")
    idx.build(docs)
    plan = idx.search(QUERIES, k=5)._jdf.queryExecution().executedPlan().toString()
    for token in ("__postings", "__df"):
        scans = [
            l for l in plan.splitlines() if "FileScan" in l and token in l
        ]
        assert scans, f"no {token} scan in plan"
        for line in scans:
            assert "Bucketed: true" in line, line
            assert "In(tok" in line, f"tok filter not pushed: {line}"
            sel = line.split("SelectedBucketsCount: ")[1]
            picked, total = int(sel.split(" out of ")[0]), int(
                sel.split(" out of ")[1].split()[0].rstrip(",")
            )
            assert picked < total, f"{token} scan not bucket-pruned: {sel}"


def test_build_counts_zero_token_docs(spark, tmp_path):
    """A doc with no \\w+ tokens has no postings rows but MUST count in
    N and avgdl — the recompute form derives lengths from the corpus, so
    a divergence here would silently shift every idf/avgdl weight."""
    docs = spark.createDataFrame(
        [(1, "hash join tables"), (2, "!!! ---"), (3, "scan the hash")],
        "doc_id bigint, text string",
    )
    cat = Catalog(spark, str(tmp_path / "bwh3"))
    idx = Bm25Index(cat, "b_z")
    idx.build(docs)
    stats = cat.get(idx.stats_table).collect()[0]
    assert stats.n_docs == 3  # the punctuation-only doc counts
    lengths = {r.doc_id: r.dl for r in cat.get_bucketed(idx.lengths_table).collect()}
    assert lengths == {1: 3, 2: 0, 3: 3}
    got = sorted(map(tuple, idx.search([(1, ["hash"])], k=5).collect()))
    want = sorted(
        map(tuple, bm25_topk(docs, [(1, ["hash"])], k=5).collect())
    )
    assert got == want


def test_rebuild_overwrite_is_clean(spark, tmp_path):
    """build() over a new corpus replaces all four tables — no stale
    postings from the previous corpus survive."""
    cat = Catalog(spark, str(tmp_path / "bwh4"))
    idx = Bm25Index(cat, "b_r")
    idx.build(
        spark.createDataFrame([(1, "alpha beta")], "doc_id bigint, text string")
    )
    idx.build(
        spark.createDataFrame([(2, "gamma delta")], "doc_id bigint, text string")
    )
    assert idx.search([(1, ["alpha"])], k=5).count() == 0
    got = idx.search([(1, ["gamma"])], k=5).collect()
    assert [r.doc_id for r in got] == [2]
    assert cat.get(idx.stats_table).collect()[0].n_docs == 1
