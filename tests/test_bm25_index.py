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


def test_ingest_matches_full_build(spark, tmp_path):
    """THE incremental-maintenance contract: after build(90%) +
    ingest(10%), every search result — hence every corpus-global
    statistic (df, N, avgdl) — is bit-identical to one build over the
    full corpus."""
    docs = load_table(spark, SF_SMOKE, "documents")
    cat = Catalog(spark, str(tmp_path / "iwh"))
    idx = Bm25Index(cat, "i_t")
    idx.build(docs.filter(F.col("doc_id") % 10 != 0))
    n = idx.ingest(docs.filter(F.col("doc_id") % 10 == 0))
    assert n == docs.filter(F.col("doc_id") % 10 == 0).count()
    cat2 = Catalog(spark, str(tmp_path / "iwh_ref"))
    ref = Bm25Index(cat2, "i_ref")
    ref.build(docs)
    got = sorted(map(tuple, idx.search(QUERIES, k=7).collect()))
    want = sorted(map(tuple, ref.search(QUERIES, k=7).collect()))
    assert got == want and got
    # re-ingesting the same batch is a no-op (anti-join healing)
    assert idx.ingest(docs.filter(F.col("doc_id") % 10 == 0)) == 0
    assert sorted(map(tuple, idx.search(QUERIES, k=7).collect())) == want


def test_ingest_crash_between_appends_and_stats_heals(spark, tmp_path):
    """Crash window: postings+lengths appended, df/stats NOT yet
    re-derived → scores use the stale (pre-ingest) corpus statistics —
    consistent, never mixed — and the retried ingest (a no-op append)
    still re-derives, healing to the full-build state."""
    a = spark.createDataFrame(
        [(1, "hash join hash"), (2, "scan filter")], "doc_id bigint, text string"
    )
    b = spark.createDataFrame([(3, "hash scan")], "doc_id bigint, text string")
    cat = Catalog(spark, str(tmp_path / "cwh"))
    idx = Bm25Index(cat, "c_t")
    idx.build(a)
    # emulate the crash: run only the append half of ingest
    from pyspark.sql import functions as SF

    from simple_map_reduce_spark.functions.text import token_count, tokenize

    toks = b.select("doc_id", SF.explode(tokenize("text")).alias("tok"))
    cat.append_bucketed(
        toks.groupBy("tok", "doc_id").agg(SF.count("*").cast("bigint").alias("tf")),
        idx.postings_table, "tok", idx.num_buckets,
    )
    cat.append_bucketed(
        b.select("doc_id", token_count("text").alias("dl")),
        idx.lengths_table, "doc_id", idx.num_buckets,
    )
    # stale-but-consistent: stats still say n_docs=2
    assert cat.get(idx.stats_table).collect()[0].n_docs == 2
    # the retry: appends anti-join to nothing, stats re-derive
    assert idx.ingest(b) == 0
    assert cat.get(idx.stats_table).collect()[0].n_docs == 3
    cat2 = Catalog(spark, str(tmp_path / "cwh_ref"))
    ref = Bm25Index(cat2, "c_ref")
    ref.build(a.unionByName(b))
    q = [(1, ["hash", "scan"])]
    assert sorted(map(tuple, idx.search(q, k=5).collect())) == sorted(
        map(tuple, ref.search(q, k=5).collect())
    )


def test_ingest_zero_token_doc_counts_in_stats(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "zwh"))
    idx = Bm25Index(cat, "z_t")
    idx.build(
        spark.createDataFrame([(1, "hash join")], "doc_id bigint, text string")
    )
    assert idx.ingest(
        spark.createDataFrame([(2, "???")], "doc_id bigint, text string")
    ) == 1
    stats = cat.get(idx.stats_table).collect()[0]
    assert stats.n_docs == 2 and stats.sum_dl == 2  # dl(2)=0 still counts


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


def test_ingest_crash_between_postings_and_lengths_heals(spark, tmp_path):
    """ADVICE r8 (high): a crash AFTER the postings append but BEFORE the
    lengths append leaves the doc postings-present / lengths-absent; the
    retry must re-admit it (n_new counts lengths-fresh docs) WITHOUT
    re-appending its postings — per-table admission sets, or tf and df
    double-count forever."""
    a = spark.createDataFrame(
        [(1, "hash join hash"), (2, "scan filter")], "doc_id bigint, text string"
    )
    b = spark.createDataFrame([(3, "hash scan hash")], "doc_id bigint, text string")
    cat = Catalog(spark, str(tmp_path / "pwh"))
    idx = Bm25Index(cat, "p_t")
    idx.build(a)
    # emulate the crash: ONLY the postings append landed
    from simple_map_reduce_spark.functions.text import tokenize

    toks = b.select("doc_id", F.explode(tokenize("text")).alias("tok"))
    cat.append_bucketed(
        toks.groupBy("tok", "doc_id").agg(F.count("*").cast("bigint").alias("tf")),
        idx.postings_table, "tok", idx.num_buckets,
    )
    assert idx.ingest(b) == 1  # still lengths-fresh → re-admitted
    posted = {
        (r.tok, r.doc_id): r.tf
        for r in cat.get_bucketed(idx.postings_table).collect()
    }
    assert posted[("hash", 3)] == 2  # NOT doubled to 4
    assert cat.get_bucketed(idx.lengths_table).filter("doc_id = 3").count() == 1
    cat2 = Catalog(spark, str(tmp_path / "pwh_ref"))
    ref = Bm25Index(cat2, "p_ref")
    ref.build(a.unionByName(b))
    q = [(1, ["hash", "scan"])]
    assert sorted(map(tuple, idx.search(q, k=5).collect())) == sorted(
        map(tuple, ref.search(q, k=5).collect())
    )


def test_ingest_stream_matches_full_build(spark, tmp_path):
    """All three standing indexes share the streaming surface (VERDICT
    r8 item 3): two mtime-ordered epochs drained through ingest_stream
    leave the index bit-identical to one build over the full corpus,
    with the per-epoch admission records in the reports table."""
    import shutil

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    epochs = [
        docs.filter(F.col("doc_id") % 20 == 0),
        docs.filter(F.col("doc_id") % 20 == 10),
    ]
    src = tmp_path / "doc-stream"
    src.mkdir()
    for i, part in enumerate(epochs):
        out = tmp_path / f"stage-{i}"
        part.select("doc_id", "text").coalesce(1).write.parquet(str(out))
        pf = next(p for p in out.iterdir() if p.name.endswith(".parquet"))
        dst = src / f"{'ab'[i]}.parquet"
        shutil.move(str(pf), str(dst))
        os.utime(dst, (1_000_000_000 + i * 1000,) * 2)

    cat = Catalog(spark, str(tmp_path / "swh"))
    idx = Bm25Index(cat, "s_t")
    idx.build(corpus.select("doc_id", "text"))
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    idx.ingest_stream(stream, str(tmp_path / "ckpt"))

    ref = Bm25Index(Catalog(spark, str(tmp_path / "swh_ref")), "s_ref")
    ref.build(docs.select("doc_id", "text"))
    got = sorted(map(tuple, idx.search(QUERIES, k=7).collect()))
    assert got == sorted(map(tuple, ref.search(QUERIES, k=7).collect())) and got
    reports = cat.get(idx.reports_table)
    assert {r.epoch_id for r in reports.select("epoch_id").distinct().collect()} == {0, 1}
    assert reports.count() == epochs[0].count() + epochs[1].count()
    # epoch markers committed LAST — both present after the drain
    assert cat.get(idx.epochs_table).count() == 2


def test_ingest_stream_replay_after_state_before_marker(spark, tmp_path):
    """Protocol point 4's crash window for the BM25 client: the epoch's
    state appends landed but neither report nor marker did. The replay
    re-runs ingest — whose per-table anti-joins no-op — and must
    re-derive the IDENTICAL admission report (for BM25 the report is a
    pure function of the batch, so replay determinism holds by
    construction; this pins it) without double-counting any postings."""
    import shutil

    cat = Catalog(spark, str(tmp_path / "rwh"))
    idx = Bm25Index(cat, "r_t")
    idx.build(
        spark.createDataFrame([(1, "hash join")], "doc_id bigint, text string")
    )
    batch = spark.createDataFrame(
        [(10, "hash scan hash"), (11, "???")], "doc_id bigint, text string"
    )
    idx.ingest(batch)  # the crash: state landed, report/marker did not
    src = tmp_path / "src"
    src.mkdir()
    out = tmp_path / "stage"
    batch.coalesce(1).write.parquet(str(out))
    part = next(p for p in out.iterdir() if p.name.endswith(".parquet"))
    shutil.move(str(part), str(src / "a.parquet"))
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(str(src))
    idx.ingest_stream(stream, str(tmp_path / "ckpt"))  # replays epoch 0
    reports = sorted(
        (r.doc_id, r.dl, r.epoch_id) for r in cat.get(idx.reports_table).collect()
    )
    assert reports == [(10, 3, 0), (11, 0, 0)]  # re-derived, not skewed
    posted = {
        (r.tok, r.doc_id): r.tf
        for r in cat.get_bucketed(idx.postings_table).collect()
    }
    assert posted[("hash", 10)] == 2  # the replayed ingest appended nothing
    assert cat.get(idx.stats_table).collect()[0].n_docs == 3


def test_term_stats_exact_values_and_live_path(spark, tmp_path):
    """The posting-list skew report: df IS the term's posting-row count,
    share/skew are single IEEE divisions of exact integers, ties break
    on tok — hand-computed on a 3-doc corpus; and with tombstones
    outstanding the report re-aggregates df from the LIVE postings."""
    docs = spark.createDataFrame(
        [(1, "hash join tables"), (2, "hash scan"), (3, "join hash hash")],
        "doc_id bigint, text string",
    )
    cat = Catalog(spark, str(tmp_path / "twh"))
    idx = Bm25Index(cat, "t_s")
    idx.build(docs)
    got = [tuple(r) for r in idx.term_stats(top_n=3).orderBy("rank").collect()]
    # df: hash=3, join=2, scan=1, tables=1; total=7, n_terms=4
    assert got == [
        ("hash", 3, 3 / 7, 3 * 4 / 7, 1),
        ("join", 2, 2 / 7, 2 * 4 / 7, 2),
        ("scan", 1, 1 / 7, 1 * 4 / 7, 3),  # tok tiebreak: scan < tables
    ]
    # live path: deleting doc 3 drops hash to df=2 (ties with join on
    # df, tok tiebreak puts hash first), total=5, n_terms=4
    idx.delete([3])
    got2 = [tuple(r) for r in idx.term_stats(top_n=2).orderBy("rank").collect()]
    assert got2 == [
        ("hash", 2, 2 / 5, 2 * 4 / 5, 1),
        ("join", 1, 1 / 5, 1 * 4 / 5, 2),
    ]


def test_search_df_cap_prunes_hot_terms(spark, tmp_path):
    """Query-time stopword pruning (the lever maintain()'s
    stopword_pruning_recommended signal points at): a term with
    df > max_df_share·N contributes nothing, so the capped search equals
    the uncapped search with that term struck from every query list."""
    docs = spark.createDataFrame(
        [
            (1, "the hash join"),
            (2, "the hash"),
            (3, "the scan"),
            (4, "the merge"),
            (5, "rare scan"),
        ],
        "doc_id bigint, text string",
    )
    cat = Catalog(spark, str(tmp_path / "dcw"))
    idx = Bm25Index(cat, "d_c")
    idx.build(docs)
    # df: the=4/5 (0.8), hash=2/5, scan=2/5, rare=1/5 → cap 0.5 prunes 'the'
    q = [(1, ["the", "hash"]), (2, ["the", "scan", "rare"])]
    got = sorted(map(tuple, idx.search(q, k=5, max_df_share=0.5).collect()))
    want = sorted(
        map(
            tuple,
            idx.search([(1, ["hash"]), (2, ["scan", "rare"])], k=5).collect(),
        )
    )
    assert got == want and got


def test_search_df_cap_noop_and_all_pruned(spark, tmp_path):
    """Cap above every term's share is bit-identical to the uncapped
    search; cap below every share returns an EMPTY frame with the
    contract schema (inner-join semantics — a stopword-only query has
    no surviving terms to score)."""
    docs = spark.createDataFrame(
        [(1, "hash join"), (2, "hash scan")], "doc_id bigint, text string"
    )
    cat = Catalog(spark, str(tmp_path / "dnw"))
    idx = Bm25Index(cat, "d_n")
    idx.build(docs)
    q = [(1, ["hash", "join"])]
    assert sorted(map(tuple, idx.search(q, k=5, max_df_share=1.0).collect())) == sorted(
        map(tuple, idx.search(q, k=5).collect())
    )
    empty = idx.search(q, k=5, max_df_share=0.01)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "query_id", "doc_id", "score", "rank",
    ]


def test_search_df_cap_skips_hot_posting_scan(spark, tmp_path):
    """THE scale property of the capped path: the pruned term never
    reaches the postings scan's isin — its posting list (the
    stopword-class cost driver at 100 TB) is never read. The df table
    scan still carries the full term list (terms-sized, the frame the
    pruning decision reads)."""
    docs = spark.createDataFrame(
        [
            (1, "the hash"),
            (2, "the hash"),
            (3, "the scan"),
            (4, "the merge"),
        ],
        "doc_id bigint, text string",
    )
    cat = Catalog(spark, str(tmp_path / "dpw"))
    idx = Bm25Index(cat, "d_p")
    idx.build(docs)
    q = [(1, ["the", "hash"])]
    plan = (
        idx.search(q, k=5, max_df_share=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    post_scans = [
        l for l in plan.splitlines() if "FileScan" in l and "__postings" in l
    ]
    assert post_scans
    for line in post_scans:
        assert "the" not in line.split("PushedFilters")[-1], line
        assert "hash" in line, line


def test_search_df_cap_judged_on_live_stats_with_tombstones(spark, tmp_path):
    """With tombstones outstanding the cap is decided on LIVE df/N, not
    the stale stored tables: a term over the cap on stored statistics
    whose live share falls under it scores again — the capped live view
    stays bit-identical to a fresh build over the pruned corpus searched
    with the same cap."""
    docs = spark.createDataFrame(
        [
            (1, "hot hash"),
            (2, "hot hash"),
            (3, "hot scan"),
            (4, "hot merge"),
            (5, "scan merge"),
        ],
        "doc_id bigint, text string",
    )
    cat = Catalog(spark, str(tmp_path / "dlw"))
    idx = Bm25Index(cat, "d_l")
    idx.build(docs)
    q = [(1, ["hot", "hash"])]
    # stored: hot df=4/5 (0.8) > 0.75 → pruned on the steady-state path
    assert all(
        r.doc_id in (1, 2)
        for r in idx.search(q, k=5, max_df_share=0.75).collect()
    )
    # delete docs 3 and 4: live hot df=2, N=3 → share 0.67 ≤ 0.75
    idx.delete([3, 4])
    got = sorted(
        map(tuple, idx.search(q, k=5, max_df_share=0.75).collect())
    )
    ref = Bm25Index(Catalog(spark, str(tmp_path / "dlw_ref")), "d_lr")
    ref.build(docs.filter(~F.col("doc_id").isin(3, 4)))
    want = sorted(
        map(tuple, ref.search(q, k=5, max_df_share=0.75).collect())
    )
    assert got == want and got
    # and 'hot' genuinely contributes again: scores exceed the
    # hash-only ranking the pre-delete capped path would produce
    hash_only = sorted(
        map(tuple, idx.search([(1, ["hash"])], k=5).collect())
    )
    assert got != hash_only


def test_maintain_reports_hot_term_share(spark, tmp_path):
    """Hot-term mass is REPORT-ONLY (stopword pruning re-weights every
    score — a human decision, the reband_recommended precedent): the
    signal lands in the report, the action stays none."""
    docs = spark.createDataFrame(
        [(i, f"the the common word plus unique{i}") for i in range(6)],
        "doc_id bigint, text string",
    )
    cat = Catalog(spark, str(tmp_path / "hwh"))
    idx = Bm25Index(cat, "h_s")
    idx.build(docs)
    report = idx.maintain(hot_terms_n=4, max_hot_term_share=0.5)
    # top-4 by df: the/common/word/plus at df=6 each = 24 of 30 rows
    assert report["hot_term_share"] == 24 / 30
    assert report["stopword_pruning_recommended"] is True
    assert report["action"] == "none"  # never auto-fixed
    assert idx.maintain(hot_terms_n=4, max_hot_term_share=0.9)[
        "stopword_pruning_recommended"
    ] is False
