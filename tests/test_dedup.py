"""Behavioral tests for dedup operators on synthetic near-duplicates —
the oracle-parity suite proves cross-engine agreement; these prove the
algorithms actually *find* duplicates and respect their guards."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simple_map_reduce_spark.operators.dedup import (
    decontaminate_report,
    drop_exact_dups,
    exact_dedup,
    minhash_dup_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    simhash_dup_pairs,
)
from simple_map_reduce_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep dark forest to hide from every hunter"
)
NEAR = BASE.replace("dark", "misty")  # one-token edit → high jaccard
FAR = "completely different content about databases and distributed query engines at scale"


def _docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, FAR), (4, BASE)], ["doc_id", "text"]
    )


def test_exact_dedup_keeps_min_id(spark):
    out = {r["keep_id"]: r["dup_count"] for r in exact_dedup(_docs(spark), "text", "doc_id").collect()}
    assert out[1] == 2  # docs 1 and 4 identical; representative is min id
    kept = sorted(r["doc_id"] for r in drop_exact_dups(_docs(spark), "text", "doc_id").collect())
    assert kept == [1, 2, 3]


def test_shingles_short_doc_fallback(spark):
    df = spark.createDataFrame([(1, "just two")], ["doc_id", "text"])
    rows = shingles(df, "doc_id", "text", n=3).collect()
    assert [(r["id"], r["shingle"]) for r in rows] == [(1, "just two")]


def test_minhash_finds_near_dup_pair(spark):
    pairs = minhash_dup_pairs(
        _docs(spark).filter(F.col("doc_id") < 4), "doc_id", "text", threshold=0.5
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got  # one-token edit caught
    assert all(3 not in p for p in got)  # unrelated doc not paired


def test_simhash_near_dup_and_pigeonhole(spark):
    docs = _docs(spark).filter(F.col("doc_id") < 4)
    sigs = {r["id"]: r["simhash"] for r in simhash(docs, "doc_id", "text").collect()}
    ham12 = bin(sigs[1] ^ sigs[2]).count("1")
    ham13 = bin(sigs[1] ^ sigs[3]).count("1")
    assert ham12 < ham13  # near-dup closer than unrelated
    # banded pair search must agree with brute force at its max_hamming
    pairs = simhash_dup_pairs(docs, "doc_id", "text", max_hamming=max(ham12, 3))
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    if ham12 <= max(ham12, 3):
        assert got.get((1, 2)) == ham12


def test_jaccard_pairs_threshold(spark):
    out = ngram_jaccard_pairs(_docs(spark), "doc_id", "text", n=3, threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert (1, 4) in got and got[(1, 4)] == 1.0  # identical docs
    assert (1, 2) in got and 0.5 <= got[(1, 2)] < 1.0
    assert all(3 not in (a, b) for a, b in got)


def test_incremental_neardup_pairs_only_cross_side(spark):
    """The new batch pairs against the corpus; corpus-internal duplicates
    (1,4 identical) must NOT appear — that's the property that keeps
    per-ingest cost proportional to the batch, not the corpus."""
    from simple_map_reduce_spark.operators.dedup import incremental_neardup_pairs

    corpus = _docs(spark)  # 1=BASE, 2=NEAR, 3=FAR, 4=BASE (internal dup)
    new = spark.createDataFrame([(100, BASE), (101, "fresh unseen text")],
                                ["doc_id", "text"])
    pairs = incremental_neardup_pairs(
        new, corpus, "doc_id", "text", threshold=0.5
    ).collect()
    got = {(r["id_new"], r["id_corpus"]) for r in pairs}
    assert (100, 1) in got and (100, 4) in got  # batch doc matches both copies
    assert all(n in (100, 101) for n, _ in got)  # left side is always the batch
    assert (1, 4) not in got and (4, 1) not in got  # corpus never self-paired


def test_decontaminate_flags_leaked_doc_and_reports_clean(spark):
    # bench doc 100 is verbatim-leaked as train doc 1; bench doc 200 is
    # unrelated → flagged with max overlap / reported clean with zeros
    train = spark.createDataFrame([(1, BASE), (3, FAR)], ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100, BASE), (200, "nothing in common with any training text here")],
        ["doc_id", "text"],
    )
    out = {
        r["bench_id"]: (r["n_contaminated"], r["max_shared"])
        for r in decontaminate_report(train, bench, "doc_id", "text").collect()
    }
    n_shingles = shingles(bench.filter("doc_id = 100"), "doc_id", "text").count()
    assert out[100] == (1, n_shingles)  # the full shingle set overlaps
    assert out[200] == (0, 0)  # clean docs still get a row


def test_hot_shingle_guard_drops_buckets(spark):
    # every doc shares the hot shingle; cap of 2 must drop it entirely
    df = spark.createDataFrame(
        [(i, "common common common") for i in range(5)], ["doc_id", "text"]
    )
    out = ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.0, max_bucket=2)
    assert out.count() == 0


# ---------------------------------------------------------------------------
# NearDupIndex: catalog-backed incremental ingest
# ---------------------------------------------------------------------------


def _index_fixture(spark, tmp_path):
    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.dedup import NearDupIndex

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    cat = Catalog(spark, str(tmp_path / "warehouse"))
    idx = NearDupIndex(cat, "corpus", threshold=0.3)
    idx.build(corpus)
    return idx, cat, corpus, batch, docs


def test_neardup_index_matches_recompute_form(spark, tmp_path):
    """The catalog-backed check must return exactly the pairs the
    recompute-everything oracle form returns on the same split."""
    from simple_map_reduce_spark.operators.dedup import incremental_neardup_pairs

    idx, _, corpus, batch, _ = _index_fixture(spark, tmp_path)
    got = sorted(
        (r.id_new, r.id_corpus, round(r.jaccard, 9))
        for r in idx.check(batch).collect()
    )
    want = sorted(
        (r.id_new, r.id_corpus, round(r.jaccard, 9))
        for r in incremental_neardup_pairs(
            batch, corpus, "doc_id", "text", threshold=0.3
        ).collect()
    )
    assert got == want and got


def test_neardup_index_ingest_appends_accepted_only(spark, tmp_path):
    idx, cat, _, batch, _ = _index_fixture(spark, tmp_path)
    before = cat.get(idx.shingles_table).select("id").distinct().count()
    pairs = idx.ingest(batch)
    dup_ids = {r.id_new for r in pairs.select("id_new").distinct().collect()}
    batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    after_ids = {r.id for r in cat.get(idx.shingles_table).select("id").distinct().collect()}
    # accepted = batch minus dup matches; dups must NOT join the corpus
    assert after_ids.issuperset(batch_ids - dup_ids)
    assert not (after_ids & dup_ids)
    assert len(after_ids) == before + len(batch_ids - dup_ids)
    # re-checking an accepted doc under its OWN id is identity, not
    # duplication (replay safety — the self-pair filter): no self-match
    accepted_id = sorted(batch_ids - dup_ids)[0]
    own = batch.filter(F.col("doc_id") == accepted_id)
    redo = idx.check(own)
    assert not any(r.id_new == r.id_corpus for r in redo.collect())
    # ...but the same CONTENT under a fresh id still collides with the
    # corpus copy at jaccard 1.0
    clone = own.withColumn("doc_id", F.lit(10_000_000).cast("bigint"))
    redo2 = idx.check(clone)
    assert any(
        r.id_corpus == accepted_id and r.jaccard == 1.0 for r in redo2.collect()
    )


def test_neardup_index_never_retokenizes_corpus(spark, tmp_path):
    """THE precompute guarantee: a later ingest's plan reads the corpus
    as hashed-int parquet (catalog tables) — the documents source is
    scanned once, for the NEW batch only, and no corpus text ever meets
    the shingle tokenizer again."""
    idx, cat, _, batch, _ = _index_fixture(spark, tmp_path)
    plan = (
        idx.check(batch)._jdf.queryExecution().executedPlan().toString()
    )
    # a persisted frame renders its cached child plan once per consumer —
    # dedupe rendered lines from the "FileScan" token on
    scans = {
        l[l.index("FileScan"):] for l in plan.splitlines() if "FileScan" in l
    }
    import re

    doc_scans = [l for l in scans if "documents.parquet" in l]
    assert len(doc_scans) == 1, doc_scans   # the new batch, nothing else
    # catalog tables identified by their int columns (paths truncate in
    # the renderer): band buckets + hashed shingle sets both present
    assert any("band_hash" in l for l in scans), scans
    assert any(re.search(r"\[id#\d+L?,h#\d+L?\]", l) for l in scans), scans
    # the corpus side moves (id, h) ints: text appears ONLY in the
    # new-batch documents scan
    text_scans = [l for l in scans if "text" in l]
    assert text_scans == doc_scans, text_scans


def test_neardup_index_ingest_rejects_intra_batch_dups(spark, tmp_path):
    """A crawl batch carrying its own duplicates must not have them all
    admitted: only the min id of an intra-batch duplicate chain joins
    the index, and the report labels those rows matched_in='batch'."""
    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.dedup import NearDupIndex

    corpus = spark.createDataFrame(
        [(1, FAR)], "doc_id bigint, text string"
    )
    batch = spark.createDataFrame(
        [(10, BASE), (11, BASE), (12, NEAR)], "doc_id bigint, text string"
    )
    cat = Catalog(spark, str(tmp_path / "wh2"))
    idx = NearDupIndex(cat, "c", threshold=0.3)
    idx.build(corpus)
    pairs = idx.ingest(batch).collect()
    got = {(r.id_new, r.id_corpus, r.matched_in) for r in pairs}
    # 11 (exact dup of 10) and 12 (near dup) both reject against 10
    assert (11, 10, "batch") in got
    assert (12, 10, "batch") in got
    assert all(r.matched_in == "batch" for r in pairs)  # nothing matches corpus
    accepted = {r.id for r in cat.get(idx.shingles_table).select("id").distinct().collect()}
    assert accepted == {1, 10}
    # idempotency: re-ingesting the same batch appends nothing new
    idx.ingest(batch)
    again = {r.id for r in cat.get(idx.shingles_table).select("id").distinct().collect()}
    assert again == {1, 10}
    bk = cat.get(idx.buckets_table).groupBy("id", "band_idx").count().filter("count > 1").count()
    assert bk == 0  # no duplicated bucket rows either


def test_neardup_index_ingest_stream_matches_batch_mode(spark, tmp_path):
    """foreachBatch streaming ingest must leave the index in the same
    state sequential batch-mode ingests would — batches are crafted so
    the accepted set is order-independent (cross-file contents don't
    match each other)."""
    import pyspark.sql.functions as SF

    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.dedup import NearDupIndex

    # file A: intra-batch dup pair (10 survives); file B: fresh doc 20 +
    # corpus-dup 21
    import shutil

    src = tmp_path / "stream-src"
    src.mkdir()
    batches = [
        ("batch_a.parquet", [(10, BASE), (11, BASE)]),
        ("batch_b.parquet",
         [(20, "entirely novel content nothing shares these words"), (21, FAR)]),
        # CROSS-EPOCH: duplicate of 20, ADMITTED in the previous epoch —
        # catches cloned-session relation-cache staleness (each epoch
        # must see earlier epochs' appends through the catalog session)
        ("batch_c.parquet",
         [(30, "entirely novel content nothing shares these words")]),
    ]
    for fname, rows in batches:
        out = tmp_path / f"stage-{fname}"
        spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
            1
        ).write.parquet(str(out))
        part = next(p for p in out.iterdir() if p.name.endswith(".parquet"))
        shutil.move(str(part), str(src / fname))  # flat FILE, not a dir

    cat = Catalog(spark, str(tmp_path / "wh3"))
    idx = NearDupIndex(cat, "c", threshold=0.3)
    idx.build(spark.createDataFrame([(1, FAR)], "doc_id bigint, text string"))

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    idx.ingest_stream(stream, str(tmp_path / "ckpt"))

    accepted = {
        r.id for r in cat.get(idx.shingles_table).select("id").distinct().collect()
    }
    assert accepted == {1, 10, 20}
    reports = cat.get(idx.reports_table).collect()
    got = {(r.id_new, r.id_corpus, r.matched_in) for r in reports}
    assert (11, 10, "batch") in got        # intra-batch dup rejected
    assert (21, 1, "corpus") in got        # corpus dup rejected
    assert (30, 20, "corpus") in got       # cross-EPOCH dup rejected
    assert {r.epoch_id for r in reports} == {0, 1, 2}  # three micro-batches


def test_catalog_compact_preserves_data(spark, tmp_path):
    from simple_map_reduce_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh4"))
    df = spark.range(10_000).withColumnRenamed("id", "v")
    cat.put(df.repartition(20), "t")
    import os as _os

    path = str(tmp_path / "wh4" / "t")
    before_files = sum(1 for f in _os.listdir(path) if f.endswith(".parquet"))
    assert before_files == 20
    after_files = cat.compact("t")
    assert after_files < before_files
    got = sorted(r.v for r in cat.get("t").collect())
    assert got == list(range(10_000))


def _scan_ancestries(plan: str, table_token: str) -> list[list[str]]:
    """For every FileScan line containing ``table_token``, the chain of
    ancestor lines (nearest first) reconstructed from the plan-string
    tree indentation (a node's parent is the nearest preceding line with
    a smaller branch-marker offset)."""
    lines = plan.splitlines()

    def depth(line: str) -> int:
        return max(line.rfind("+- "), line.rfind(":- "))

    out = []
    for i, line in enumerate(lines):
        if "FileScan" in line and table_token in line:
            chain, d = [], depth(line)
            for j in range(i - 1, -1, -1):
                dj = depth(lines[j])
                if dj < d:
                    chain.append(lines[j])
                    d = dj
                if dj <= -1:
                    break
            out.append(chain)
    return out


def test_neardup_index_check_corpus_side_no_exchange(spark, tmp_path):
    """THE bucketed-storage guarantee (the 100 TB per-ingest cost): the
    corpus bucket/shingle tables are bucketed on exactly their join key
    tuples, so check()'s plan consumes them with NO Exchange between the
    scan and the first join/aggregate — only the new batch shuffles.
    Broadcast is disabled so the guard pins the sort-merge (big-batch)
    path, not a broadcast degenerate case."""
    idx, _, _, batch, _ = _index_fixture(spark, tmp_path)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = idx.check(batch)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    for token in ("__buckets", "__shingles"):
        chains = _scan_ancestries(plan, token)
        assert chains, f"no {token} scan found in plan"
        scans = [l for l in plan.splitlines() if "FileScan" in l and token in l]
        assert all("Bucketed: true" in l for l in scans), scans
        for chain in chains:
            joined = next(
                (k for k, l in enumerate(chain)
                 if "SortMergeJoin" in l or "HashAggregate" in l),
                len(chain),
            )
            shuffled = next(
                (k for k, l in enumerate(chain) if "Exchange" in l), len(chain)
            )
            assert joined < shuffled, (
                f"Exchange above the {token} scan before its consumer:\n"
                + "\n".join(chain[: shuffled + 1])
            )


def test_neardup_index_stream_marks_clean_epochs(spark, tmp_path):
    """A micro-batch with ZERO duplicate pairs appends no report rows, so
    report rows cannot be the replay commit marker — the epochs table
    must record every processed epoch, clean ones included."""
    import shutil

    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.dedup import NearDupIndex

    src = tmp_path / "stream-src2"
    src.mkdir()
    batches = [
        ("a.parquet", [(10, BASE)]),                      # dup of corpus
        ("b.parquet", [(20, "wholly novel words that match nothing else")]),
    ]
    for fname, rows in batches:
        out = tmp_path / f"stage2-{fname}"
        spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
            1
        ).write.parquet(str(out))
        part = next(p for p in out.iterdir() if p.name.endswith(".parquet"))
        shutil.move(str(part), str(src / fname))

    cat = Catalog(spark, str(tmp_path / "wh5"))
    idx = NearDupIndex(cat, "cleanix", threshold=0.3)
    idx.build(spark.createDataFrame([(1, BASE)], "doc_id bigint, text string"))
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    idx.ingest_stream(stream, str(tmp_path / "ckpt2"))
    marked = {r.epoch_id for r in cat.get(idx.epochs_table).collect()}
    assert marked == {0, 1}  # BOTH epochs committed, the clean one too
    reported = {r.epoch_id for r in cat.get(idx.reports_table).collect()}
    assert len(reported) == 1  # only the duplicate-bearing batch reported


def test_neardup_index_stream_replay_after_report_before_marker(spark, tmp_path):
    """Crash window between the report append and the marker write: the
    replayed epoch must finish the commit (write the marker) WITHOUT
    re-running the ingest — a re-run would duplicate the epoch's report
    rows, and with the batch already in the corpus the re-derived rows
    would even differ (intra-batch pairs re-detect as corpus matches)."""
    import shutil

    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.dedup import NearDupIndex

    cat = Catalog(spark, str(tmp_path / "wh6"))
    idx = NearDupIndex(cat, "replayix", threshold=0.3)
    idx.build(spark.createDataFrame([(1, BASE)], "doc_id bigint, text string"))

    batch_rows = [(10, BASE), (11, "wholly novel words that match nothing")]
    batch = spark.createDataFrame(batch_rows, "doc_id bigint, text string")
    # replicate _ingest_batch up to (and including) the report append for
    # epoch 0, then "crash" before the marker write
    report = idx.ingest(batch).withColumn(
        "epoch_id", F.lit(0).cast("bigint")
    )
    cat.put(report, idx.reports_table)
    pre_report = sorted(map(tuple, cat.get(idx.reports_table).collect()))
    assert pre_report  # the dup-bearing batch produced report rows

    src = tmp_path / "stream-src3"
    src.mkdir()
    out = tmp_path / "stage3-a"
    batch.coalesce(1).write.parquet(str(out))
    part = next(p for p in out.iterdir() if p.name.endswith(".parquet"))
    shutil.move(str(part), str(src / "a.parquet"))
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(str(src))
    idx.ingest_stream(stream, str(tmp_path / "ckpt3"))  # replays epoch 0

    post_report = sorted(map(tuple, cat.get(idx.reports_table).collect()))
    assert post_report == pre_report  # no duplicated / mutated rows
    assert {r.epoch_id for r in cat.get(idx.epochs_table).collect()} == {0}


def test_neardup_index_compact_preserves_check_results(spark, tmp_path):
    """Index compaction shrinks the per-epoch file sets without changing
    any check() answer or losing the bucketed no-Exchange layout."""
    import os

    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.dedup import NearDupIndex

    cat = Catalog(spark, str(tmp_path / "cwh"))
    idx = NearDupIndex(cat, "cmp", threshold=0.3, num_buckets=2)
    idx.build(spark.createDataFrame([(1, FAR)], "doc_id bigint, text string"))
    for i, text in (
        (10, BASE),
        (20, "entirely novel content nothing shares these words"),
        (30, "yet another disjoint document about streaming watermark state"),
        (40, "fourth unique text mentioning vector quantization centroids"),
    ):
        idx.ingest(spark.createDataFrame([(i, text)], "doc_id bigint, text string"))
    probe = spark.createDataFrame([(99, FAR)], "doc_id bigint, text string")
    before = sorted(map(tuple, idx.check(probe).collect()))
    files_before = sum(
        1 for f in os.listdir(tmp_path / "cwh" / idx.buckets_table)
        if f.endswith(".parquet")
    )
    counts = idx.compact()
    assert set(counts) == {idx.buckets_table, idx.sizes_table, idx.shingles_table}
    assert counts[idx.buckets_table] < files_before
    assert sorted(map(tuple, idx.check(probe).collect())) == before


def test_neardup_index_ingest_empty_batch_is_noop(spark, tmp_path):
    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.dedup import NearDupIndex

    cat = Catalog(spark, str(tmp_path / "ewh"))
    idx = NearDupIndex(cat, "e", threshold=0.3)
    idx.build(spark.createDataFrame([(1, FAR)], "doc_id bigint, text string"))
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert idx.ingest(empty).count() == 0
    ids = {r.id for r in cat.get(idx.shingles_table).select("id").distinct().collect()}
    assert ids == {1}


def test_neardup_ingest_rerun_reproduces_original_report(spark, tmp_path):
    """Streaming protocol point 4 (ADVICE r6), lexical twin of the
    IvfIndex re-run test: replaying a full ingest after its accepted
    docs already reached the corpus tables re-derives the ORIGINAL
    report — the intra-batch pair stays matched_in='batch' instead of
    re-detecting as a corpus match against the replayed sibling."""
    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.dedup import NearDupIndex

    cat = Catalog(spark, str(tmp_path / "rrwh2"))
    idx = NearDupIndex(cat, "rr", threshold=0.3)
    idx.build(spark.createDataFrame([(1, FAR)], "doc_id bigint, text string"))
    batch = spark.createDataFrame(
        [(10, BASE), (11, BASE),   # intra-batch dup pair (10 survives)
         (12, FAR)],               # corpus dup of 1
        "doc_id bigint, text string",
    )
    first = sorted(map(tuple, idx.ingest(batch).collect()))
    second = sorted(map(tuple, idx.ingest(batch).collect()))
    assert second == first
    assert {r.matched_in for r in idx.ingest(batch).collect()} == {"corpus", "batch"}


def test_neardup_bucket_stats_reports_cap_exclusions(spark, tmp_path):
    """bucket_stats must count the hot buckets the query-time cap
    excludes: with max_bucket=1, a 3-doc identical-text corpus puts all
    three in one bucket per band → every band reports n_over_cap=1 and
    capped_rows=3; a diverse corpus with a high cap reports zero."""
    from simple_map_reduce_spark.catalog import Catalog
    from simple_map_reduce_spark.operators.dedup import NearDupIndex

    cat = Catalog(spark, str(tmp_path / "bswh"))
    idx = NearDupIndex(cat, "bs", threshold=0.3, max_bucket=1)
    idx.build(
        spark.createDataFrame(
            [(1, BASE), (2, BASE), (3, BASE)], "doc_id bigint, text string"
        )
    )
    rows = idx.bucket_stats().collect()
    assert rows and all(r.n_rows == 3 for r in rows)
    assert all(r.max_bucket == 3 and r.n_over_cap == 1 for r in rows)
    assert all(r.capped_rows == 3 for r in rows)

    idx2 = NearDupIndex(cat, "bs2", threshold=0.3, max_bucket=1000)
    idx2.build(
        spark.createDataFrame(
            [(1, BASE), (2, FAR)], "doc_id bigint, text string"
        )
    )
    rows2 = idx2.bucket_stats().collect()
    assert all(r.n_over_cap == 0 and r.capped_rows == 0 for r in rows2)


def test_keep_best_exemplars_policy(spark):
    """Quality-aware cluster resolution: the cluster keeps its highest-
    scoring member (NOT the min id), score ties break to the min id,
    singletons keep themselves."""
    from simple_map_reduce_spark.operators.dedup import keep_best_exemplars
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, 5),   # cluster {1,2,3}: doc 2 longest -> kept
            (2, 9),
            (3, 5),
            (10, 4),  # cluster {10, 11}: tie -> min id 10 kept
            (11, 4),
            (99, 1),  # singleton keeps itself
        ],
        "doc_id bigint, n_tokens bigint",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    got = {
        r.doc_id: (r.group_id, r.score, r.kept_id, r.kept)
        for r in keep_best_exemplars(docs, pairs, F.col("n_tokens")).collect()
    }
    assert got == {
        1: (1, 5, 2, 0),
        2: (1, 9, 2, 1),
        3: (1, 5, 2, 0),
        10: (10, 4, 10, 1),
        11: (10, 4, 10, 0),
        99: (99, 1, 99, 1),
    }
