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


def test_suite_shares_one_pair_set(spark):
    """The suite form: quality filter once, MinHash pair set once
    (persisted), then prune summary, overlap matrix, AND the manifest all
    consume the SAME frame — results identical to each consumer's
    self-contained form. That the injected frame really IS the pair set
    used (no internal recompute) is proven functionally: an EMPTY pairs
    frame must yield zero pruning / an empty matrix even though the
    corpus demonstrably contains near-duplicates."""
    from simple_map_reduce_spark.operators.dedup import minhash_dup_pairs
    from simple_map_reduce_spark.pipelines import (
        neardup_prune_summary,
        pretraining_manifest,
        quality_kept_docs,
        source_overlap_matrix,
    )
    from simple_map_reduce_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    kept = quality_kept_docs(docs)
    pairs = minhash_dup_pairs(kept, "doc_id", "text", threshold=0.3).persist()
    try:
        shared = {
            "prune": neardup_prune_summary(kept, pairs=pairs, threshold=0.3),
            "manifest": pretraining_manifest(
                docs, splits, neardup_threshold=0.3, span=100, pairs=pairs
            ),
        }
        solo = {
            "prune": neardup_prune_summary(kept, threshold=0.3),
            "manifest": pretraining_manifest(
                docs, splits, neardup_threshold=0.3, span=100
            ),
        }
        for key in shared:
            got = sorted(map(tuple, shared[key].collect()))
            want = sorted(map(tuple, solo[key].collect()))
            assert got == want, key
        # overlap needs the source column: run it over the full corpus
        # with full-corpus pairs (its own suite), same sharing contract
        full_pairs = minhash_dup_pairs(docs, "doc_id", "text", threshold=0.3).persist()
        try:
            got = sorted(map(tuple,
                source_overlap_matrix(docs, pairs=full_pairs).collect()))
            want = sorted(map(tuple,
                source_overlap_matrix(docs, threshold=0.3).collect()))
            assert got == want
        finally:
            full_pairs.unpersist()
    finally:
        pairs.unpersist()
    # --- injection proof: consumers must use EXACTLY the given pairs ---
    empty = spark.createDataFrame([], "id_a bigint, id_b bigint, jaccard double")
    pr = neardup_prune_summary(kept, pairs=empty).collect()
    assert all(r.n_dropped == 0 and r.n_kept == r.n_total for r in pr)
    assert source_overlap_matrix(docs, pairs=empty).count() == 0
    man_all = pretraining_manifest(docs, splits, span=100, pairs=empty)
    assert man_all.count() == kept.count()  # nothing pruned
    # ...while the self-contained forms DO find and drop duplicates
    assert any(r.n_dropped > 0 for r in neardup_prune_summary(kept, threshold=0.3).collect())


def test_sem_manifest_is_base_minus_semantic_prunes(spark):
    """The semantic-stage manifest contains exactly the base (lexical)
    manifest's documents minus SemDeDup's pruned ids over the survivor-
    restricted embedding set — the composition adds the one stage and
    changes nothing else."""
    from simple_map_reduce_spark.operators.similarity import semdedup_prune
    from simple_map_reduce_spark.queries import QUERIES
    from simple_map_reduce_spark.queries_ext import (
        SEMDEDUP_ITERS,
        SEMDEDUP_K,
        SEMDEDUP_TAU,
    )
    from simple_map_reduce_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    base_ids = {
        r.doc_id
        for r in QUERIES["pretraining_manifest"](spark, SF_SMOKE)
        .select("doc_id")
        .collect()
    }
    sem_ids = {
        r.doc_id
        for r in QUERIES["pretraining_manifest_sem"](spark, SF_SMOKE)
        .select("doc_id")
        .collect()
    }
    assert sem_ids <= base_ids
    emb = load_table(spark, SF_SMOKE, "embeddings")
    surv_emb = emb.filter(F.col("vec_id").isin(list(base_ids)))
    pruned = {
        r.vec_id
        for r in semdedup_prune(
            surv_emb,
            n_centroids=SEMDEDUP_K,
            iters=SEMDEDUP_ITERS,
            tau=SEMDEDUP_TAU,
        ).collect()
    }
    assert base_ids - sem_ids == pruned


def test_lm_manifest_prunes_the_unfluent_half_per_language(spark):
    """pretraining_manifest_lm = the base pipeline over exactly the
    LM-fluent subset of the quality-kept corpus: its doc set must equal
    perplexity_keep_ids over quality_kept_docs minus the lexical-dedup
    losers, and per language the fluent set is ~half the scored docs
    (median-value threshold, ties kept)."""
    from simple_map_reduce_spark.operators.lm import perplexity_keep_ids
    from simple_map_reduce_spark.pipelines import quality_kept_docs
    from simple_map_reduce_spark.queries import QUERIES
    from simple_map_reduce_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    kept = quality_kept_docs(docs)
    fluent_ids = {r.doc_id for r in perplexity_keep_ids(kept).collect()}
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert fluent_ids and fluent_ids < kept_ids  # a real prune happened

    lm_ids = {
        r.doc_id
        for r in QUERIES["pretraining_manifest_lm"](spark, SF_SMOKE)
        .select("doc_id")
        .collect()
    }
    # every manifest doc is fluent; the delta vs fluent_ids is the
    # lexical near-dup prune inside the inner pipeline
    assert lm_ids <= fluent_ids
    base_ids = {
        r.doc_id
        for r in QUERIES["pretraining_manifest"](spark, SF_SMOKE)
        .select("doc_id")
        .collect()
    }
    # the LM stage only ever removes documents relative to the base
    # pipeline's INPUT; survivors of the composed pipeline are fluent
    # members of the quality-kept corpus (dedup reps can differ when a
    # cluster's min id was pruned, so no subset claim vs base_ids)
    assert lm_ids
    assert len(lm_ids) < len(base_ids)


def test_full_manifest_composes_all_prune_stages(spark):
    """pretraining_manifest_full = quality → decon → LM → dedup → sem:
    its doc set must be contained in the LM-pruned fluent set minus the
    contaminated ids, every surviving doc is a train-split member, and
    the decon stage genuinely removed documents at smoke scale."""
    from pyspark.sql import functions as SF

    from simple_map_reduce_spark.operators.dedup import contaminated_train_ids
    from simple_map_reduce_spark.operators.lm import perplexity_keep_ids
    from simple_map_reduce_spark.pipelines import quality_kept_docs
    from simple_map_reduce_spark.queries import QUERIES
    from simple_map_reduce_spark.queries_ext import DECON_MOD
    from simple_map_reduce_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    bench = docs.filter(SF.col("doc_id") % DECON_MOD == 0)
    train = docs.filter(SF.col("doc_id") % DECON_MOD != 0)
    kept = quality_kept_docs(train)
    contaminated = {
        r.doc_id for r in contaminated_train_ids(kept, bench, "doc_id", "text").collect()
    }
    assert contaminated, "smoke data must exercise the decon stage"
    clean = kept.join(
        kept.sparkSession.createDataFrame(
            [(i,) for i in contaminated], "doc_id bigint"
        ),
        "doc_id",
        "anti",
    )
    fluent_ids = {r.doc_id for r in perplexity_keep_ids(clean).collect()}
    full_ids = {
        r.doc_id
        for r in QUERIES["pretraining_manifest_full"](spark, SF_SMOKE)
        .select("doc_id")
        .collect()
    }
    assert full_ids
    assert full_ids <= fluent_ids            # dedup/sem only ever remove
    assert not (full_ids & contaminated)     # nothing contaminated trains
    assert all(d % DECON_MOD != 0 for d in full_ids)  # bench never trains
