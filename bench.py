#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion through a no-op DSv2 sink
(``df.write.format("noop")``): unlike ``count()``, the sink consumes every
output column, so ColumnPruning cannot delete the computed projections of
map-only queries — the timing measures the transform, not just the scan.
Each query gets one
unmeasured warmup execution first (JVM JIT + whole-stage-codegen compile +
parquet footer reads are one-time costs a long-lived cluster never pays
per query), then the measured run. Spark's CacheManager matches persisted
plans by canonical form, so operator-internal persists from the warmup
WOULD be visible to the measured run — `clearCache()` between the two
keeps the measured execution honest (it re-does all real work, including
populating its own persists).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from simple_map_reduce_spark.cache import release_tracked
from simple_map_reduce_spark.queries import QUERIES
from simple_map_reduce_spark.session import get_session

BENCH_QUERIES = [
    "regex_filter",
    "column_filter",
    "equi_join",
    "wordcount",
    "filter_group_pct",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "topk_customers",
    "window_running",
    "events_windowed",
    "dedup_exact",
    "minhash_dup_pairs",
    "simhash_sigs",
    "jaccard_pairs",
    "similarity_topk",
    "similarity_topk_ivf",
    "text_stats",
    "token_counts",
    "q5_regional_revenue",
    "sales_rollup",
    "stats_summary",
    "events_json",
    "asof_last_order",
    "deterministic_sample",
    "sessionize_batch",
    "purchase_click_burst",
    "sales_cube",
    "left_join_order_counts",
    "qty_outliers",
    "customer_order_seq",
    "simhash_dup_pairs",
    # the LSH tier, NOT the exact quadratic oracle tier: a benchmark
    # headline must be a query you'd actually run at 100 TB
    "embedding_neardup_lsh",
    "tfidf_terms",
    "fuzzy_part_names",
    "audio_features",
    "cheapest_item_per_order",
    "cohort_retention",
    "forecast_revenue",
    "nation_trade_volume",
    "order_count_histogram",
    "dominant_suppliers",
    "waiting_suppliers",
]

# LLM-pipeline headliners added after the round-1 baseline was recorded.
# Timed identically but totalled SEPARATELY ("extended_total"), so
# "value" stays the like-for-like 42-query baseline comparison and the
# dedup/packing tier still carries bench history.
EXTENDED_QUERIES = [
    "decontaminate",
    "incremental_neardup",
    # the sharded tier is the 100 TB packing form; the single-window
    # chunk_assignment is its oracle twin
    "chunk_assignment_sharded",
    "chunk_assignment",
    "redact_pii",
    "repetition_signals",
    "mixture_weights",
    "embedding_quantize",
    "corpus_splits",
    "span_dedup",
    "corpus_shuffle",
    "bpe_pair_counts",
    "vocab_encode",
    "dedup_prune",
    "quality_filter",
    "pretraining_manifest",
    "source_overlap",
    "label_confusion",
    "ivf_refined_centroids",
    "ivf_refined_topk",
    # r5: iterative BPE training + the catalog-backed (bucketed-index)
    # incremental dedup path
    "bpe_train",
    "bpe_word_segments",
    "incremental_neardup_idx",
    "similarity_topk_ivf_idx",
    "bm25_topk",
    # r5: cluster-then-prune semantic dedup + the pipeline composing it
    # + the index-backed incremental semantic check
    "semdedup_prune",
    "pretraining_manifest_sem",
    "embedding_neardup_idx",
    # r6: hybrid retrieval / LM-quality / chunking / curriculum tier
    "rrf_fusion",
    "hard_negatives",
    "bigram_lm_quality",
    "perplexity_prune",
    "doc_chunks",
    "mixture_temperature",
    "curriculum_order",
    "length_histogram",
    "semantic_ingest",
    # r7: chunk-level ANN retrieval (index rebuild included, like
    # semantic_ingest), the LM-pruned manifest, and the streaming form
    # of the semantic admission gate (two-epoch drain, build included)
    "chunk_ann_topk",
    "pretraining_manifest_lm",
    "streaming_semantic_ingest",
    "chunk_hybrid_topk",
    "pretraining_manifest_full",
    "ivf_cluster_skew",
    "lsh_bucket_skew",
    "chunk_semantic_ingest",
    # the CMS LM prices the broadcast-model scale path against the
    # exact tier's vocab-sized shuffle join (bigram_lm_quality above)
    "bigram_lm_quality_sketch",
    # r8: standing-index READ-path rows — the warmup builds the index
    # once per process, the measured reps price the serving path alone
    # (VERDICT r7 item 3: rebuild-priced rows swing 2-4x on identical
    # code; these are the round-over-round comparable numbers)
    "similarity_topk_ivf_read",
    "embedding_neardup_read",
    "incremental_neardup_read",
    "chunk_ann_topk_read",
    "bm25_topk_read",
    "chunk_hybrid_topk_read",
    # r8: incremental inverted-index maintenance (build + ingest + read)
    "bm25_ingest_topk",
    # r8: takedown journeys (build + O(|deleted|) tombstone + read)
    "ivf_delete_search",
    "neardup_delete_check",
    # r9: BM25 takedown (live-stats read path) + the streaming
    # inverted-index drain, and the de-noised maintenance-signal read
    # row over the standing memoized index
    "bm25_delete_topk",
    "bm25_stream_ingest",
    "ivf_cluster_skew_read",
    "bm25_term_stats",
    "bm25_topk_pruned",
    "dedup_keep_best",
    "neardup_keep_best",
    "semantic_keep_best",
    # r10: snapshot-isolated streaming keep-best (two-epoch drain,
    # build + pins + challenge + tombstones included) and the grand
    # manifest composed WITH quality-aware dedup
    "streaming_keep_best",
    "streaming_semantic_keep_best",
    "pretraining_manifest_kb",
    # r10: the √N capacity-sized quantizer (the scale path; its fixed-K
    # sibling embedding_neardup_idx is the parity tier)
    "embedding_neardup_capacity",
    # r10: quality-aware batch SemDeDup — the keep-best family's batch
    # semantic tier (same join shape as semdedup_prune + one struct-max)
    "semdedup_keep_best",
    # r11: MMR diversity rerank — corpus priced once by the pool
    # retrieval, then k unrolled queries x pool JVM stages
    "mmr_rerank",
]


def _await_idle_window() -> float:
    """Block until the host looks idle, or the wait budget runs out —
    the fix for three consecutive contaminated driver records: timings
    taken at loadavg 7+ measure the co-tenant load, not this code, so
    WAITING for the window beats annotating a junk record after the
    fact. Controlled by SPARK_GRAFT_BENCH_IDLE_WAIT_SEC (default 900;
    0 disables). Returns the seconds actually waited."""
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_WAIT_SEC", "900"))
    threshold = max(2.0, (os.cpu_count() or 1) / 5)
    waited = 0.0
    # gate on BOTH the 1- and 5-minute averages: a just-drained load
    # (test suite finished a minute ago) reads 1-min ≈ 0 while the
    # caches/scheduler are still churning — a window like that measured
    # a broad 1.28x inflation on untouched queries (r8, discarded)
    while waited < budget and max(os.getloadavg()[:2]) > threshold:
        time.sleep(30)
        waited += 30
    return waited


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    idle_waited = _await_idle_window()
    spark = get_session(app_name="smr-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df) -> None:
        """Materialize every output column (pruning-proof forcing)."""
        df.write.format("noop").mode("overwrite").save()

    # min over N measured reps (after the warmup): a transient CPU spike
    # from a co-tenant process inflates one rep, not all of them
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    load_start = os.getloadavg()

    timings: dict[str, float] = {}
    ext_timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in BENCH_QUERIES + EXTENDED_QUERIES:
        try:
            force(QUERIES[name](spark, sf_dir))  # unmeasured warmup
        except Exception:
            pass  # the measured run below records the failure
        release_tracked()
        spark.catalog.clearCache()
        best = None
        for _ in range(reps):
            start = time.perf_counter()
            try:
                force(QUERIES[name](spark, sf_dir))
                took = time.perf_counter() - start
                best = took if best is None else min(best, took)
            except Exception as exc:  # one bad query must not void the record
                errors[name] = str(exc).split("\n")[0][:200]
                # a query lands in exactly ONE of timings/errors: a rep-1
                # success followed by a rep-2 failure is an error record,
                # not a timing
                best = None
                break
            release_tracked()  # drop operator-internal caches between reps
            spark.catalog.clearCache()
        if best is not None:
            (timings if name in BENCH_QUERIES else ext_timings)[name] = round(best, 4)
        release_tracked()

    total = round(sum(timings.values()), 4)
    # The record is COMPACT (3dp per-query floats, tight separators,
    # 1-min loadavg bookends only) and printed as the ABSOLUTE LAST
    # stdout line, after spark.stop(): the r11 round-over-round
    # comparison broke because the previous round's ~3.5 KB record was
    # head-truncated in a bounded stdout tail capture — a record that
    # ends the stream and carries no dead bytes is the defense (r12;
    # no timing or methodology change, and no queries-map entry is
    # removed or renamed).
    record = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "extended_queries": {k: round(v, 3) for k, v in ext_timings.items()},
        "extended_total": round(sum(ext_timings.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # 1-min system load at start and end: a contaminated record
        # (bench run while the machine was busy) is self-evident
        "load": [round(load_start[0], 2), round(os.getloadavg()[0], 2)],
        # an honest record self-flags: timings taken while the machine was
        # already busy measure the co-tenant load, not this code (round 4's
        # driver record started at loadavg 8 and read as a regression while
        # the idle record showed a 15% improvement)
        "contaminated": load_start[0] > max(2.0, (os.cpu_count() or 1) / 5),
        "reps": reps,
    }
    if idle_waited:
        # seconds spent waiting for an idle window before starting (the
        # r7 verdict's "schedule it inside an idle window"); omitted
        # when zero — every byte before the final newline is at risk in
        # a bounded tail capture
        record["idle_waited_sec"] = idle_waited
    if errors:
        record["errors"] = errors
    try:
        spark.stop()
    except Exception:
        pass  # the record must still print
    sys.stdout.flush()
    print(json.dumps(record, separators=(",", ":")))
    sys.stdout.flush()
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
