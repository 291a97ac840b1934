"""Physical-plan regression guards: the scale properties we rely on must
stay in the plan — filter pushdown, column pruning, broadcast joins for
dim tables, TakeOrderedAndProject for top-k (never a global sort)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # pruned scan: never reads l_orderkey/l_partkey/l_suppkey
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    assert "l_partkey" not in scan and "l_suppkey" not in scan


def test_q3_filters_reach_all_scans(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert plan.count("PushedFilters: [Is") >= 3 or plan.count("DataFilters") >= 3
    assert "TakeOrderedAndProject" in plan  # top-k is not a global sort
    assert "SortMergeJoin" not in plan or "BroadcastHashJoin" in plan


def test_topk_uses_broadcast_and_takeordered(spark):
    plan = _plan(spark, "topk_customers")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_regex_filter_is_scan_local(spark):
    """The filter evaluates at the scan: no shuffle anywhere in the plan."""
    plan = _plan(spark, "regex_filter")
    assert "Exchange" not in plan


def test_wordcount_has_partial_aggregation(spark):
    """Map-side combine (the reference's in-dict combiner A1) must appear:
    a HashAggregate below the shuffle and one above."""
    plan = _plan(spark, "wordcount")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning(word" in plan


def test_range_join_is_keyed_not_nested_loop(spark):
    """The range join must plan as an equi-join on the key (shuffle or
    broadcast hash) with the range predicate as a post-join condition —
    never a BroadcastNestedLoopJoin/CartesianProduct, which is the
    |L|x|R| death plan at scale."""
    plan = _plan(spark, "purchase_click_burst")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_sessionize_single_shuffle_for_windows_and_agg(spark):
    """Sessionization = one hash-partitioning exchange on the session key;
    the lag window, running sum, and session aggregate all reuse that
    partitioning (no second shuffle of the event stream)."""
    plan = _plan(spark, "sessionize_batch")
    assert plan.count("Exchange hashpartitioning(user_id") <= 1


def test_left_join_aggregate_partial(spark):
    plan = _plan(spark, "left_join_order_counts")
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_cube_expands_without_extra_shuffles(spark):
    plan = _plan(spark, "sales_cube")
    assert "Expand" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final over the expand


def test_fuzzy_join_is_variant_hash_join_not_cartesian(spark):
    """FastSS blocking must plan as an equi-join on the variant string —
    never a cartesian product over the name sets."""
    plan = _plan(spark, "fuzzy_part_names")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_tfidf_partial_aggregation_and_broadcast_n(spark):
    """tf groupBy must map-side combine over the token explode; the
    single-row corpus count joins in as a broadcast (never a shuffle)."""
    plan = _plan(spark, "tfidf_terms")
    assert plan.count("HashAggregate") >= 2
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_cheapest_item_single_shuffle_window(spark):
    """Greatest-n-per-group: exactly one hash exchange on the group key;
    the row_number window sorts within partitions (no global sort)."""
    plan = _plan(spark, "cheapest_item_per_order")
    assert plan.count("Exchange hashpartitioning(l_orderkey") == 1
    # Spark 4 prunes to the per-group top row BEFORE the shuffle (partial
    # WindowGroupLimit) — shuffle volume is O(groups), not O(rows)
    assert "WindowGroupLimit" in plan
    assert "Exchange rangepartitioning" not in plan  # would mean a global sort


def test_disjunctive_revenue_broadcasts_part(spark):
    """q19 shape: the part side must broadcast — lineitem is never
    shuffled for this join."""
    plan = _plan(spark, "disjunctive_revenue")
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning(l_partkey" not in plan


def test_cosine_topk_corpus_never_shuffles(spark):
    """Exact similarity tier: queries broadcast; the corpus side must not
    hash-shuffle (only the tiny post-score window repartitions)."""
    plan = _plan(spark, "similarity_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # no exchange keyed on the corpus id column
    assert "Exchange hashpartitioning(neighbor_id" not in plan.split("Window")[0]


def test_cosine_topk_two_stage_window_limit(spark):
    """The rank ≤ k filter must plan as a two-stage top-k: a PARTIAL
    WindowGroupLimit below the query_id exchange prunes each map
    partition to its local top-k, so no task ever sorts a query's full
    scored corpus (shuffle carries ≤ k rows per query per partition)."""
    plan = _plan(spark, "similarity_topk")
    partial = [l for l in plan.splitlines() if "WindowGroupLimit" in l and "Partial" in l]
    final = [l for l in plan.splitlines() if "WindowGroupLimit" in l and "Final" in l]
    assert partial, "partial (pre-shuffle) WindowGroupLimit missing"
    assert final, "final WindowGroupLimit missing"
    # the partial stage sits BELOW the query_id exchange
    ex = plan.index("Exchange hashpartitioning(query_id")
    assert plan.index(partial[0].strip()) > ex, "partial stage must be below the exchange"


def test_forecast_revenue_fully_pushed_scan(spark):
    """q6 shape: every predicate reaches the parquet scan (row-group
    pruning at scale) and there is no join — the only exchange is the
    single-row partial-agg merge."""
    plan = _plan(spark, "forecast_revenue")
    pushed = plan.split("PushedFilters")[1][:300]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2 or "SortAggregate" in plan


def test_nation_trade_volume_dims_broadcast(spark):
    """q7 shape: supplier + both nation aliases broadcast — the fact side
    only shuffles for the orders/customer equi-joins."""
    plan = _plan(spark, "nation_trade_volume")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "Exchange hashpartitioning(l_suppkey" not in plan
    assert "Exchange hashpartitioning(s_nationkey" not in plan


def test_profit_rollup_part_filter_below_broadcast(spark):
    """q9 shape: the 'bolt' predicate must apply on the part side BEFORE
    it broadcasts (broadcast carries the filtered slice), and lineitem
    must not hash-shuffle for any of the three dim joins."""
    plan = _plan(spark, "profit_by_nation_year")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "Exchange hashpartitioning(l_partkey" not in plan
    assert "Exchange hashpartitioning(l_suppkey" not in plan
    # p_name filter sits below the broadcast exchange
    bcast_sections = plan.split("BroadcastExchange")
    assert any("bolt" in s for s in bcast_sections[1:]) or "bolt" in plan.split("PushedFilters")[1][:400]


def test_order_histogram_two_level_aggregation(spark):
    """q13 shape: both aggregation levels map-side combine; the orders
    priority filter reaches the scan so the outer join carries only the
    non-urgent slice."""
    plan = _plan(spark, "order_count_histogram")
    assert plan.count("HashAggregate") >= 3
    assert "o_orderpriority" in plan.split("PushedFilters")[1][:400] or "DataFilters" in plan


def test_top_supplier_scalar_max_stays_lazy(spark):
    """q15 shape: the 1-row max joins back via broadcast (no driver
    collect, no cartesian of real data) and supplier joins broadcast."""
    plan = _plan(spark, "top_supplier")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan or plan.count("BroadcastExchange") >= 2


def test_top_supplier_single_fact_pass(spark):
    """q15 shape: per-supplier revenue is persisted — the scalar max and
    the equality filter both read the cached intermediate, so lineitem is
    scanned and aggregated once."""
    plan = _plan(spark, "top_supplier")
    assert plan.count("InMemoryTableScan") >= 2


def test_supplier_variety_distinct_via_expand(spark):
    """q16 shape: part filters below the broadcast; the distinct count
    plans with map-side dedup (partial aggregate under the shuffle)."""
    plan = _plan(spark, "supplier_variety")
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning(l_partkey" not in plan


def test_dominant_suppliers_single_fact_pass(spark):
    """q20 shape: the pair aggregate is persisted, so both its consumers
    read the cached intermediate — the fact scan happens once."""
    plan = _plan(spark, "dominant_suppliers")
    assert plan.count("InMemoryTableScan") >= 2


def test_waiting_suppliers_shared_pair_and_topk(spark):
    """q21 shape: the order×supplier pair aggregate is persisted (read
    twice, computed once) and the final top-20 is a per-partition heap,
    never a global sort."""
    plan = _plan(spark, "waiting_suppliers")
    assert plan.count("InMemoryTableScan") >= 2
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_decontaminate_bench_shingles_broadcast(spark):
    """The benchmark shingle set must broadcast: the train-side posting
    list joins it map-side and never shuffles for the join (the train
    corpus is the 100 TB side; eval suites are KBs). The only exchanges
    allowed are aggregation shuffles, not a join repartition of the
    train shingles."""
    plan = _plan(spark, "decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # the train shingle set is persisted: the frequency cap and the
    # overlap join both read the cache — the train corpus is scanned once
    assert plan.count("InMemoryTableScan") >= 2


def test_minhash_signature_partial_aggregation(spark):
    """The k min-aggregates must map-side combine (partial HashAggregate
    below the id shuffle) — the property that keeps the signature stage
    one shuffle of |docs| rows, not |shingles| rows."""
    plan = _plan(spark, "minhash_buckets")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning(id" in plan


def test_chunk_sharded_sorts_are_shard_bounded(spark):
    """The scale-tier packing plan must never sort a whole language in
    one task: the document-frame window partitions by (lang, _shard) —
    bounded by span — and the shard offsets come back via broadcast, so
    no corpus-sized partition exists anywhere in the plan."""
    plan = _plan(spark, "chunk_assignment_sharded")
    # the big window's exchange carries BOTH keys
    i = plan.index("hashpartitioning(lang")
    assert "_shard" in plan[i : i + 120], plan[i : i + 120]
    # the doc-frame sort is (lang, _shard, doc_id), not (lang, doc_id)
    doc_sorts = [
        l for l in plan.splitlines() if "Sort [lang" in l and "doc_id" in l
    ]
    assert doc_sorts and all("_shard" in l for l in doc_sorts), doc_sorts
    # shard offsets join back broadcast — never a shuffle of the doc frame
    assert "BroadcastHashJoin" in plan


def test_repetition_signals_is_fully_scan_local(spark):
    """BOTH repetition metrics are per-row array expressions (distinct
    count + sorted-run fold): the plan must contain no Exchange at all —
    no bigram string ever shuffles at any corpus size."""
    plan = _plan(spark, "repetition_signals")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_mixture_weights_total_is_broadcast(spark):
    """The scalar corpus total joins via broadcast — the per-lang counts
    never reshuffle against it."""
    plan = _plan(spark, "mixture_weights")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_quantize_and_splits_have_no_shuffle(spark):
    """Quantization and split assignment are pure per-row scan
    expressions: no Exchange anywhere."""
    for name in ("embedding_quantize", "corpus_splits"):
        plan = _plan(spark, name)
        assert "Exchange" not in plan, name


def test_span_dedup_first_occurrence_is_partial_agg_no_window(spark):
    """Span dedup's first-occurrence selection must be a map-side
    partially-aggregated groupBy on the 60-bit span hash — never a
    window over the exploded corpus (a window would sort every span of
    the corpus inside each hash partition)."""
    plan = _plan(spark, "span_dedup")
    assert "Window" not in plan
    # partial + final HashAggregate around the span-hash exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning(h" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_corpus_shuffle_has_no_global_sort(spark):
    """The corpus shuffle must rank inside hash-prefix shards (bounded
    sorts) with shard offsets broadcast back — a rangepartitioning
    exchange (global sort) or a single-partition window over the doc
    frame would be the scale-killer this operator exists to avoid."""
    plan = _plan(spark, "corpus_shuffle")
    assert "rangepartitioning" not in plan.lower()
    assert "Exchange hashpartitioning(_shard" in plan
    assert "BroadcastHashJoin" in plan
    # the only SinglePartition exchange feeds the tiny per-shard counts
    doc_frame_lines = [
        l for l in plan.splitlines() if "Exchange SinglePartition" in l
    ]
    assert len(doc_frame_lines) <= 1


def test_bpe_pair_counts_partial_agg_and_topk(spark):
    """Pair counting must map-side combine and take the top-k without a
    global sort materializing."""
    plan = _plan(spark, "bpe_pair_counts")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2


def test_vocab_encode_dictionary_is_broadcast(spark):
    """The vocab dictionary must broadcast onto the exploded token
    stream (a shuffle join keyed by token would reshuffle the whole
    corpus for a V-row dictionary); vocab counting must map-side combine
    and the top-V must be TakeOrderedAndProject."""
    plan = _plan(spark, "vocab_encode")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2
    # the single Window runs over the V vocab rows AFTER the top-V limit,
    # never over the token stream: it must sit above TakeOrderedAndProject
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")


def test_quality_filter_is_scan_local_plus_one_agg(spark):
    """Every rule evaluates at the scan; the only shuffle is the
    language-sized groupBy (map-side combined)."""
    plan = _plan(spark, "quality_filter")
    assert plan.count("Exchange") == 1
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("HashAggregate") >= 2


def test_pretraining_manifest_keeps_sharded_packing_shape(spark):
    """The composed pipeline's packing stage must keep the two-level
    sharded properties: the doc-frame prefix-sum sort carries the shard
    key (bounded sorts) and shard offsets join back broadcast."""
    plan = _plan(spark, "pretraining_manifest")
    doc_sorts = [
        l for l in plan.splitlines() if "Sort [lang" in l and "doc_id" in l
    ]
    assert doc_sorts and all("_shard" in l for l in doc_sorts), doc_sorts
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_label_confusion_centroids_broadcast_corpus_unshuffled(spark):
    """The centroid side (|labels| rows) must broadcast into the scoring
    cross join — the corpus is scanned, never shuffled, for assignment.
    The component-mean aggregate must map-side combine (partial
    HashAggregate below its (label, dim) exchange), keeping that one
    shuffle at |labels|·d keys."""
    plan = _plan(spark, "label_confusion")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "Exchange rangepartitioning" not in plan
    # r11: the per-vector argmax is the struct-max AGGREGATE
    # (_nearest_centroid), not a rank-1 window over the cross join —
    # no WindowGroupLimit may reappear above the corpus scan (the only
    # remaining Window ranks the |labels|-row centroid frame)
    assert "WindowGroupLimit" not in plan


def test_source_overlap_is_pair_sided(spark):
    """The source labels join onto the PAIR frame (∝ duplicate rate),
    and the matrix rollup map-side combines — the corpus text is never
    re-shuffled past the minhash stage."""
    plan = _plan(spark, "source_overlap")
    assert "CartesianProduct" not in plan
    # the final matrix aggregate partial-combines before its exchange
    assert "Exchange hashpartitioning(source_a" in plan
    assert plan.count("HashAggregate") >= 2


def test_semdedup_broadcasts_centroids_and_hash_joins_clusters(spark):
    """SemDeDup: the assignment pass broadcasts the k-row centroid frame
    over the corpus, and the within-cluster self-join is a HASH join on
    centroid_id — never a CartesianProduct of corpus rows (the quadratic
    work is bounded inside clusters by the join key)."""
    plan = _plan(spark, "semdedup_prune")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "centroid_id" in plan


def test_min_cost_supplier_broadcasts_part_and_takeordered(spark):
    """q2 shape: the filtered part bracket broadcasts (lineitem is pruned
    before the per-part min), dims broadcast, and the final top-100 is a
    TakeOrderedAndProject — never a global sort."""
    plan = _plan(spark, "min_cost_supplier")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_top_value_parts_broadcasts_scalar_total(spark):
    """q11 shape: the 1-row global total joins back via broadcast (no
    driver collect, no cartesian of real data); the per-part sum is
    map-side combined."""
    plan = _plan(spark, "top_value_parts")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("HashAggregate") >= 2


def test_sem_manifest_reuses_persisted_survivors(spark):
    """The composed semantic pipeline must read the lexical-survivor set
    from the persisted intermediate (one filter→pairs→CC evaluation
    feeds the kmeans loop, the pairwise stage, AND the final anti-join)
    and never plan a cartesian of corpus rows."""
    plan = _plan(spark, "pretraining_manifest_sem")
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan


def test_doc_chunks_is_fully_scan_local(spark):
    """RAG chunking is window arithmetic over the bound token array —
    any Exchange would mean the explode got shuffled."""
    plan = _plan(spark, "doc_chunks")
    assert "Exchange" not in plan


def test_length_histogram_partial_agg(spark):
    plan = _plan(spark, "length_histogram")
    assert plan.count("HashAggregate") >= 2  # map-side combine
    assert plan.count("Exchange") == 1      # the ≤64-group agg only


def test_mixture_temperature_total_is_broadcast(spark):
    plan = _plan(spark, "mixture_temperature")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bigram_lm_model_join_never_cartesian(spark):
    """The vocab scalar is broadcast; the model and scoring joins are
    hash joins on bigram/unigram keys — a CartesianProduct would mean
    the |docs|×|vocab| blow-up."""
    plan = _plan(spark, "bigram_lm_quality")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row vocab total
    # tokenization happens once: the persisted token frame feeds
    # unigrams, bigrams, and the doc spine
    assert plan.count("InMemoryTableScan") >= 2


def test_rrf_fusion_windows_are_query_bounded(spark):
    """Fusion never touches the corpus: every window partitions by
    query_id (top-k-bounded inputs), no rangepartitioning global sort;
    the shared posting-list persist means ONE corpus tokenize pass
    feeds both rankers (both read the cache, neither re-explodes)."""
    plan = _plan(spark, "rrf_fusion")
    assert "rangepartitioning" not in plan.lower()
    assert "CartesianProduct" not in plan
    # both rankers read the SHARED posting-list cache (the plan string
    # also embeds the cached relation's own build plan, so asserting on
    # the explode's absence is not possible — the cache reads are the
    # guarantee that it executes once)
    assert plan.count("InMemoryTableScan") >= 2


def test_curriculum_order_sorts_are_stage_shard_bounded(spark):
    """The grouped shuffle rank must partition its windows by
    (stage, shard) — a per-stage-only partition would be 3 giant sorts."""
    plan = _plan(spark, "curriculum_order")
    assert "rangepartitioning" not in plan.lower()
    assert "Exchange hashpartitioning(stage" in plan
    assert "BroadcastHashJoin" in plan  # offsets join


def test_perplexity_prune_distribution_bounded_windows(spark):
    """The threshold machinery runs over the (lang, bucket) score
    distribution — resolution-bounded — never a corpus re-sort."""
    plan = _plan(spark, "perplexity_prune")
    assert "rangepartitioning" not in plan.lower()
    assert "CartesianProduct" not in plan


# every BATCH query's physical plan must be free of NON-broadcast
# cartesian products — the one anti-pattern that silently turns a
# registered query quadratic. Queries whose brute-force form is the
# POINT (labeled oracle tiers for the LSH/IVF scale paths) are
# allowlisted explicitly so a new quadratic query can never slip into
# the registry unnoticed.
_CARTESIAN_ALLOWED = {
    # exact all-pairs cosine — the oracle tier; the scale paths are
    # embedding_neardup_lsh / embedding_neardup_idx (operators/
    # similarity.py cosine_neardup_pairs, documented quadratic)
    "embedding_neardup",
}
_FLEET_BATCH = [
    k
    for k in QUERIES
    if not k.startswith("streaming_")
    # the sketch tier builds its frames through custom aggs whose plans
    # are checked in test_sketches; keep the fleet lint to oracle tiers
    and k not in ("vocab_sketch", "value_quantiles_sketch")
]


def test_fleet_no_unbroadcast_cartesian(spark):
    bad = []
    for name in _FLEET_BATCH:
        plan = _plan(spark, name)
        if "CartesianProduct" in plan and name not in _CARTESIAN_ALLOWED:
            bad.append(name)
    assert not bad, (
        f"non-broadcast cartesian product in registered queries {bad} — "
        "broadcast the small side or bucket-join; if the quadratic form "
        "is a labeled oracle tier, allowlist it HERE with a comment"
    )


def test_chunk_ann_search_shape(spark):
    """chunk_ann_topk's returned frame is the search + doc rollup over
    the standing chunk index: centroids broadcast, no cartesian, and
    the rollup windows partition by query/doc keys over
    ≤ |queries|·k_chunks rows — the corpus-sized work all happened at
    build time. (The display orderBy's rangepartitioning runs over the
    ≤ |queries|·k_docs FINAL rows, so it is not asserted away.)"""
    plan = _plan(spark, "chunk_ann_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan  # centroids / query side
    # the probe top-nprobe and rescore top-k must use the two-stage
    # window limit (partial below the exchange) like the other ANN paths
    assert any(
        "WindowGroupLimit" in l and "Partial" in l for l in plan.splitlines()
    )


def test_pretraining_manifest_lm_reuses_persisted_fluent_set(spark):
    """The LM-pruned pipeline must read the fluent survivor set from the
    persisted intermediate (the inner pipeline consumes it for pair
    derivation, component vertices, and the survivor join — each would
    otherwise re-train and re-score the whole bigram model) and never
    plan a cartesian beyond the broadcast 1-row vocab total."""
    plan = _plan(spark, "pretraining_manifest_lm")
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan.lower()


def test_pretraining_manifest_full_shape(spark):
    """The grand composition must keep the composed-pipeline plan
    properties: persisted intermediates feed the multi-consumer stages
    (decon survivors, fluent survivors, lexical survivors) and no
    cartesian beyond the broadcast scalar totals."""
    plan = _plan(spark, "pretraining_manifest_full")
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan


def test_pinned_snapshot_reads_stay_bucketed(spark, tmp_path):
    """r11 (VERDICT r10 item 3): a snapshot of a bucketed table is
    LAYOUT-PRESERVING — get_version serves the frozen tree as a
    bucketed read, so the epoch-pinned keep-best challenge keeps the
    live path's exchange-free plans. Gates BOTH consumer shapes the
    pinned challenge runs per epoch: the max_bucket skew aggregate on
    (band_idx, band_hash) and the shingle join on id — pre-r11 each
    paid a corpus-sized Exchange over the plain-parquet pin."""
    from pyspark.sql import functions as F

    from simple_map_reduce_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "cat"))
    buckets = spark.range(0, 400).select(
        (F.col("id") % 50).alias("band_idx"),
        (F.col("id") % 97).alias("band_hash"),
        F.col("id").alias("id"),
    )
    cat.put_bucketed(buckets, "pb__buckets", ("band_idx", "band_hash"), 8)
    shingles = spark.range(0, 400).select(
        F.col("id"), (F.col("id") * 7 % 991).alias("h")
    )
    cat.put_bucketed(shingles, "pb__shingles", "id", 8)
    vb = cat.snapshot("pb__buckets")
    vs = cat.snapshot("pb__shingles")

    # consumer shape 1: the skew aggregate on the pinned buckets
    agg = cat.get_version("pb__buckets", vb).groupBy("band_idx", "band_hash").agg(
        F.count("*").alias("bsz")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Bucketed: true" in plan, plan

    # consumer shape 2: pinned shingles joined on id against the live
    # bucketed table (broadcast disabled so a lost layout would force
    # a shuffle, not hide behind a BroadcastExchange)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = cat.get_version("pb__shingles", vs).join(
            cat.get_bucketed("pb__shingles").select("id"), "id"
        )
        jplan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange" not in jplan, jplan

    # and the pin is still a PIN: rows appended after the snapshot are
    # invisible to the frozen read
    cat.append_bucketed(
        spark.range(400, 500).select(
            F.col("id"), (F.col("id") * 7 % 991).alias("h")
        ),
        "pb__shingles",
        "id",
        8,
    )
    assert cat.get_version("pb__shingles", vs).count() == 400
    assert cat.get_bucketed("pb__shingles").count() == 500
