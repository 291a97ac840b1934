"""Query registry: every operator from SURVEY.md §2 (and the [EXT]
north-star set) exposed as ``(spark, sf_dir) -> DataFrame`` callables with
DuckDB oracle-SQL twins.

Oracle-parity rules used throughout (the driver hash-compares values):
- Every computed column is aliased identically on both sides.
- Integer aggregates are BIGINT on both sides (DuckDB ``count`` is BIGINT;
  sums of ints are cast explicitly).
- Double aggregates go through *exact decimal* arithmetic (cast inputs to
  a fixed DECIMAL, aggregate exactly, cast the final result to DOUBLE) so
  Spark's and DuckDB's different partial-aggregation orders cannot produce
  different floating-point sums.
- Top-k queries always carry a deterministic tiebreaker key in ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.aggregates import (
    distinct_tokens,
    filter_group_count_percent,
    wordcount,
    wordcount_total,
)
from .operators.filters import regex_filter
from .operators.joins import equi_join
from .sources.readers import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

# Line regex for the reference's golden SQL-filter semantics, applied to a
# whole-line view (SURVEY.md §3.1); kept to constructs with identical
# meaning in Java regex (Spark) and RE2 (DuckDB).
_FILTER_REGEX = "Customer#0+1[0-9]{2}.*BUILDING"


# ---------------------------------------------------------------------------
# Reference-parity queries
# ---------------------------------------------------------------------------


def q_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2: SELECT ALL FROM customer WHERE <regex> on the raw-line view
    (``executors/selectmap.py``; lifecycle SURVEY.md §3.1)."""
    cust = load_table(spark, sf_dir, "customer")
    lines = cust.select(
        F.concat_ws(
            ",",
            F.col("c_custkey").cast("string"),
            F.col("c_name"),
            F.col("c_mktsegment"),
        ).alias("value")
    )
    return regex_filter(lines, _FILTER_REGEX)


def q_column_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: equality filter on one column (``executors/Sdemo1map.py:16-21``)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )


def q_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: SELECT ALL FROM orders customer WHERE o_custkey = c_custkey —
    the join the reference declares but never shipped (SURVEY.md §2.5)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = equi_join(orders, cust, "o_custkey", "c_custkey")
    return joined.select("o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_mktsegment")


def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-word counts over documents.text (``wordcountmap.py`` A1/A2)."""
    docs = load_table(spark, sf_dir, "documents")
    return wordcount(docs, "text")


def q_wordcount_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token count (A4, ``wordcountreduce.py``)."""
    docs = load_table(spark, sf_dir, "documents")
    return wordcount_total(docs, "text")


def q_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: the mapper's distinct key set."""
    docs = load_table(spark, sf_dir, "documents")
    return distinct_tokens(docs, "text")


def q_filter_group_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3+A1–A3: the Sdemo1/Hdemo1 demo query with the percent-of-total
    computed globally (reference bug fixed, SURVEY.md §2.4 A3)."""
    orders = load_table(spark, sf_dir, "orders")
    out = filter_group_count_percent(orders, "o_orderpriority", "1-URGENT", "o_orderstatus")
    # round-then-format so both engines format the same rounded double
    return out.select(
        "grp",
        "cnt",
        "pct",
        F.format_string("%.2f%%", F.round(F.col("pct"), 2)).alias("pct_str"),
    )


# ---------------------------------------------------------------------------
# Analytics suite (exercises scan→filter→join→agg→window→topk at scale)
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary over lineitem (decimal-exact)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    one = F.lit(1).cast("decimal(4,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-10-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style: filter both sides, 3-way join, agg, top-10 with a
    deterministic tiebreaker."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("2024-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2024-06-01").cast("timestamp")
    )
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    one = F.lit(1).cast("decimal(4,2)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(price * (one - disc)).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by total order value (join + agg + ordered limit)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    total = F.col("o_totalprice").cast("decimal(14,2)")
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(total).cast("double").alias("total_spend"),
            F.count("*").alias("order_cnt"),
        )
        .orderBy(F.col("total_spend").desc(), F.col("c_custkey"))
        .limit(10)
    )


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend — ranking/analytic window with a fully
    deterministic ordering (o_orderdate, o_orderkey)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.col("o_totalprice").cast("decimal(14,2)")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(total).over(w).cast("double").alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


def q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event rollup — the batch twin of the streaming
    pipeline in ``streaming/`` ([EXT]; reference has no streaming,
    SURVEY.md §2.9)."""
    ev = load_table(spark, sf_dir, "events")
    val = F.col("value").cast("decimal(12,2)")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(val).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "sum_value")
    )


from .queries_analytics import ANALYTICS_ORACLES, ANALYTICS_QUERIES  # noqa: E402
from .queries_analytics3 import ANALYTICS3_ORACLES, ANALYTICS3_QUERIES  # noqa: E402
from .queries_analytics4 import ANALYTICS4_ORACLES, ANALYTICS4_QUERIES  # noqa: E402
from .queries_analytics5 import ANALYTICS5_ORACLES, ANALYTICS5_QUERIES  # noqa: E402
from .queries_analytics6 import ANALYTICS6_ORACLES, ANALYTICS6_QUERIES  # noqa: E402
from .queries_ext import EXT_ORACLES, EXT_QUERIES  # noqa: E402

QUERIES: dict[str, QueryFn] = {
    "regex_filter": q_regex_filter,
    "column_filter": q_column_filter,
    "equi_join": q_equi_join,
    "wordcount": q_wordcount,
    "wordcount_total": q_wordcount_total,
    "distinct_tokens": q_distinct_tokens,
    "filter_group_pct": q_filter_group_pct,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "topk_customers": q_topk_customers,
    "window_running": q_window_running,
    "events_windowed": q_events_windowed,
    **EXT_QUERIES,
    **ANALYTICS_QUERIES,
    **ANALYTICS3_QUERIES,
    **ANALYTICS4_QUERIES,
    **ANALYTICS5_QUERIES,
    **ANALYTICS6_QUERIES,
}

# Driver-verification rotation: the correctness harness checks exactly the
# FIRST 50 registry entries in order, so the front of the dict rotates
# each round until every query has a driver-green row FROM THE ROUND ITS
# CURRENT BEHAVIOR SHIPPED IN.
#
# WINDOW-COMPOSITION RULE (enforced by tests/test_registry_lint.py):
# whenever an operator/query's semantics change, add its registry keys to
# _CHANGED_THIS_ROUND below — the lint asserts they sit inside the window,
# so a behavior change can never ship on a stale green row again (round
# 2's trigram-default change left jaccard_pairs unverified for a round).
#
# Round 9 window = the 7 NEW queries (the BM25 takedown journey
# bm25_delete_topk and the streaming inverted-index journey
# bm25_stream_ingest — VERDICT r8 items 2 and 3 — the de-noised
# maintenance read path ivf_cluster_skew_read, item 6, the term-skew
# report bm25_term_stats, the stopword-pruned serving path
# bm25_topk_pruned it motivates, the quality-aware cluster resolution
# dedup_keep_best, and its standing-index forms neardup_keep_best and
# semantic_keep_best — NearDupIndex/IvfIndex.ingest_keep_best,
# exemplar REPLACEMENT via the shared tombstone tier on both
# dedup-capable indexes) + the 1 query whose code changed
# (bm25_ingest_topk: per-table admission sets close the
# postings/lengths crash window, ADVICE r8 high — clean-run results
# identical, but the ingest plan changed) + the 14 rows whose RESULTS
# change under the r9 MinHash family migration (minhash_mix: one
# affine round → two rounds with xor-shift avalanche, fixing the
# measured min-wise-independence recall defect; the DuckDB twin
# regenerates from the same constants, so parity re-proves every row
# against independently-recomputed new-family results) + the
# remaining 11 r5-dated rows earmarked last round + the 17 oldest
# r6-dated rows, alphabetical.
# The bm25 read rows and the two r8 delete journeys also traverse this
# round's tombstone-aware code, but with no tombstone table the path is
# a driver-side exists() check into the identical plan (the
# embedding_neardup_idx-r7 precedent), so they stay out of
# _CHANGED_THIS_ROUND (bm25_topk_read's uncapped plan is likewise
# untouched by the max_df_share addition — default None short-circuits
# before any new operator; likewise incremental_neardup_idx/_read:
# NearDupIndex.ingest/build are plan-identical without a quality
# table). 18 r6-dated rows (regex_filter, rrf_fusion, sales_rollup …
# wordcount_total, alphabetical tail) remain for the r10 window.
_CHANGED_THIS_ROUND = [
    # r9: NEW queries ship their behavior this round
    "bm25_delete_topk",
    "bm25_stream_ingest",
    "bm25_term_stats",
    "bm25_topk_pruned",
    "dedup_keep_best",
    "ivf_cluster_skew_read",
    "neardup_keep_best",
    "semantic_keep_best",
    # r9: per-table admission sets in Bm25Index.ingest (ADVICE r8 high)
    "bm25_ingest_topk",
    # r9: MinHash FAMILY MIGRATION (functions/hashes.py::minhash_mix —
    # single affine round → two rounds + xor-shift avalanche, fixing the
    # measured min-wise-independence defect; twin regenerated from the
    # same constants). Every minhash-derived row's RESULTS change, so
    # every one re-verifies this round:
    "dedup_groups",
    "dedup_prune",
    "incremental_neardup",
    "incremental_neardup_idx",
    "incremental_neardup_read",
    "lsh_bucket_skew",
    "minhash_buckets",
    "minhash_dup_pairs",
    "neardup_delete_check",
    "pretraining_manifest",
    "pretraining_manifest_full",
    "pretraining_manifest_lm",
    "pretraining_manifest_sem",
    "source_overlap",
]
_ROTATION_FRONT = [
    *_CHANGED_THIS_ROUND,
    # the r5-dated rows (earmarked in the r8 window comment;
    # source_overlap moved up into the family-migration block)
    "sessionize_batch",
    "similarity_topk_ivf_idx",
    "status_priority_sets",
    "stratified_sample",
    "streaming_hourly_users",
    "supplier_variety",
    "tfidf_terms",
    "token_positions",
    "top_supplier",
    "top_value_parts",
    "waiting_suppliers",
    # the oldest r6-dated rows — pure freshness rotation (the
    # alphabetical tail defers to r10: the family migration claimed
    # 13 window slots this round)
    "bigram_lm_quality",
    "corpus_prep",
    "corpus_shuffle",
    "curriculum_order",
    "dedup_exact",
    "distinct_tokens",
    "doc_chunks",
    "doc_fingerprint",
    "embedding_neardup_idx",
    "equi_join",
    "events_windowed",
    "filter_group_pct",
    "hard_negatives",
    "image_resize",
    "lang_id",
    "left_join_order_counts",
]
assert len(_ROTATION_FRONT) == 50
assert set(_ROTATION_FRONT) <= set(QUERIES)
QUERIES = {
    **{k: QUERIES[k] for k in _ROTATION_FRONT},
    **{k: v for k, v in QUERIES.items() if k not in set(_ROTATION_FRONT)},
}


ORACLES: dict[str, str] = {
    "regex_filter": f"""
        SELECT concat_ws(',', CAST(c_custkey AS VARCHAR), c_name, c_mktsegment) AS value
        FROM customer
        WHERE regexp_matches(concat_ws(',', CAST(c_custkey AS VARCHAR), c_name, c_mktsegment),
                             '{_FILTER_REGEX}')
    """,
    "column_filter": """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    "equi_join": """
        SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    "wordcount": r"""
        SELECT word, count(*) AS cnt
        FROM (SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS word
              FROM documents)
        GROUP BY word
    """,
    "wordcount_total": r"""
        SELECT count(*) AS total_words
        FROM (SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS word
              FROM documents)
    """,
    "distinct_tokens": r"""
        SELECT DISTINCT unnest(regexp_extract_all(lower(text), '\w+')) AS word
        FROM documents
    """,
    "filter_group_pct": """
        SELECT grp, cnt, pct, printf('%.2f%%', round(pct, 2)) AS pct_str
        FROM (
            SELECT o_orderstatus AS grp,
                   count(*) AS cnt,
                   100.0 * count(*) / sum(count(*)) OVER () AS pct
            FROM orders WHERE o_orderpriority = '1-URGENT'
            GROUP BY o_orderstatus
        )
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                   AS sum_disc_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                        * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
                   AS sum_charge,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2024-10-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                   AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '2024-06-01'
          AND l_shipdate > TIMESTAMP '2024-06-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "topk_customers": """
        SELECT c_custkey, c_name,
               CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spend,
               count(*) AS order_cnt
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY total_spend DESC, c_custkey
        LIMIT 10
    """,
    "window_running": """
        SELECT o_custkey, o_orderkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(14,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                   AS running_spend,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                   AS order_seq
        FROM orders
    """,
    "events_windowed": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
               count(*) AS cnt,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    **EXT_ORACLES,
    **ANALYTICS_ORACLES,
    **ANALYTICS3_ORACLES,
    **ANALYTICS4_ORACLES,
    **ANALYTICS5_ORACLES,
    **ANALYTICS6_ORACLES,
}
