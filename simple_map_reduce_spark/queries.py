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
# Round 11 window = the 8 rows whose code/oracle changed (semdedup_prune
# / semdedup_keep_best: CAPACITY-SIZED — n_centroids=None resolves
# ivf_capacity's sqrt(N) rule, the fix for the measured N^2/K
# DNF-at-100x class, with the oracle recomputing the same sqrt(N) as a
# LIMIT expression, VERDICT r10 item 1; dedup_keep_best /
# pretraining_manifest_kb / neardup_keep_best / semantic_keep_best:
# every keep-best quality entry point now REFUSES non-integral quality
# instead of silently truncating under the bigint cast, ADVICE r10 —
# and semdedup_keep_best additionally refuses duplicate quality ids;
# streaming_keep_best / streaming_semantic_keep_best: snapshots are
# LAYOUT-PRESERVING, so the pinned epoch challenge keeps the bucketed
# tables' exchange-free plans instead of paying per-epoch corpus
# Exchanges — VERDICT r10 item 3, plan-gated in tests/test_plans.py)
# + ALL 39 r7-dated rows (VERDICT r10 item 1: after this window nothing
# oracle-backed is older than r8), with the three rows named-deferred
# from the r10 rotation (asof_last_order, customer_order_seq,
# corpus_splits — queries.py r10 comment) FIRST so deferrals don't
# compound (VERDICT r10 item 7)
# + the 3 alphabetically-first r8-dated rows (audio_features,
# big_orders, bm25_topk) to fill the window — freshness bonus.
# Out of _CHANGED_THIS_ROUND deliberately: incremental_neardup_idx and
# every other plain (non-quality) index row — require_integral_quality
# fires only on quality-tier entry points, and plain builds/ingests
# never snapshot; embedding_neardup_capacity (IvfIndex.build without
# quality, untouched); pretraining_manifest/_full (quality_aware
# defaults False, sem_k stays the explicit parity constant this round
# — capacity-sizing the COMPOSED manifest oracle is future work);
# maintain()'s new epoch-pin sweep (no registry row invokes maintain —
# pytest-gated in tests/test_maintain.py).
_CHANGED_THIS_ROUND = [
    # r11: capacity-sized SemDeDup pair (sqrt(N) quantizer + capacity
    # oracle) + the integral-quality/duplicate-id guards
    "semdedup_prune",
    "semdedup_keep_best",
    # r11: require_integral_quality on keep_best_exemplars and both
    # indexes' quality tiers (ADVICE r10)
    "dedup_keep_best",
    "pretraining_manifest_kb",
    "neardup_keep_best",
    "semantic_keep_best",
    # r11: layout-preserving snapshot pins in the epoch protocol
    "streaming_keep_best",
    "streaming_semantic_keep_best",
    # r11: NEW — MMR diversity rerank (similarity.py::mmr_rerank), the
    # retrieval stack's diversity tier; unrolled-greedy oracle. Its
    # window slot came from the bm25_topk r8 freshness fill (r8 rows
    # are not yet stale; a NEW query must verify the round it ships)
    "mmr_rerank",
]
_ROTATION_FRONT = [
    *_CHANGED_THIS_ROUND,
    # the 3 rows named-deferred from the r10 rotation, first
    "asof_last_order",
    "customer_order_seq",
    "corpus_splits",
    # the remaining 36 r7-dated rows, alphabetical
    "customer_spend_ntile",
    "customers_without_orders",
    "decontaminate",
    "deterministic_sample",
    "disjunctive_revenue",
    "dominant_suppliers",
    "embedding_neardup",
    "embedding_neardup_lsh",
    "embedding_quantize",
    "events_json",
    "events_pivot",
    "flag_priority_matrix",
    "forecast_revenue",
    "frame_sample",
    "fuzzy_part_names",
    "image_features",
    "ivf_refined_centroids",
    "ivf_refined_topk",
    "jaccard_pairs",
    "label_confusion",
    "late_ship_priority",
    "market_share",
    "mixture_weights",
    "orders_sorted_limit",
    "part_type_stats",
    "parts_ordered",
    "perplexity_prune",
    "quality_filter",
    "repetition_signals",
    "semantic_ingest",
    "similarity_topk_ivf",
    "similarity_topk_lsh",
    "span_dedup",
    "stats_summary",
    "streaming_semantic_ingest",
    "vocab_encode",
    # window fill: the 2 alphabetically-first r8-dated rows (the third
    # slot went to mmr_rerank, new this round)
    "audio_features",
    "big_orders",
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
