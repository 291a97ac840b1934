"""Analytics batch 4: classic decision-support shapes not yet in the
registry — argmin-per-group (greatest-n-per-group), disjunctive predicate
join (TPC-H q19 shape), scalar-subquery threshold + anti-join (q22 shape),
multi-distinct aggregation, dense-grid zero-fill (cross join + left join),
and cohort retention (two-level temporal aggregation).

All oracle-checked. Conventions follow ``queries.py``: identical aliases
both sides, exact decimal arithmetic for money, BIGINT conditional counts,
deterministic tiebreakers in windows.

Scale notes per query are inline; the general rules: windows are always
partitioned by a real key (never empty-frame over raw data), small sides
of joins are broadcast, and scalar subqueries reduce to one row before
they fan back out (Spark broadcasts the single-row result automatically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sources.readers import load_table

_D12 = "decimal(12,2)"
_D14 = "decimal(14,2)"


def q_cheapest_item_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greatest-n-per-group (argmin): the cheapest lineitem of every order.

    Window ``row_number`` partitioned by the group key — at scale this is
    one shuffle on ``l_orderkey`` and a per-partition sort; no self-join,
    no global sort. Tiebreak on ``l_linenumber`` keeps it deterministic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").asc(), F.col("l_linenumber").asc()
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_orderkey",
            F.col("l_linenumber").alias("cheapest_line"),
            F.col("l_extendedprice").alias("cheapest_price"),
        )
    )


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19 shape: OR of bracketed (brand, size, quantity) predicates
    across a lineitem×part join; one revenue scalar.

    The part side is tiny → broadcast hash join, no shuffle of lineitem.
    The disjunction references both sides, so it evaluates post-join, but
    the ``p_size`` upper bound (≤ 15) is a common conjunct Catalyst can
    push to the part scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    revenue = (
        F.col("l_extendedprice").cast(_D12)
        * (F.lit(1).cast(_D12) - F.col("l_discount").cast(_D12))
    )
    return j.filter(cond).agg(
        F.sum(revenue).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


def q_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 shape: customers with above-average balance (scalar
    subquery over positive balances) and no *recent* orders (anti-join
    against orders since 2000-01-01), rolled up per nation.  The date
    predicate exists because the synthetic data gives every customer at
    least one order ever — a plain no-orders anti-join is vacuously empty.

    The scalar subquery aggregates to a single row (exact decimal mean,
    then one double) that joins back as a broadcast cross join — fully
    lazy, one DAG, no driver-side ``first()`` round trip; the date filter
    prunes the orders side *before* the anti-join shuffle, so the shuffle
    carries only the recent slice. No correlated re-execution.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast(_D14)) / F.count("*"))
        .cast("double")
        .alias("avg_bal")
    )
    rich = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .drop("avg_bal")
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
    inactive = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return inactive.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count("*").alias("n_custs"),
        F.sum(F.col("c_acctbal").cast(_D14)).cast("double").alias("total_bal"),
    )


def q_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several COUNT(DISTINCT ...) over different columns in one
    aggregation — planned via Catalyst's expand (one shuffle round with a
    grouping-id column), not N separate jobs."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count("*").alias("n_rows"),
    )


def q_segment_priority_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense grid with zero-fill: every (mktsegment × orderpriority) cell,
    including combinations with no orders.

    The grid is built from two tiny distinct sets (5×5) — the cross join
    is a broadcast nested loop over 25 rows, then a broadcast left join
    against the aggregated facts (also tiny after aggregation). The only
    full-data shuffle is the orders groupBy."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    segs = cust.select(F.col("c_mktsegment").alias("segment")).distinct()
    prios = orders.select(F.col("o_orderpriority").alias("priority")).distinct()
    grid = segs.crossJoin(prios)
    facts = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").alias("n_orders"))
    )
    return grid.join(F.broadcast(facts), ["segment", "priority"], "left").select(
        "segment",
        "priority",
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias("n_orders"),
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: customers bucketed by first-order month; distinct
    active customers per (cohort_month, order_month).

    First-order month is a window min partitioned by customer (one shuffle
    on custkey), then a distinct-count aggregation per month pair. Both
    stages key on bounded-cardinality or well-distributed keys."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    month = F.trunc(F.col("o_orderdate"), "month")
    cohorts = orders.select(
        "o_custkey",
        month.alias("order_month"),
        F.min(month).over(w).alias("cohort_month"),
    )
    return cohorts.groupBy("cohort_month", "order_month").agg(
        F.countDistinct("o_custkey").alias("active_custs")
    )


def q_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance self-join over distinct part names (lev ≤ 2) via
    FastSS deletion-neighborhood blocking — complete candidate generation
    with no cross join (see ``operators.fuzzy``). The name doubles as the
    id so pair ordering is lexicographic and deterministic."""
    from .operators.fuzzy import fuzzy_self_join

    part = load_table(spark, sf_dir, "part")
    names = part.select("p_name").distinct()
    pairs = fuzzy_self_join(names, "p_name", "p_name", max_dist=2)
    return pairs.select(
        F.col("s_a").alias("name_a"), F.col("s_b").alias("name_b"), "dist"
    )


def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf·idf terms per document (see
    ``operators.aggregates.tfidf_top_terms`` for the shuffle shape)."""
    from .operators.aggregates import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", k=3).withColumnRenamed("id", "doc_id")


ANALYTICS4_QUERIES = {
    "cheapest_item_per_order": q_cheapest_item_per_order,
    "disjunctive_revenue": q_disjunctive_revenue,
    "rich_inactive_customers": q_rich_inactive_customers,
    "multi_distinct": q_multi_distinct,
    "segment_priority_grid": q_segment_priority_grid,
    "cohort_retention": q_cohort_retention,
    "fuzzy_part_names": q_fuzzy_part_names,
    "tfidf_terms": q_tfidf_terms,
}

ANALYTICS4_ORACLES = {
    "cheapest_item_per_order": """
        SELECT l_orderkey,
               CAST(l_linenumber AS INTEGER) AS cheapest_line,
               l_extendedprice AS cheapest_price
        FROM (
            SELECT l_orderkey, l_linenumber, l_extendedprice,
                   row_number() OVER (
                       PARTITION BY l_orderkey
                       ORDER BY l_extendedprice ASC, l_linenumber ASC
                   ) AS rn
            FROM lineitem
        )
        WHERE rn = 1
    """,
    "disjunctive_revenue": """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                    AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "rich_inactive_customers": """
        SELECT CAST(c_nationkey AS INTEGER) AS nationkey,
               count(*) AS n_custs,
               CAST(sum(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS total_bal
        FROM customer
        WHERE c_acctbal > (
                  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(14,2))) / count(*) AS DOUBLE)
                  FROM customer WHERE c_acctbal > 0
              )
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= DATE '2000-01-01')
        GROUP BY c_nationkey
    """,
    "multi_distinct": """
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps,
               count(DISTINCT l_orderkey) AS n_orders,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "segment_priority_grid": """
        SELECT segment, priority,
               coalesce(n_orders, 0) AS n_orders
        FROM (SELECT DISTINCT c_mktsegment AS segment FROM customer) s
        CROSS JOIN (SELECT DISTINCT o_orderpriority AS priority FROM orders) p
        LEFT JOIN (
            SELECT c_mktsegment AS segment, o_orderpriority AS priority,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        ) f USING (segment, priority)
    """,
    "cohort_retention": """
        SELECT cohort_month, order_month,
               count(DISTINCT o_custkey) AS active_custs
        FROM (
            SELECT o_custkey,
                   date_trunc('month', o_orderdate) AS order_month,
                   min(date_trunc('month', o_orderdate))
                       OVER (PARTITION BY o_custkey) AS cohort_month
            FROM orders
        )
        GROUP BY 1, 2
    """,
    "fuzzy_part_names": """
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        FROM (SELECT DISTINCT p_name FROM part) a
        JOIN (SELECT DISTINCT p_name FROM part) b ON a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
    "tfidf_terms": r"""
        WITH tok AS (
            SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
        ),
        docfreq AS (
            SELECT term, count(*) AS df_cnt FROM tf GROUP BY term
        ),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, term, tf, score, rank
        FROM (
            SELECT tf.doc_id, tf.term, tf.tf,
                   round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / docfreq.df_cnt), 6)
                       AS score,
                   row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY round(tf.tf * ln(CAST(n.n_docs AS DOUBLE)
                                                 / docfreq.df_cnt), 6) DESC,
                                tf.term ASC
                   ) AS rank
            FROM tf JOIN docfreq USING (term) CROSS JOIN n
        )
        WHERE rank <= 3
    """,
}
