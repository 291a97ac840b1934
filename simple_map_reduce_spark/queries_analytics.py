"""Analytics batch 2: multi-way joins, rollup, semi/anti joins, JSON
extraction, distinct aggregates, deterministic dispersion stats — widening
the relational surface beyond the reference (everything here is "free"
Spark per SURVEY.md §2.4/§2.5/§2.6, but registered + oracle-checked so the
coverage is *proven*, not claimed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.hashes import md5_long60
from .operators.joins import asof_join
from .sources.readers import load_table


def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style 6-way join: region ⋈ nation ⋈ customer ⋈ orders ⋈
    lineitem ⋈ supplier, revenue per nation. Dims broadcast; the only
    large shuffles are the fact-side joins."""
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    one = F.lit(1).cast("decimal(4,2)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        # both customer and supplier must be in the nation (TPC-H Q5 semantics)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(price * (one - disc)).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over part: count + distinct aggregate + deterministic
    min/max (catalogue-style rollup feeding a pricing dashboard)."""
    part = load_table(spark, sf_dir, "part")
    retail = F.col("p_retailprice").cast("decimal(12,2)")
    return part.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.countDistinct("p_type").alias("n_types"),
        F.min(retail).cast("double").alias("min_price"),
        F.max(retail).cast("double").alias("max_price"),
        (F.sum(retail).cast("double") / F.count("*")).alias("avg_price"),
    )


def q_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (l_returnflag, l_linestatus): grouping-set aggregation
    with subtotal and grand-total rows (NULL group markers)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"), F.sum(qty).cast("double").alias("sum_qty"))
    )


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers that never ordered."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


def q_parts_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join: parts that appear in at least one lineitem."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return part.join(
        li, part["p_partkey"] == li["l_partkey"], "left_semi"
    ).select("p_partkey", "p_brand")


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull props.k out of the JSON string
    column and aggregate on it (JVM-side JSON path, no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("k").alias("sum_k"),
            F.countDistinct("k").alias("distinct_k"),
        )
    )


def q_stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion stats per order priority with DETERMINISTIC variance:
    built from exact decimal sums (sum, sum of squares, count) and a
    fixed double expression — not the engine's streaming variance, whose
    merge order is nondeterministic across partitions/engines."""
    orders = load_table(spark, sf_dir, "orders")
    total = F.col("o_totalprice").cast("decimal(14,2)")
    agg = orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(total).cast("double").alias("sum_price"),
        # round the exact decimal to scale 0 first: keeps the scaled
        # integer < 2^53 so the decimal→double conversion is exact in
        # both engines (sum of squares overflows that bound at scale 4)
        F.round(F.sum(total * total), 0).cast("double").alias("sumsq_price"),
    )
    # sample variance from exact components, one fixed double expression
    var = (
        F.col("sumsq_price") - F.col("sum_price") * F.col("sum_price") / F.col("n")
    ) / (F.col("n") - 1)
    return agg.select(
        "o_orderpriority",
        "n",
        "sum_price",
        (F.col("sum_price") / F.col("n")).alias("avg_price"),
        var.alias("var_price"),
    )


def q_orders_sorted_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT as a first-class surface (absent in the reference,
    SURVEY.md §2.6): newest 50 orders, fully deterministic ordering."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey"))
        .limit(50)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    )


def q_segment_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation: nations having BOTH a BUILDING- and an AUTOMOBILE-
    segment customer (intersect of two projections)."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    return a.intersect(b)


def q_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event annotated with the user's most recent order
    at event time (backward, inclusive). Right side pre-deduplicated to
    one row per (custkey, orderdate) so tie-breaking is deterministic in
    both engines (see asof_join docstring)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("last_orderkey"))
    )
    return asof_join(
        ev,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["last_orderkey"],
    )


def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% hash sample — reproducible corpus subsetting
    (training-data splits must be stable across runs and engines, so no
    ``rand()``: membership is a pure function of the key)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(md5_long60(F.col("c_custkey").cast("string")) % 20 == 0).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


ANALYTICS_QUERIES = {
    "q5_regional_revenue": q5_regional_revenue,
    "part_type_stats": q_part_type_stats,
    "sales_rollup": q_sales_rollup,
    "customers_without_orders": q_customers_without_orders,
    "parts_ordered": q_parts_ordered,
    "events_json": q_events_json,
    "stats_summary": q_stats_summary,
    "orders_sorted_limit": q_orders_sorted_limit,
    "segment_intersect": q_segment_intersect,
    "asof_last_order": q_asof_last_order,
    "deterministic_sample": q_deterministic_sample,
}

ANALYTICS_ORACLES = {
    "q5_regional_revenue": """
        SELECT r_name, n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                   AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey  = c_custkey
        JOIN supplier ON l_suppkey  = s_suppkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey
        GROUP BY r_name, n_name
    """,
    "part_type_stats": """
        SELECT p_brand,
               count(*) AS n_parts,
               count(DISTINCT p_type) AS n_types,
               CAST(min(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price,
               CAST(max(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price,
               CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price
        FROM part GROUP BY p_brand
    """,
    "sales_rollup": """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "parts_ordered": """
        SELECT p_partkey, p_brand FROM part
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    """,
    "events_json": """
        SELECT event_type, count(*) AS cnt,
               CAST(sum(k) AS BIGINT) AS sum_k,
               count(DISTINCT k) AS distinct_k
        FROM (SELECT event_type,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events)
        WHERE k IS NOT NULL
        GROUP BY event_type
    """,
    "stats_summary": """
        SELECT o_orderpriority, n, sum_price,
               sum_price / n AS avg_price,
               (sumsq_price - sum_price * sum_price / n) / (n - 1) AS var_price
        FROM (
            SELECT o_orderpriority, count(*) AS n,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(14,2))
                                  * CAST(o_totalprice AS DECIMAL(14,2))), 0) AS DOUBLE) AS sumsq_price
            FROM orders GROUP BY o_orderpriority
        )
    """,
    "orders_sorted_limit": """
        SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
        FROM orders ORDER BY o_orderdate DESC, o_orderkey LIMIT 50
    """,
    "segment_intersect": """
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
    # oracle uses DuckDB's NATIVE ASOF JOIN — an independent implementation
    # of the same semantics as the engine's union-sort-window operator
    "asof_last_order": """
        WITH o AS (
            SELECT o_custkey, o_orderdate, max(o_orderkey) AS last_orderkey
            FROM orders GROUP BY o_custkey, o_orderdate
        )
        SELECT e.event_id, e.user_id, e.ts, o.last_orderkey
        FROM events e
        ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    "deterministic_sample": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 20 = 0
    """,
}
