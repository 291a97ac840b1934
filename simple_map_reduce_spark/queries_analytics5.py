"""Analytics batch 5: the window-function shapes not yet in the registry —
lag-based month-over-month growth, moving-average frames (ROWS BETWEEN),
NTILE bucketing, dense_rank (ties kept), and exact interpolated medians
per group.

Conventions follow ``queries.py``: identical aliases both sides, exact
decimal arithmetic for money before one final double cast, ranking always
over ROUNDED values with deterministic tiebreaks.

Scale notes inline; the common rule: every window partitions by a real,
bounded key (month, type, customer) and frames are cumulative or fixed-
width — state per partition is O(1) or O(frame), never O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sources.readers import load_table

_D14 = "decimal(14,2)"


def q_mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: monthly totals (one groupBy over
    orders), then ``lag`` over the tiny aggregated series. The window runs
    over #months rows — its single-partition spec is not a scale hazard
    because it executes strictly AFTER aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(F.trunc("o_orderdate", "month").alias("month"))
        .agg(F.sum(F.col("o_totalprice").cast(_D14)).alias("rev_dec"))
    )
    w = Window.orderBy("month")
    prev = F.lag("rev_dec").over(w)
    return monthly.select(
        "month",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.when(prev.isNotNull(), ((F.col("rev_dec") - prev) * 100.0 / prev))
        .cast("double")
        .alias("growth_pct"),
    ).withColumn("growth_pct", F.round("growth_pct", 6))


def q_moving_avg_3m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-month trailing moving average per order priority: a fixed-width
    ROWS frame over the (priority, month) aggregate — frame state is 3
    rows per partition, partitions keyed by priority."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.trunc("o_orderdate", "month").alias("month"),
        )
        .agg(F.count("*").alias("n_orders"))
    )
    w = Window.partitionBy("priority").orderBy("month").rowsBetween(-2, 0)
    return monthly.select(
        "priority",
        "month",
        "n_orders",
        F.round(F.avg(F.col("n_orders")).over(w), 6).alias("ma3"),
    )


def q_customer_spend_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend quartiles via NTILE(4): one groupBy on custkey, then
    the quartile window over per-customer totals, tie-broken by custkey so
    bucket assignment is reproducible. The window's single partition runs
    over |customers-with-orders| aggregated rows; for a truly unbounded
    population the same query runs per-nation (add a partition key)."""
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.col("o_totalprice").cast(_D14)).alias("spend_dec")
    )
    w = Window.orderBy(F.col("spend_dec").desc(), F.col("custkey").asc())
    return spend.select(
        "custkey",
        F.col("spend_dec").cast("double").alias("total_spend"),
        F.ntile(4).over(w).cast("bigint").alias("spend_quartile"),
    )


def q_pricey_parts_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top price tiers per part type with TIES KEPT: ``dense_rank`` over
    retail price per type — every part in the top-3 distinct prices
    qualifies (vs. row_number's arbitrary cut). One shuffle on p_type."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_type").orderBy(F.col("p_retailprice").desc())
    return (
        part.withColumn("price_rank", F.dense_rank().over(w).cast("bigint"))
        .filter(F.col("price_rank") <= 3)
        .select("p_type", "p_partkey", "p_retailprice", "price_rank")
    )


def q_qty_median_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median (and quartile spread) of quantity per
    return flag: ``percentile`` is Spark's exact interpolated quantile —
    it shuffles the group's values once; for the approximate tier at
    extreme cardinality see ``value_quantiles_sketch``."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("q1"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 6).alias("q3"),
        F.count("*").alias("n_rows"),
    )


def q_monthly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill: a dense month spine (``sequence`` over the
    observed min..max) crossed with the priority domain, left-joined to
    the monthly counts — months with no orders appear with 0.

    Scale: the spine derives from a single-row min/max aggregate (tiny,
    broadcast), the domain from a distinct over an enum-cardinality
    column; the only full-data shuffle is the monthly groupBy. This is
    the hypertable-style rollup surface: downstream window math (lag,
    moving averages) is only correct over gap-free series."""
    orders = load_table(spark, sf_dir, "orders")
    month = F.trunc("o_orderdate", "month")
    monthly = orders.groupBy(
        F.col("o_orderpriority").alias("priority"), month.alias("month")
    ).agg(F.count("*").alias("n_orders"))
    bounds = orders.agg(
        F.min(month).alias("mn"), F.max(month).alias("mx")
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(mn, mx, interval 1 month)")).alias("month")
    )
    prios = orders.select(F.col("o_orderpriority").alias("priority")).distinct()
    grid = spine.crossJoin(F.broadcast(prios))
    return grid.join(F.broadcast(monthly), ["priority", "month"], "left").select(
        "priority",
        "month",
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias("n_orders"),
    )


def q_salted_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted JOIN (operators/skew.py::salted_broadcast_left):
    the orders fact salted over 16 partitions, the customer dim replicated
    once per salt, joined on (custkey, salt) — the manual hot-key defence
    when AQE's runtime skew split isn't available (e.g. a non-AQE engine
    or a streaming micro-batch). The oracle is the PLAIN join: salting
    must be invisible in the result."""
    from .operators.skew import salted_broadcast_left

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_broadcast_left(orders, cust, "o_custkey", "c_custkey")
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(_D14)).cast("double").alias("total_value"),
    )


def q_priority_trailing_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per order priority, the count of orders in
    the trailing 7 *days* (not 7 rows) at each distinct order date.

    Spark's rangeBetween is numeric, so the frame orders by epoch days —
    value-identical to DuckDB's ``RANGE BETWEEN INTERVAL 6 DAYS
    PRECEDING``. Runs over the (priority, date) daily aggregate, so the
    window input is bounded by the calendar, not the fact table."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(F.count("*").alias("n_day"))
    w = (
        Window.partitionBy("priority")
        .orderBy(F.unix_date(F.col("day")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "priority",
        "day",
        "n_day",
        F.sum("n_day").over(w).cast("bigint").alias("n_trailing_7d"),
    )


def q_part_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long): each part's numeric columns melted into
    (metric, value) rows via ``stack`` — the inverse of the pivot surface
    (``events_pivot``). Map-side only: no shuffle, output = 2 rows/part."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.expr(
            "stack(2, 'size', CAST(p_size AS DOUBLE), "
            "'retailprice', CAST(p_retailprice AS DOUBLE)) AS (metric, value)"
        ),
    )


def q_status_priority_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — (status), (priority), and the grand total
    in ONE pass (an Expand node feeding a single shuffle, not three
    jobs). ``grouping_id`` disambiguates the set each row came from;
    NULLs from the expansion are labelled so the oracle compare is
    unambiguous."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_D14)).cast("double").alias("total_value"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias("priority"),
            "gid",
            "n_orders",
            "total_value",
        )
    )


ANALYTICS5_QUERIES = {
    "mom_revenue_growth": q_mom_revenue_growth,
    "moving_avg_3m": q_moving_avg_3m,
    "customer_spend_ntile": q_customer_spend_ntile,
    "pricey_parts_dense": q_pricey_parts_dense,
    "qty_median_by_flag": q_qty_median_by_flag,
    "monthly_gapfill": q_monthly_gapfill,
    "salted_join_segments": q_salted_join_segments,
    "priority_trailing_week": q_priority_trailing_week,
    "part_metrics_unpivot": q_part_metrics_unpivot,
    "status_priority_sets": q_status_priority_sets,
}

ANALYTICS5_ORACLES = {
    "mom_revenue_growth": """
        SELECT month,
               CAST(rev_dec AS DOUBLE) AS revenue,
               round(CAST((rev_dec - lag(rev_dec) OVER (ORDER BY month)) * 100.0
                          / lag(rev_dec) OVER (ORDER BY month) AS DOUBLE), 6)
                   AS growth_pct
        FROM (
            SELECT date_trunc('month', o_orderdate) AS month,
                   sum(CAST(o_totalprice AS DECIMAL(14,2))) AS rev_dec
            FROM orders GROUP BY 1
        )
    """,
    "moving_avg_3m": """
        SELECT priority, month, n_orders,
               round(avg(n_orders) OVER (
                   PARTITION BY priority ORDER BY month
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS ma3
        FROM (
            SELECT o_orderpriority AS priority,
                   date_trunc('month', o_orderdate) AS month,
                   count(*) AS n_orders
            FROM orders GROUP BY 1, 2
        )
    """,
    "customer_spend_ntile": """
        SELECT custkey,
               CAST(spend_dec AS DOUBLE) AS total_spend,
               CAST(ntile(4) OVER (ORDER BY spend_dec DESC, custkey ASC) AS BIGINT)
                   AS spend_quartile
        FROM (
            SELECT o_custkey AS custkey,
                   sum(CAST(o_totalprice AS DECIMAL(14,2))) AS spend_dec
            FROM orders GROUP BY 1
        )
    """,
    "pricey_parts_dense": """
        SELECT p_type, p_partkey, p_retailprice, price_rank
        FROM (
            SELECT p_type, p_partkey, p_retailprice,
                   CAST(dense_rank() OVER (
                       PARTITION BY p_type ORDER BY p_retailprice DESC
                   ) AS BIGINT) AS price_rank
            FROM part
        )
        WHERE price_rank <= 3
    """,
    "qty_median_by_flag": """
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.25), 6) AS q1,
               round(quantile_cont(l_quantity, 0.5), 6) AS median,
               round(quantile_cont(l_quantity, 0.75), 6) AS q3,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "monthly_gapfill": """
        WITH monthly AS (
            SELECT o_orderpriority AS priority,
                   date_trunc('month', o_orderdate) AS month,
                   count(*) AS n_orders
            FROM orders GROUP BY 1, 2
        ),
        bounds AS (
            SELECT min(date_trunc('month', o_orderdate)) AS mn,
                   max(date_trunc('month', o_orderdate)) AS mx
            FROM orders
        ),
        spine AS (
            SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) AS DATE)
                       AS month
            FROM bounds
        ),
        prios AS (SELECT DISTINCT o_orderpriority AS priority FROM orders)
        SELECT priority, month, coalesce(n_orders, 0) AS n_orders
        FROM spine CROSS JOIN prios
        LEFT JOIN monthly USING (priority, month)
    """,
    "salted_join_segments": """
        SELECT c_mktsegment AS segment,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
                   AS total_value
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "priority_trailing_week": """
        SELECT priority, day, n_day,
               CAST(sum(n_day) OVER (
                   PARTITION BY priority ORDER BY day
                   RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_trailing_7d
        FROM (
            SELECT o_orderpriority AS priority,
                   CAST(o_orderdate AS DATE) AS day,
                   count(*) AS n_day
            FROM orders GROUP BY 1, 2
        )
    """,
    "part_metrics_unpivot": """
        SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
        FROM part
        UNION ALL
        SELECT p_partkey, 'retailprice' AS metric,
               CAST(p_retailprice AS DOUBLE) AS value
        FROM part
    """,
    "status_priority_sets": """
        SELECT coalesce(o_orderstatus, '<all>') AS status,
               coalesce(o_orderpriority, '<all>') AS priority,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
                    AS BIGINT) AS gid,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
                   AS total_value
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
}
