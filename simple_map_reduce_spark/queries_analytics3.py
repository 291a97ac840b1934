"""Analytics batch 3: sessionization, outer joins, conditional aggregation,
CUBE grouping sets, rank/lag/lead windows, range join, discrete quantiles,
calendar rollup, pivot, and string features.

Everything here is oracle-checked (duckdb twin per query). Cross-engine
determinism rules follow ``queries.py``: identical aliases on both sides,
exact decimal arithmetic for money sums, BIGINT casts for conditional
counts (duckdb ``sum(int)`` is HUGEINT), and deterministic tiebreakers in
every window ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.joins import range_join
from .operators.sessions import session_rollup
from .sources.readers import load_table

_D12 = "decimal(12,2)"
_D14 = "decimal(14,2)"


def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30 min) over the event log — batch twin of the
    streaming sessionizer (streaming/events.py). One row per session."""
    ev = load_table(spark, sf_dir, "events")
    return session_rollup(
        ev,
        key_col="user_id",
        ts_col="ts",
        gap_seconds=1800,
        order_tiebreak="event_id",
        value_col="value",
    )


def q_left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join: every customer with order count and spend, zeros
    (not dropped rows) for customers that never ordered."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    total = F.col("o_totalprice").cast(_D14)
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.coalesce(F.sum(total), F.lit(0).cast(_D14)).cast("double").alias("total_spend"),
        )
    )


def q_nation_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates: BUILDING-segment customer count
    vs high-balance supplier count per nation key."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy(F.col("c_nationkey").alias("cn"))
        .agg(F.count("*").alias("n_customers"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("sn"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return (
        cust.join(supp, F.col("cn") == F.col("sn"), "full_outer")
        .select(
            F.coalesce(F.col("cn"), F.col("sn")).cast("int").alias("nationkey"),
            F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
            F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
        )
    )


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-style conditional aggregation: share of January-1998
    revenue from PROMO parts. Part side broadcast; sums exact decimal,
    final ratio in double with identical expression shape both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-02-01").cast("timestamp"))
    )
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    price = F.col("l_extendedprice").cast(_D12)
    disc = F.col("l_discount").cast("decimal(4,2)")
    one = F.lit(1).cast("decimal(4,2)")
    rev = price * (one - disc)
    zero = F.lit(0).cast("decimal(18,4)")
    agg = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
            .cast("double")
            .alias("promo_rev"),
            F.sum(rev).cast("double").alias("total_rev"),
        )
    )
    return agg.select(
        "promo_rev",
        "total_rev",
        (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias("promo_pct"),
    )


def q_flag_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-style CASE-WHEN counting: per return flag, lines on
    urgent/high-priority orders vs the rest."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


def q_qty_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-style correlated aggregate, decorrelated into a join:
    lines with quantity below 20% of their part's average. The comparison
    is kept in exact integer/decimal form (qty*5*cnt < sum_qty) so both
    engines agree at the boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(_D12)
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(qty).alias("sum_qty"), F.count("*").alias("cnt")
    )
    joined = li.join(per_part, F.col("l_partkey") == F.col("pk"))
    outliers = joined.filter(qty * F.lit(5) * F.col("cnt") < F.col("sum_qty"))
    return outliers.agg(
        F.count("*").alias("n_outlier_lines"),
        F.coalesce(
            F.sum(F.col("l_extendedprice").cast(_D12)), F.lit(0).cast(_D12)
        ).cast("double").alias("outlier_revenue"),
    )


def q_sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (l_returnflag, l_linestatus): all four grouping sets in
    one pass (sales_rollup covers ROLLUP; this is the full lattice)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("l_quantity").cast(_D12)).cast("double").alias("sum_qty"),
    )


def q_customer_order_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + lag/lead windows per customer: price rank, previous/next
    order key in date order, and whole days since the previous order."""
    orders = load_table(spark, sf_dir, "orders")
    w_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").cast(_D14).desc(), F.col("o_orderkey")
    )
    w_date = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev_date = F.lag("o_orderdate").over(w_date)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w_price).cast("bigint").alias("price_rank"),
        F.lag("o_orderkey").over(w_date).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w_date).alias("next_orderkey"),
        F.datediff(F.col("o_orderdate").cast("date"), prev_date.cast("date"))
        .cast("bigint")
        .alias("gap_days"),
    )


def q_purchase_click_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (operators/joins.py::range_join): clicks landing in the
    hour after the same user's purchase, counted per purchase event."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("p_end"),
    )
    joined = range_join(
        clicks,
        purchases,
        left_key="c_user",
        right_key="p_user",
        left_point="c_ts",
        right_start="p_ts",
        right_end="p_end",
    )
    return joined.groupBy("purchase_id").agg(F.count("*").alias("n_clicks"))


def q_qty_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete quantiles (type-1, value at ceil(p*n)) of quantity per
    return flag via row_number — no interpolation arithmetic, so the
    selected values are bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    wcnt = Window.partitionBy("l_returnflag")
    ranked = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("qty"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wcnt).alias("n"),
    )
    def pick(p: float, name: str):
        target = F.ceil(F.lit(p) * F.col("n")).cast("bigint")
        return F.min(F.when(F.col("rn") == target, F.col("qty"))).alias(name)
    return ranked.groupBy("flag").agg(
        pick(0.25, "q1"), pick(0.5, "median"), pick(0.75, "q3"),
        F.max("qty").alias("max_qty"),
    )


def q_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup: order count and exact spend per (year, month)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_D14)).cast("double").alias("month_spend"),
        )
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts, one column per event type (explicit
    value list so the output schema is static — required for a pivot to
    be plannable without a driver-side distinct scan)."""
    ev = load_table(spark, sf_dir, "events")
    pivoted = ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count()
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(t) for t in _EVENT_TYPES],
    )


def q_part_name_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function surface (SURVEY.md §2.7 extended): case
    mapping, length, substring, replace, position — all JVM-side."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.regexp_replace("p_name", " ", "_").alias("name_slug"),
        F.instr(F.col("p_name"), "e").cast("bigint").alias("first_e"),
    )


def q_segment_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (EXCEPT): nations with a BUILDING customer but no
    AUTOMOBILE customer — completes the §2.6 set-op surface (union and
    intersect are covered elsewhere)."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    return a.subtract(b)  # EXCEPT (set semantics: distinct result)


def q_priority_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit UNION ALL of two filtered scans (the reference's reduce
    phase is an append-union, SURVEY.md §2.6)."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority"
    )
    high = orders.filter(F.col("o_orderpriority") == "2-HIGH").select(
        "o_orderkey", "o_orderpriority"
    )
    return urgent.unionAll(high)


def q_bigram_docfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: top-20 word bigrams by document frequency (distinct
    docs containing the bigram), deterministic tiebreak on the bigram."""
    from .operators.dedup import shingles

    docs = load_table(spark, sf_dir, "documents")
    bg = shingles(docs, "doc_id", "text", n=2)
    return (
        bg.groupBy(F.col("shingle").alias("bigram"))
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("bigram"))
        .limit(20)
    )


def q_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-style EXISTS: orders placed in 1997 with at least one
    line shipped after the order date, counted per priority. The EXISTS
    decorrelates to a left-semi join whose condition carries a non-equi
    predicate alongside the key."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    sem = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


def q_returned_revenue_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-style: top-20 customers by revenue on returned items
    (l_returnflag = 'R'), deterministic tiebreak on custkey."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    price = F.col("l_extendedprice").cast(_D12)
    disc = F.col("l_discount").cast("decimal(4,2)")
    one = F.lit(1).cast("decimal(4,2)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(price * (one - disc)).cast("double").alias("returned_rev"))
        .orderBy(F.col("returned_rev").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-style HAVING: orders whose total line quantity exceeds
    120, with the customer attached (aggregate → filter → join)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_D12)).alias("total_qty_d"))
        .filter(F.col("total_qty_d") > 120)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "o_orderkey",
            "c_custkey",
            "c_name",
            "o_orderdate",
            F.col("total_qty_d").cast("double").alias("total_qty"),
        )
    )


def q_nation_segment_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: distinct market segments per nation as a SORTED
    list — collect_set is order-nondeterministic across partitions, so the
    sort is what makes the result an engine-independent value. Joined to a
    comma string: the harness canonicalizer hashes scalar cells only (an
    array cell is unhashable — this exact class of red row shipped twice)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
            "segments"
        ),
        F.count("*").alias("n_customers"),
    )


def q_salted_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation through the SALTED two-round path
    (operators/skew.py): events have only 5 distinct types, so a plain
    groupBy lands each type on one reducer — the worst-case skew shape.
    The salted plan spreads each type over 16 partitions and merges
    partials; the oracle (a plain GROUP BY) proves the rewrite is
    result-identical."""
    from .operators.skew import salted_aggregation

    ev = load_table(spark, sf_dir, "events")
    val = F.col("value").cast(_D12)
    out = salted_aggregation(
        ev,
        ["event_type"],
        {
            "cnt": ("sum", F.count("*")),
            "sum_value_d": ("sum", F.sum(val)),
            "max_value": ("max", F.max("value")),
        },
    )
    return out.select(
        "event_type",
        "cnt",
        F.col("sum_value_d").cast("double").alias("sum_value"),
        "max_value",
    )


def q_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (posexplode / UNNEST WITH ORDINALITY shape):
    the first five tokens of each document with their 0-based position."""
    from .functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.posexplode(tokenize("text")).alias("pos", "word"))
        .filter(F.col("pos") < 5)
        .select("doc_id", F.col("pos").cast("int").alias("pos"), "word")
    )


ANALYTICS3_QUERIES = {
    "sessionize_batch": q_sessionize_batch,
    "left_join_order_counts": q_left_join_order_counts,
    "nation_full_outer": q_nation_full_outer,
    "promo_revenue": q_promo_revenue,
    "flag_priority_matrix": q_flag_priority_matrix,
    "qty_outliers": q_qty_outliers,
    "sales_cube": q_sales_cube,
    "customer_order_seq": q_customer_order_seq,
    "purchase_click_burst": q_purchase_click_burst,
    "qty_quartiles": q_qty_quartiles,
    "orders_by_month": q_orders_by_month,
    "events_pivot": q_events_pivot,
    "part_name_features": q_part_name_features,
    "segment_except": q_segment_except,
    "priority_union": q_priority_union,
    "bigram_docfreq": q_bigram_docfreq,
    "nation_segment_list": q_nation_segment_list,
    "salted_type_rollup": q_salted_type_rollup,
    "token_positions": q_token_positions,
    "late_ship_priority": q_late_ship_priority,
    "returned_revenue_top": q_returned_revenue_top,
    "big_orders": q_big_orders,
}

ANALYTICS3_ORACLES = {
    "sessionize_batch": """
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts > lag(ts) OVER w + INTERVAL 1800 SECOND
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
            SELECT user_id, ts, value,
                   CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
            FROM flagged
        )
        SELECT user_id, session_seq,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM numbered GROUP BY user_id, session_seq
    """,
    "left_join_order_counts": """
        SELECT c_custkey, c_name,
               count(o_orderkey) AS order_cnt,
               CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(14,2))),
                             CAST(0 AS DECIMAL(14,2))) AS DOUBLE) AS total_spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
    """,
    "nation_full_outer": """
        WITH c AS (SELECT c_nationkey AS cn, count(*) AS n_customers
                   FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY 1),
             s AS (SELECT s_nationkey AS sn, count(*) AS n_suppliers
                   FROM supplier WHERE s_acctbal > 5000 GROUP BY 1)
        SELECT CAST(coalesce(cn, sn) AS INTEGER) AS nationkey,
               coalesce(n_customers, 0) AS n_customers,
               coalesce(n_suppliers, 0) AS n_suppliers
        FROM c FULL OUTER JOIN s ON cn = sn
    """,
    "promo_revenue": """
        WITH agg AS (
            SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                            THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                 * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                            ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_rev,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                            * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                        AS DOUBLE) AS total_rev
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1998-01-01'
              AND l_shipdate < TIMESTAMP '1998-02-01'
        )
        SELECT promo_rev, total_rev, 100.0 * promo_rev / total_rev AS promo_pct FROM agg
    """,
    "flag_priority_matrix": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_returnflag
    """,
    "qty_outliers": """
        WITH per_part AS (
            SELECT l_partkey AS pk,
                   sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
                   count(*) AS cnt
            FROM lineitem GROUP BY 1
        )
        SELECT count(*) AS n_outlier_lines,
               CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(12,2))),
                             CAST(0 AS DECIMAL(12,2))) AS DOUBLE) AS outlier_revenue
        FROM lineitem JOIN per_part ON l_partkey = pk
        WHERE CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt < sum_qty
    """,
    "sales_cube": """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "customer_order_seq": """
        SELECT o_custkey, o_orderkey,
               CAST(rank() OVER (PARTITION BY o_custkey
                                 ORDER BY CAST(o_totalprice AS DECIMAL(14,2)) DESC,
                                          o_orderkey) AS BIGINT) AS price_rank,
               lag(o_orderkey) OVER w AS prev_orderkey,
               lead(o_orderkey) OVER w AS next_orderkey,
               CAST(date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE),
                              CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "purchase_click_burst": """
        SELECT p.event_id AS purchase_id, count(*) AS n_clicks
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 1 HOUR
        GROUP BY p.event_id
    """,
    "qty_quartiles": """
        WITH ranked AS (
            SELECT l_returnflag AS flag, l_quantity AS qty,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
                   count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM lineitem
        )
        SELECT flag,
               min(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN qty END) AS q1,
               min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN qty END) AS median,
               min(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN qty END) AS q3,
               max(qty) AS max_qty
        FROM ranked GROUP BY flag
    """,
    "orders_by_month": """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(month(o_orderdate) AS INTEGER) AS order_month,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS month_spend
        FROM orders GROUP BY 1, 2
    """,
    "events_pivot": """
        SELECT user_id,
               count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        FROM events GROUP BY user_id
    """,
    "part_name_features": """
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               CAST(length(p_name) AS BIGINT) AS name_len,
               substr(p_name, 1, 4) AS name_prefix,
               replace(p_name, ' ', '_') AS name_slug,
               CAST(strpos(p_name, 'e') AS BIGINT) AS first_e
        FROM part
    """,
    "segment_except": """
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
    "priority_union": """
        SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
    # same shingle construction as the dedup oracles (short docs collapse
    # to their whole token stream), n=2
    "bigram_docfreq": r"""
        WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS t
                     FROM documents),
        bg AS (
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id, unnest(
                    CASE WHEN len(t) >= 2
                         THEN list_transform(range(1, len(t)),
                              i -> concat_ws(' ', t[i], t[i+1]))
                         ELSE [array_to_string(t, ' ')] END) AS shingle
                FROM tok))
        SELECT shingle AS bigram, count(*) AS doc_freq
        FROM bg GROUP BY shingle
        ORDER BY doc_freq DESC, bigram
        LIMIT 20
    """,
    "token_positions": r"""
        SELECT doc_id, CAST(t.i - 1 AS INT) AS pos, tok[t.i] AS word
        FROM (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS tok
              FROM documents) d,
             range(1, 6) t(i)
        WHERE t.i <= len(tok)
    """,
    "salted_type_rollup": """
        SELECT event_type, count(*) AS cnt,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
               max(value) AS max_value
        FROM events GROUP BY event_type
    """,
    "nation_segment_list": """
        SELECT c_nationkey,
               array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
               count(*) AS n_customers
        FROM customer GROUP BY c_nationkey
    """,
    "late_ship_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
    "returned_revenue_top": """
        SELECT c_custkey, c_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                    AS DOUBLE) AS returned_rev
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name
        ORDER BY returned_rev DESC, c_custkey
        LIMIT 20
    """,
    "big_orders": """
        SELECT o_orderkey, c_custkey, c_name, o_orderdate,
               CAST(total_qty_d AS DOUBLE) AS total_qty
        FROM (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty_d
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 120) big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
}
