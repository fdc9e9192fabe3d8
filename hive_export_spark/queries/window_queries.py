"""Window-function queries (SURVEY.md section 2.2: row_number/rank/
dense_rank/lag/lead/aggregates over partitioned, ordered, framed windows).

Determinism convention: every window ORDER BY ends with a unique column
(event_id / o_orderkey) so ties cannot reorder lag/lead/row_number between
engines. Running double sums are safe because the frame fixes the exact
fold order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_export_spark.registry import register
from hive_export_spark.sources import load_table


@register(
    "window_row_number",
    oracle="""
SELECT event_id, user_id,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
FROM events
""",
    doc="sequence numbering per user in event-time order",
)
def window_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select("event_id", "user_id", F.row_number().over(w).alias("rn"))


@register(
    "window_rank_dense",
    oracle="""
SELECT o_orderkey, o_custkey,
       RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
       DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS drnk
FROM orders
""",
    doc="rank and dense_rank per customer by order value",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "window_lag_lead",
    oracle="""
SELECT event_id, user_id, value,
       LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
       LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
FROM events
""",
    doc="previous/next event value per user (session-stitching primitive)",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@register(
    "window_running_sum",
    oracle="""
SELECT event_id, user_id,
       SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_value
FROM events
""",
    doc="running total per user — frame-ordered double sum is "
    "deterministic (identical fold order both engines)",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.sum("value").over(w).alias("running_value")
    )


@register(
    "window_sliding_avg",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
       / COUNT(*) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS avg3
FROM events
""",
    doc="3-row sliding average per user — expressed as decimal SUM / COUNT "
    "(engines disagree on avg(decimal) result scale)",
)
def window_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast("decimal(12,2)")).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("avg3"),
    )


@register(
    "window_ntile_first_last",
    oracle="""
SELECT o_orderkey, o_custkey,
       NTILE(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS quartile,
       FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_order,
       LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
FROM orders
""",
    doc="ntile bucketing + first/last value over full-partition frame",
)
def window_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    w_status = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    w_cust = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_cust_full = w_cust.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w_status).alias("quartile"),
        F.first("o_orderkey").over(w_cust).alias("first_order"),
        F.last("o_orderkey").over(w_cust_full).alias("last_order"),
    )


@register(
    "window_distribution",
    oracle="""
SELECT o_orderkey,
       CUME_DIST() OVER w AS cd,
       PERCENT_RANK() OVER w AS pr
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
    doc="distribution window functions: cume_dist / percent_rank over a "
    "uniquely-ordered partition",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.cume_dist().over(w).alias("cd"),
        F.percent_rank().over(w).alias("pr"),
    )


@register(
    "window_range_frame",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_in_band,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER w AS DOUBLE)
         AS qty_in_band
FROM lineitem
WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_extendedprice
             RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
""",
    doc="RANGE-framed window (value-based frame, not row-based): per "
    "supplier, how many line items fall within a 100-unit price band "
    "below each row, and their quantity sum. RANGE frames include ORDER "
    "BY peers, so ties produce identical results in both engines with no "
    "tiebreaker needed — the opposite of the ROWS-frame convention",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_extendedprice")
        .rangeBetween(-100, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.count("*").over(w).cast("bigint").alias("n_in_band"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)"))
        .over(w)
        .cast("double")
        .alias("qty_in_band"),
    )


@register(
    "window_range_interval",
    oracle="""
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_last_hour,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
    doc="time-interval RANGE frame (RANGE BETWEEN INTERVAL 1 HOUR "
    "PRECEDING): per-user trailing-hour rolling count/sum keyed on "
    "event time — the time-based sibling of the numeric-offset "
    "window_range_frame; the frame follows the ORDER BY timestamp "
    "VALUE, not row positions, so irregular event spacing is handled "
    "exactly. Decimal sums keep the rolling totals hash-stable.",
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    ev.createOrReplaceTempView("__wri_events")
    return ev.sparkSession.sql(
        """
        SELECT event_id, user_id,
               COUNT(*) OVER w AS n_last_hour,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
                 AS sum_last_hour
        FROM __wri_events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    )


@register(
    "window_nth_value",
    oracle="""
SELECT user_id, event_id,
       nth_value(value, 2) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_value,
       nth_value(event_type, 3) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS third_type
FROM events
""",
    doc="nth_value window function over the full-partition frame: the "
    "'second/third event of every user' lookup (NULL when the "
    "partition is shorter). Frame pinned to UNBOUNDED..UNBOUNDED on "
    "both engines — the default frames differ (running vs full), which "
    "silently changes nth_value semantics; (ts, event_id) total order "
    "pins determinism. One user-keyed shuffle.",
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.nth_value("value", 2).over(w).alias("second_value"),
        F.nth_value("event_type", 3).over(w).alias("third_type"),
    )


@register(
    "window_ratio_to_report",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(round(
         CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DOUBLE)
         / CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
             PARTITION BY o_custkey) AS DOUBLE), 6) AS DOUBLE)
         AS share_of_customer
FROM orders
""",
    doc="ratio-to-report window (each order's share of its customer's "
    "total spend): the percent-of-total reporting shape that needs the "
    "whole-partition aggregate alongside every row — one unordered "
    "window, no self-join. Denominator is an exact decimal partition "
    "sum (order-free), so both engines divide bit-identical doubles; "
    "round(6) guards the division.",
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey")
    price = F.col("o_totalprice").cast("decimal(14,2)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            price.cast("double") / F.sum(price).over(w).cast("double"), 6
        ).cast("double").alias("share_of_customer"),
    )
