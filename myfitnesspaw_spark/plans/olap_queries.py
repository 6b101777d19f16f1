"""OLAP-extension queries: as-of join, rollup and cube aggregates —
standard analytics-engine surface beyond the reference's own SQL
(SURVEY.md §2.9 notes the reference has no grouping sets/rollup/cube;
a complete engine still ships them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myfitnesspaw_spark.operators.temporal import asof_join_backward
from myfitnesspaw_spark.sources import load_table

# --- as-of join: each click ↦ most recent prior error of that user --------


def asof_click_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), "value"
    )
    errors = events.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("err_id"), F.col("value").alias("err_value")
    )
    joined = asof_join_backward(
        clicks, errors, ["user_id"], "ts", ["err_id", "err_value"]
    )
    return joined.select(
        "click_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        "value",
        F.col("asof_err_id").alias("err_id"),
        F.col("asof_err_value").alias("err_value"),
    )


ASOF_CLICK_ERROR_ORACLE = """
WITH clicks AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS click_id, value
  FROM events WHERE event_type = 'click'
),
errors AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS err_id,
         value AS err_value
  FROM events WHERE event_type = 'error'
)
SELECT c.click_id, c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str, c.value,
       e.err_id, e.err_value
FROM clicks c
ASOF LEFT JOIN errors e ON c.user_id = e.user_id AND c.ts >= e.ts
"""


# --- rollup / cube --------------------------------------------------------


def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.grouping_id().alias("gid"),
        )
        .select("l_returnflag", "l_linestatus", "n_items", "sum_qty", "gid")
    )


ROLLUP_SALES_ORACLE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().alias("gid"),
        )
        .select("o_orderstatus", "o_orderpriority", "n_orders", "gid")
    )


CUBE_SALES_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""
