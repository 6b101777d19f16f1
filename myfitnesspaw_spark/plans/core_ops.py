"""Named queries exercising the incremental/set operators (SURVEY.md
§2.5, §2.1-S3, §2.2-K2) on the star-schema testdata, each with its
DuckDB oracle.

Fixture roles (FIXTURES.md §5): orders snapshots play RawDayData
(CDC diff + keyed upsert), the events stream plays Measurements
(latest-by-ts argmax), order history plays the backup rotation set
(top-K retention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myfitnesspaw_spark.operators import (
    date_spine,
    diff_new_or_changed,
    latest_by,
    point_lookup,
    topk_per_group,
    upsert_keep_latest,
)
from myfitnesspaw_spark.sources import load_table

# --- D1: CDC diff (anti-join) -------------------------------------------
# "Stored" = orders before 1998; "extracted" = orders before 1999.
# The diff is the 1998 vintage — new-or-changed rows by full payload.

_CUT_STORED = "1998-01-01"
_CUT_EXTRACTED = "1999-01-01"


def cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("date"),
    )
    extracted = orders.where(F.col("date") < _CUT_EXTRACTED)
    stored = orders.where(F.col("date") < _CUT_STORED)
    return diff_new_or_changed(
        extracted, stored, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    )


CDC_DIFF_ORACLE = f"""
WITH o AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         CAST(o_orderdate AS DATE) AS date
  FROM orders
)
SELECT e.* FROM o e
WHERE e.date < DATE '{_CUT_EXTRACTED}'
  AND NOT EXISTS (
    SELECT 1 FROM o s
    WHERE s.date < DATE '{_CUT_STORED}'
      AND s.o_orderkey IS NOT DISTINCT FROM e.o_orderkey
      AND s.o_custkey IS NOT DISTINCT FROM e.o_custkey
      AND s.o_orderstatus IS NOT DISTINCT FROM e.o_orderstatus
      AND s.o_totalprice IS NOT DISTINCT FROM e.o_totalprice
  )
"""


# --- K2: keyed upsert (MERGE emulation) ----------------------------------
# Snapshot v1 = orders before 1999; snapshot v2 = orders from 1998 on,
# with a payload change. Keep-latest per o_orderkey.


def upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("date"),
        "o_totalprice",
    )
    v1 = orders.where(F.col("date") < "1999-01-01").select(
        "o_orderkey", "o_custkey", "date", "o_totalprice", F.lit(1).alias("version")
    )
    v2 = orders.where(F.col("date") >= "1998-01-01").select(
        "o_orderkey",
        "o_custkey",
        "date",
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        F.lit(2).alias("version"),
    )
    return upsert_keep_latest(v1.unionByName(v2), ["o_orderkey"], "version")


UPSERT_ORACLE = """
WITH o AS (
  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS date, o_totalprice
  FROM orders
),
snapshots AS (
  SELECT o_orderkey, o_custkey, date, o_totalprice, 1 AS version
  FROM o WHERE date < DATE '1999-01-01'
  UNION ALL
  SELECT o_orderkey, o_custkey, date, o_totalprice + 1000.0, 2 AS version
  FROM o WHERE date >= DATE '1998-01-01'
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
  FROM snapshots
)
SELECT o_orderkey, o_custkey, date, o_totalprice, version
FROM ranked WHERE rn = 1
"""


# --- D2: date spine + gap detection --------------------------------------

_SPINE_FROM = "1995-01-01"
_SPINE_TO = "1995-12-31"


def date_spine_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    spine = date_spine(spark, _SPINE_FROM, _SPINE_TO)
    per_day = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("date"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return spine.join(per_day, "date", "left").select(
        "date", F.coalesce("n_orders", F.lit(0)).alias("n_orders")
    )


DATE_SPINE_ORACLE = f"""
WITH spine AS (
  SELECT CAST(unnest(generate_series(DATE '{_SPINE_FROM}', DATE '{_SPINE_TO}',
                                     INTERVAL 1 DAY)) AS DATE) AS date
),
per_day AS (
  SELECT CAST(o_orderdate AS DATE) AS date, COUNT(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT s.date, COALESCE(p.n_orders, 0) AS n_orders
FROM spine s LEFT JOIN per_day p ON s.date = p.date
"""


# --- D4: top-K retention (FIFO losers) ------------------------------------
# Reference keeps the newest 5 backups and deletes the rest
# (`_utils.py:43-62`); here: per customer, every order beyond the newest 5.

_KEEP = 5


def topk_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").cast("date").alias("date"),
    )
    return topk_per_group(
        orders,
        ["custkey"],
        [F.col("date").desc(), F.col("o_orderkey").desc()],
        _KEEP,
        beyond=True,
    )


TOPK_RETENTION_ORACLE = f"""
WITH ranked AS (
  SELECT o_orderkey, o_custkey AS custkey, CAST(o_orderdate AS DATE) AS date,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY CAST(o_orderdate AS DATE) DESC, o_orderkey DESC) AS rn
  FROM orders
)
SELECT o_orderkey, custkey, date FROM ranked WHERE rn > {_KEEP}
"""


# --- S3: point lookup ------------------------------------------------------
# A tiny key set (event users shifted so some keys miss) left-joined
# against customer — misses surface as NULL rows, like the reference's
# per-date raw lookups returning None.


def point_lookup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    keys = events.select((F.col("user_id") + 140).alias("c_custkey")).distinct()
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    return point_lookup(keys, customer, ["c_custkey"])


POINT_LOOKUP_ORACLE = """
WITH keys AS (SELECT DISTINCT user_id + 140 AS c_custkey FROM events)
SELECT k.c_custkey, c.c_name, c.c_acctbal
FROM keys k LEFT JOIN customer c ON k.c_custkey = c.c_custkey
"""


# --- Q1b standalone: latest-by argmax --------------------------------------


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return latest_by(events, ["user_id"], "ts", ["event_type", "value"]).select(
        "user_id",
        "event_type",
        "value",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
    )


# NOTE: events.ts is nanosecond parquet; Spark reads µs-truncated, DuckDB
# keeps ns.  Verified: no two events of a user share a microsecond at any
# sf, so the argmax agrees; ts is emitted µs-formatted in both engines.
LATEST_EVENT_ORACLE = """
SELECT user_id,
       max_by(event_type, ts) AS event_type,
       max_by(value, ts) AS value,
       strftime(CAST(max(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_str
FROM events
GROUP BY user_id
"""
