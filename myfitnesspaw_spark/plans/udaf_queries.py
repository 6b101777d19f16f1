"""Grouped custom aggregation (UDAF surface) via ``applyInPandas``.

The reference's only "UDFs" are plain Python comprehensions
(SURVEY.md §2.9) and every one of them became a native column
expression; this module exercises the one surface a complete engine
still needs for genuinely non-SQL aggregates: an Arrow-batched
grouped-map kernel.  The example — per-customer OLS trend of order
value over time — is chosen to stay oracle-checkable: all moments are
exact Python integers (arbitrary precision), and only the final slope
is one IEEE division, so DuckDB's HUGEINT arithmetic lands on the
bit-identical double.

Scale: ``groupBy(key).applyInPandas`` is one shuffle on the group key
followed by per-group Arrow batches into a Python worker per core.
State is bounded by the largest single group (a customer's orders —
tiny), never the partition, so the kernel holds at any corpus size;
skewed group sizes are AQE's problem, not the kernel's.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myfitnesspaw_spark.functions.numeric import money_cents
from myfitnesspaw_spark.sources import load_table

_SLOPE_SCHEMA = "o_custkey long, n_orders long, slope_cents_per_day double"


def _fit_slope(pdf: pd.DataFrame) -> pd.DataFrame:
    # Shift x/y by the group minimum (slope-invariant) so every moment
    # stays far from int64 range in BOTH engines; Python ints are then
    # exact regardless.
    xs = pdf["x"].tolist()
    ys = pdf["y"].tolist()
    x0, y0 = min(xs), min(ys)
    xs = [x - x0 for x in xs]
    ys = [y - y0 for y in ys]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    den = n * sxx - sx * sx
    if den == 0:  # <2 distinct order dates: slope undefined
        return pd.DataFrame(
            {"o_custkey": [], "n_orders": [], "slope_cents_per_day": []}
        )
    # float()/float() (not int/int) so the rounding matches the
    # oracle's CAST(... AS DOUBLE) / CAST(... AS DOUBLE) exactly.
    slope = float(n * sxy - sx * sy) / float(den)
    return pd.DataFrame(
        {
            "o_custkey": [int(pdf["o_custkey"].iloc[0])],
            "n_orders": [n],
            "slope_cents_per_day": [slope],
        }
    )


def order_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer OLS slope of order value (cents/day), as a grouped
    Arrow kernel — the engine's UDAF surface."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.unix_date(F.col("o_orderdate").cast("date")).alias("x"),
        money_cents(F.col("o_totalprice")).alias("y"),
    )
    return orders.groupBy("o_custkey").applyInPandas(_fit_slope, _SLOPE_SCHEMA)


ORDER_TREND_SLOPE_ORACLE = """
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
b AS (
  SELECT o_custkey,
         CAST(date_diff('day', MIN(d) OVER (PARTITION BY o_custkey), d) AS BIGINT) AS x,
         cents - MIN(cents) OVER (PARTITION BY o_custkey) AS y
  FROM o
),
s AS (
  SELECT o_custkey, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM b GROUP BY 1
)
SELECT o_custkey, CAST(n AS BIGINT) AS n_orders,
       CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
         AS slope_cents_per_day
FROM s
WHERE n * sxx - sx * sx <> 0
"""
