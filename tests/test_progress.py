"""Flagship Q1 (progress report) — oracle match + semantic invariants."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from myfitnesspaw_spark.plans.progress import PROGRESS_ORACLE, progress_report
from tests.conftest import assert_matches_oracle


def test_progress_matches_oracle(spark, duck, sf_dir):
    df = progress_report(spark, sf_dir)
    assert_matches_oracle(df, duck, PROGRESS_ORACLE)


def test_progress_invariants(spark, sf_dir):
    df = progress_report(spark, sf_dir).cache()
    assert df.count() > 0
    # Q1m: NULL deficits excluded.
    assert df.where(F.col("deficit_actual").isNull()).count() == 0
    # day_number may skip values (no-activity days counted before the
    # outer filter, like the reference) but must be strictly increasing
    # per customer.
    w = Window.partitionBy("custkey").orderBy("date")
    bad = (
        df.withColumn("prev", F.lag("day_number").over(w))
        .where(F.col("prev").isNotNull() & (F.col("day_number") <= F.col("prev")))
        .count()
    )
    assert bad == 0
    df.unpersist()
