"""Testdata table loaders.

The driver provides deterministic star-schema parquet under
``/root/testdata/sf*/`` (TESTDATA.md).  Loading is a plain
``spark.read.parquet`` — columnar scan with predicate pushdown and
column pruning for free; every query should show ``PushedFilters`` /
a narrow ``ReadSchema`` in its physical plan.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table.

    ``events.ts`` is parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it scans as epoch-nanos
    BIGINT, which we truncate to microseconds — exactly what DuckDB's
    TIMESTAMP (µs) does — so argmax-by-ts and window semantics agree
    with the oracle.

    The conf is set here, at read time (it is runtime-settable), not
    only at session build: the driver invokes queries with its own
    SparkSession, which would otherwise reject the nanos column with
    PARQUET_TYPE_ILLEGAL.
    """
    if name == "events":
        # Legacy layout tolerance: TIMESTAMP(NANOS) footers are rejected
        # by the vectorized reader unless scanned as epoch-nanos BIGINT.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) scanned as epoch-nanos.  Integer DIV, not
            # `/`: epoch-nanos (~1.7e18) exceeds double's exact-integer
            # range, so float division would lose precision.  The
            # LTZ→NTZ cast reads through the session zone — pin UTC so
            # a caller-provided session's zone can't shift the cells.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"),
            )
        elif ts_type == "timestamp":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        # timestamp_ntz (TIMESTAMP(MICROS, no zone) footers) passes
        # through untouched — already DuckDB TIMESTAMP semantics and
        # independent of every session/JVM/driver time zone, collect
        # included.
    return df


def scatter(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to the cluster's parallelism.

    Small tables arrive as ONE parquet split, so every narrow op
    downstream — shingling, hashing, Pandas UDF decode — runs on one
    core until the first shuffle.  CPU-heavy per-row pipelines call
    this right after the scan; at real scale the scan has many splits
    and this becomes a near-no-op rebalance (AQE folds it away when
    input partitioning already suffices is NOT true — it is an
    explicit exchange — so only use it ahead of work that dwarfs one
    extra shuffle of the input)."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register testdata tables as temp views for the SQL API."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
