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

from myfitnesspaw_spark.functions.numeric import ntz_from_us

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
        # Pin UTC in EVERY branch, including the NTZ pass-through:
        # downstream epoch_us / date_format / date_trunc of an NTZ value
        # implicitly round-trip through the session zone, which is not
        # identity for wall-clocks in a zone's DST-skipped hour — a
        # non-UTC caller session would otherwise diverge from the
        # DuckDB oracle.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) scanned as epoch-nanos.  Integer DIV, not
            # `/`: epoch-nanos (~1.7e18) exceeds double's exact-integer
            # range, so float division would lose precision.  Build the
            # NTZ value ARITHMETICALLY (timestamp_add on an NTZ epoch
            # literal) rather than via an LTZ→NTZ cast: the cast reads
            # the session zone lazily at action time, so a caller that
            # re-zones the session between load and collect would shift
            # the cells; the arithmetic form never consults the zone.
            df = df.withColumn("ts", ntz_from_us(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp":
            # unix_micros of a zoned TIMESTAMP is the instant — zone
            # independent — and ntz_from_us rebuilds the UTC wall clock
            # without reading the session zone at eval time.
            df = df.withColumn("ts", ntz_from_us(F.unix_micros(F.col("ts"))))
        # timestamp_ntz (TIMESTAMP(MICROS, no zone) footers) passes
        # through untouched — DuckDB TIMESTAMP cell semantics; the UTC
        # pin above keeps derived expressions zone-stable too.
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


def sf_is_small(sf_dir: str, cutoff: float = 0.1) -> bool:
    """Scale-factor probe for scale-aware plan knobs (salting degree,
    shard fan-out): True when ``sf_dir`` encodes a scale factor ≤
    ``cutoff``.  When the directory name carries no ``sf<k>`` marker
    the scale is UNKNOWN and the answer is False — assume big, the
    conservative direction for skew controls (salting costs G× row
    replication; running it on tiny data wastes a constant, skipping
    it on huge data makes a straggler).

    The marker is matched against the path's BASENAME only, anchored
    at its end (``sf0.01`` or ``corpus_sf0.01``): a large corpus that
    merely lives under a directory whose ancestry mentions ``sf0.1``
    (a copied/derived tree) must not silently disable the hot-key
    guards."""
    import re as _re

    base = os.path.basename(sf_dir.rstrip("/"))
    m = _re.search(r"(?:^|[/_-])sf([0-9.]+?)\.?$", base)
    try:
        return m is not None and float(m.group(1)) <= cutoff
    except ValueError:
        return False


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register testdata tables as temp views for the SQL API."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
