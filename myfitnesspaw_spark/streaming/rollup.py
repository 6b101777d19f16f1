"""Structured Streaming ingestion variant (SURVEY.md §2.9 extension).

The reference is scheduled batch with an incremental window — "late"
data is handled by re-scraping the last 6 days and upserting
(`/root/reference/myfitnesspaw/tasks.py:260-262`, `sql.py:151-154`).
The streaming-native equivalent: ``readStream`` over the events table,
event-time watermark standing in for the lookback window, tumbling
windows for the per-period rollup.

At scale this is the real shape: a file/Kafka stream, watermark
bounding state, partial aggregation before the shuffle on
(window, event_type).  On the test harness the stream is driven with
``trigger(availableNow=True)`` so it drains the backlog and stops —
the query function stays a plain ``(spark, sf_dir) -> DataFrame``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from myfitnesspaw_spark.functions.numeric import money_cents

def _events_raw_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet, normalized to the same
    TIMESTAMP_NTZ ``ts`` the batch loader produces (sources/tables.py).

    File streams need an explicit schema, and the testdata's physical
    layout has shipped both as TIMESTAMP(NANOS) (scannable only as
    epoch-nanos BIGINT) and as TIMESTAMP(MICROS, no zone) — so sniff
    the footer through a one-off batch read and declare accordingly.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_ts = dict(spark.read.parquet(f"{sf_dir}/events.parquet").dtypes)["ts"]
    ts_type: T.DataType = {
        "bigint": T.LongType(),
        "timestamp": T.TimestampType(),
    }.get(raw_ts, T.TimestampNTZType())
    # File streaming sources list a directory; select just the events
    # file out of the shared sf_dir with a glob filter.
    raw = (
        spark.readStream.schema(_events_raw_schema(ts_type))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if raw_ts == "bigint":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        raw = raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
        )
    elif raw_ts == "timestamp":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return raw


def streaming_hourly_rollup(
    spark: SparkSession,
    sf_dir: str,
    watermark: str = "1 hour",
    sink_name: str = "streaming_hourly_rollup_sink",
) -> DataFrame:
    """Tumbling 1-hour rollup per event_type, executed as a real
    Structured Streaming query (memory sink, availableNow trigger),
    returned as the finished batch DataFrame.

    ``complete`` output mode so every window is emitted even though
    the backlog drains in one trigger (append mode would hold back
    windows newer than the final watermark).  Money sums go through
    exact integer cents (functions/numeric.py) for oracle parity.
    """
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money_cents(F.col("value"))).alias("value_cents"),
        )
    )
    # The state-store partition count is frozen at the query's first
    # run from spark.sql.shuffle.partitions; size it to the cluster
    # (a caller-provided session may still carry the 200 default).
    old_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
    )
    try:
        query = (
            agg.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        if old_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return spark.table(sink_name).select(
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "event_type",
        "n_events",
        "value_cents",
        (F.col("value_cents") / 100.0).alias("value_sum"),
    )


def streaming_sliding_rollup(
    spark: SparkSession,
    sf_dir: str,
    watermark: str = "1 hour",
    sink_name: str = "streaming_sliding_rollup_sink",
) -> DataFrame:
    """Sliding-window rollup (2-hour windows every hour) per event_type
    — each event lands in exactly two overlapping windows.

    Same execution shape as the tumbling rollup (real streaming query,
    memory sink, availableNow); the slide multiplies state rows by
    window/slide = 2×, which the watermark still bounds — the scale
    knob a 100 TB stream cares about.
    """
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money_cents(F.col("value"))).alias("value_cents"),
        )
    )
    old_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
    )
    try:
        query = (
            agg.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        if old_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return spark.table(sink_name).select(
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n_events",
        "value_cents",
    )


def streaming_dedup_counts(
    spark: SparkSession,
    sf_dir: str,
    sink_name: str = "streaming_dedup_counts_sink",
) -> DataFrame:
    """Watermarked streaming DEDUPLICATION chained into an aggregate —
    two stateful operators in one query (Spark 3.4+): dropDuplicates
    keeps the first (user, minute, type) arrival, the rollup counts
    survivors per type.

    Which physical row survives depends on arrival order, so only
    KEY-determined outputs (here: key counts) are exposed — the
    deterministic contract any streaming-dedup consumer at scale
    should hold itself to.  The watermark bounds dedup state to one
    hour of keys.
    """
    events = read_events_stream(spark, sf_dir)
    dedup = (
        events.withColumn("minute", F.date_trunc("minute", F.col("ts")))
        .withWatermark("minute", "1 hour")
        .dropDuplicates(["user_id", "minute", "event_type"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_user_minutes"))
    )
    old_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
    )
    try:
        query = (
            dedup.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        if old_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return spark.table(sink_name)
