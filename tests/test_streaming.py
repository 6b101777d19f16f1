"""Streaming-specific tests: the stateful-stream sessionizer must
agree with the batch sessionizer on every CLOSED session (its open
sessions stay in state at availableNow shutdown — see
sessionize_stream docstring)."""

from __future__ import annotations

from myfitnesspaw_spark.plans.stream_queries import sessionize_stateful_stream
from myfitnesspaw_spark.sources import load_table
from myfitnesspaw_spark.streaming import sessionize


def test_stateful_stream_matches_batch_closed_sessions(spark, sf_dir):
    batch = sessionize(load_table(spark, sf_dir, "events"), gap_minutes=30)
    batch_rows = {
        (r["user_id"], r["start_ts"], r["end_ts"], r["n_events"], r["value_cents"])
        for r in batch.collect()
    }
    # The stream holds back each user's LAST session (still open).
    last_per_user = {}
    for r in batch.collect():
        cur = last_per_user.get(r["user_id"])
        if cur is None or r["start_ts"] > cur[1]:
            last_per_user[r["user_id"]] = (
                r["user_id"], r["start_ts"], r["end_ts"], r["n_events"], r["value_cents"]
            )
    expected = batch_rows - set(last_per_user.values())

    streamed = sessionize_stateful_stream(spark, sf_dir)
    got = {
        (r["user_id"], r["start_ts"], r["end_ts"], r["n_events"], r["value_cents"])
        for r in streamed.collect()
    }
    assert got == expected


def test_drain_update_merge_empty_stream(spark, tmp_path):
    # A zero-row stream never fires a micro-batch; the pre-seeded empty
    # global view must make the drain return an empty frame instead of
    # raising TABLE_OR_VIEW_NOT_FOUND (ADVICE r3).
    import pyspark.sql.functions as F
    from myfitnesspaw_spark.streaming.rollup import _drain_update_merge

    src = str(tmp_path / "empty_events")
    spark.createDataFrame(
        [], "ts timestamp, event_type string, value double"
    ).write.parquet(src)
    stream = spark.readStream.schema("ts timestamp, event_type string, value double").parquet(src)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _drain_update_merge(agg, ["win", "event_type"], "empty_drain_state", "empty_drain_sink")
    assert out.count() == 0
    assert set(out.columns) == {"win", "event_type", "n_events"}
    # The drain must clean up its global temp view after materializing.
    assert not any(
        t.name == "empty_drain_state" for t in spark.catalog.listTables("global_temp")
    )


def test_drain_update_merge_warns_on_multibatch(spark, tmp_path):
    # A multi-file drain with maxFilesPerTrigger=1 takes >1 micro-batch;
    # the drain must surface the batch-oracle divergence risk as a
    # RuntimeWarning instead of staying silent (ADVICE r3).
    import warnings

    import pyspark.sql.functions as F

    from myfitnesspaw_spark.streaming.rollup import _drain_update_merge

    src = str(tmp_path / "two_file_events")
    base = spark.createDataFrame(
        [("2024-01-01 00:05:00", "click", 1.0), ("2024-01-01 01:05:00", "click", 2.0)],
        "ts_s string, event_type string, value double",
    ).select(F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    base.repartition(2).write.parquet(src)

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = _drain_update_merge(
            agg, ["win", "event_type"], "multibatch_state", "multibatch_sink"
        )
        out.count()
    assert any(
        issubclass(w.category, RuntimeWarning) and "micro-batches" in str(w.message)
        for w in caught
    )
