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
