"""Temporal join operators Spark lacks natively: as-of join.

The scalable shape is NOT a range-join (which Catalyst would plan as a
broadcast-nested-loop or an exploded equi-range): tag both sides, union
them, and carry the right side's payload forward with one
``last(ignorenulls)`` window per key — a single shuffle on the join
key, linear work per partition, no pair blow-up.  This is the standard
distributed as-of formulation (kdb's aj / pandas merge_asof semantics,
"backward" direction).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    right_value_cols: Sequence[str],
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` within the same key group (NULLs when no
    prior right row exists) — a left as-of join.

    Both inputs must share ``on`` + ``ts_col`` names;
    ``right_value_cols`` are carried onto the left rows as
    ``asof_<name>``.  Equal timestamps match (right sorts before left
    at ties).  Duplicate right rows on the same (key, ts) are
    ambiguous — pre-dedupe.

    The payload travels as ONE struct under a single
    ``last(ignorenulls)`` — per-column carries could stitch together
    values from different right rows when a carried column is NULL.
    """
    lcols = list(left.columns)
    payload = F.struct(*[F.col(c) for c in right_value_cols])
    l = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.select(payload).schema[0].dataType).alias("__r"),
    )
    r = right.select(
        *[
            F.col(c) if c in (*on, ts_col)
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        payload.alias("__r"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_col, "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *lcols, "__side", F.last("__r", ignorenulls=True).over(w).alias("__r")
    )
    return carried.where(F.col("__side") == 1).select(
        *lcols,
        *[F.col(f"__r.{c}").alias(f"asof_{c}") for c in right_value_cols],
    )
