"""In-flight data-quality observation (``DataFrame.observe``).

A 100 TB pipeline cannot afford a second pass to learn what it just
wrote; ``observe`` attaches accumulator-style aggregates that ride the
SAME job as the action — row counts, null counts, value bounds land on
the driver for free when the write/collect finishes.  This is the
engine-side half of a data-quality gate: the caller inspects
``Observation.get`` after the action and aborts/alerts on violation
(the reference runs its checks as separate SELECTs over SQLite;
`/root/reference/myfitnesspaw/sql.py` has no streaming-accumulator
equivalent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame,
    name: str,
    key_col: str,
    value_col: str | None = None,
    extra: list[Column] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach standard quality metrics to ``df``'s next action:
    ``n_rows``, ``n_null_key`` (key completeness), and, when a value
    column is given, ``n_null_value`` / ``value_min`` / ``value_max``.

    Returns ``(observed_df, observation)`` — run ONE action on the
    returned frame, then read ``observation.get``.  Metrics are
    computed inside the existing job (no extra scan, no shuffle: a
    plan-local accumulator aggregate).
    """
    metrics: list[Column] = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(key_col).isNull().cast("long")).alias("n_null_key"),
    ]
    if value_col is not None:
        metrics.extend(
            [
                F.sum(F.col(value_col).isNull().cast("long")).alias("n_null_value"),
                F.min(value_col).alias("value_min"),
                F.max(value_col).alias("value_max"),
            ]
        )
    if extra:
        metrics.extend(extra)
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
