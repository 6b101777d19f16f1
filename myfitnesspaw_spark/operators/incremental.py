"""Incremental-load / set operators (SURVEY.md §2.5, §2.1-S3, §2.2-K2).

The reference's incremental logic — CDC diffing, keyed upserts, date
windows, top-K retention, point lookups, latest-by-date argmax — as
generic DataFrame combinators.  Everything is expressed with built-in
operators so Catalyst picks the physical strategy; the shuffle keys are
always the logical keys, and small sides are broadcast explicitly.

Scale notes:
- ``diff_new_or_changed`` is a LEFT ANTI join on (key, payload) — at
  100 TB both sides shuffle on the same key, so AQE can pick
  shuffle-hash; no driver-side set materialization like the
  reference's Python set diff (`tasks.py:383-405`).
- ``upsert_keep_latest`` is the parquet-only MERGE emulation (union +
  row_number keep-latest + overwrite) the reference gets from SQLite's
  ``INSERT OR REPLACE`` (`sql.py:151-154`); on Delta it'd be MERGE INTO.
- ``latest_by`` uses the ``max_by`` aggregate, not a window — one
  shuffle, no per-partition sort of the whole history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def diff_new_or_changed(
    extracted: DataFrame, stored: DataFrame, compare_cols: Sequence[str]
) -> DataFrame:
    """CDC diff: rows of ``extracted`` not byte-identical to a stored row.

    Reference: ``filter_new_or_changed_records``
    (`/root/reference/myfitnesspaw/tasks.py:383-405`) — a Python
    list-diff; here a null-safe LEFT ANTI join on all compared columns.
    Sides are aliased: the two inputs usually share lineage (same base
    scan), and unaliased ``df[c]`` references would be ambiguous.
    """
    e, s = extracted.alias("__cdc_e"), stored.alias("__cdc_s")
    cond = None
    for c in compare_cols:
        eq = F.col(f"__cdc_e.{c}").eqNullSafe(F.col(f"__cdc_s.{c}"))
        cond = eq if cond is None else cond & eq
    return e.join(s, cond, "left_anti")


def upsert_keep_latest(
    snapshots: DataFrame, key_cols: Sequence[str], version_col: str
) -> DataFrame:
    """Keyed upsert: keep the highest-version row per key.

    Reference: ``INSERT OR REPLACE INTO RawDayData``
    (`/root/reference/myfitnesspaw/sql.py:151-154`).  MERGE emulation
    for plain parquet: window keep-latest.  ``version_col`` must give a
    total order per key (ties would be nondeterministic).
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(version_col).desc())
    return (
        snapshots.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def date_spine(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Inclusive daily date sequence [start..end] as one column ``date``.

    Reference: ``generate_dates_to_extract``
    (`/root/reference/myfitnesspaw/tasks.py:283-307`).  ``sequence`` +
    ``explode`` — generated on executors, no driver-side list.  A
    reversed range fails fast at plan time, like the reference's
    validation (`tasks.py:301-302`), instead of erroring mid-job.
    """
    from datetime import date as _date

    if _date.fromisoformat(start) > _date.fromisoformat(end):
        raise ValueError(f"reversed date range: {start} > {end}")
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("date")
    )


def topk_per_group(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    beyond: bool = False,
) -> DataFrame:
    """Top-K rows per group (``beyond=True`` → everything *after* the
    newest K — the reference's FIFO retention losers,
    `/root/reference/myfitnesspaw/_utils.py:43-62`).

    ``order_cols`` must be a total order for deterministic results.
    """
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    kept = ranked.where(F.col("__rn") > k if beyond else F.col("__rn") <= k)
    return kept.drop("__rn")


def latest_by(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Argmax: per group, the value columns of the row with max
    ``order_col``.

    Reference: the correlated ``ORDER BY date DESC LIMIT 1`` scalar
    subquery (`/root/reference/myfitnesspaw/sql.py:201`).  ``max_by``
    aggregate — single shuffle, no window sort.
    """
    return df.groupBy(*part_cols).agg(
        *[F.max_by(v, order_col).alias(v) for v in value_cols],
        F.max(order_col).alias(order_col),
    )


def replace_by_keys(
    existing: DataFrame, incoming: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """Keyed replace: drop every existing row whose key appears in
    ``incoming``, then append the incoming rows.

    Reference: ``INSERT OR REPLACE`` with FK cascade delete
    (`/root/reference/myfitnesspaw/sql.py:151-154,28-31`) — replacing
    a bronze day implicitly deletes its silver children before the
    re-insert.  Spark has no FK cascade, so the delete is explicit: a
    LEFT ANTI join against the incoming key set.  Idempotent under
    reprocessing — re-running the same increment cannot duplicate
    children (the reference would duplicate with FKs off, SURVEY §7.4).
    """
    cols = list(key_cols)
    keys = incoming.select(cols).distinct()
    survivors = existing.join(keys, cols, "left_anti")
    return survivors.unionByName(incoming)


def point_lookup(keys: DataFrame, table: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Point lookups: LEFT JOIN a (tiny, broadcast) key set against a
    table, keeping misses as NULL rows.

    Reference: ``mfp_select_raw_days`` loop
    (`/root/reference/myfitnesspaw/tasks.py:656-680`) — a per-key
    SELECT loop; here one scan of the table.

    Spark can't broadcast the *left* side of a left-outer join, and
    shuffling a 100 TB table for a 10-row key set is wrong — so: (1)
    broadcast left-semi join filters the table in a single scan with no
    shuffle, then (2) the tiny key set left-joins the (now small)
    matches to keep misses as NULL rows.
    """
    cols = list(key_cols)
    hits = table.join(F.broadcast(keys.select(cols).distinct()), cols, "left_semi")
    return keys.join(hits, cols, "left")
