"""Simulated MyFitnessPal source: partition-parallel per-(user, day)
fetch via Arrow-batched ``mapInPandas``.

Reference: ``MyfitnesspalClientAdapter.get_myfitnesspaw_day`` +
``get_myfitnesspal_day.map(dates)``
(`/root/reference/myfitnesspaw/_utils.py:81-129`,
`tasks.py:339-362`, `flows.py:50-55`) — an HTTPS scrape per (user,
date) with 15 s timeout / 5 retries, fanned out by Prefect.  The Spark
shape is identical at 100 TB: a requests DataFrame repartitioned for
fetch parallelism, one Python worker per partition issuing the calls,
returning nested day records.  Spark task retries replace Prefect's
``max_retries``; per-call retry/backoff belongs inside the kernel.

The network client is NOT available here, so the kernel calls a
DETERMINISTIC fake client — pure integer arithmetic on (user_id,
date), which keeps the whole downstream pipeline oracle-checkable in
SQL.  A real deployment swaps ``_fake_client_day`` for the HTTP call;
nothing else changes.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from datetime import date as _date

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEAL_NAMES = ["breakfast", "lunch", "dinner"]

DAY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("date", T.DateType()),
        T.StructField(
            "meals",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("calories", T.LongType()),
                        T.StructField(
                            "entries",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("short_name", T.StringType()),
                                        T.StructField("quantity", T.LongType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
        T.StructField(
            "exercises",
            T.ArrayType(  # positional: [0]=cardio, [1]=strength (tasks.py:600,628)
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("minutes", T.LongType()),
                    ]
                )
            ),
        ),
        T.StructField("water", T.LongType()),
    ]
)


def _fake_client_day(user_id: int, day: _date) -> dict:
    """Deterministic stand-in for the MFP web API: every field is a
    closed-form integer function of (user_id, day-of-month), so the
    DuckDB oracle can recompute the pipeline's output exactly."""
    dom = day.day
    n_meals = (user_id + dom) % 3  # 0..2 — zero-meal days exercise explode-drop
    meals = []
    for i in range(n_meals):
        n_entries = (user_id + dom + i) % 2 + 1
        meals.append(
            {
                "name": MEAL_NAMES[i],
                "calories": (user_id * 31 + dom * 7 + i * 13) % 900 + 100,
                "entries": [
                    {"short_name": f"item{j}", "quantity": (user_id + dom + i + j) % 5 + 1}
                    for j in range(n_entries)
                ],
            }
        )
    return {
        "user_id": user_id,
        "date": day,
        "meals": meals,
        "exercises": [
            {"name": "cardio", "minutes": (user_id + dom) % 60},
            {"name": "strength", "minutes": (user_id * 2 + dom) % 45},
        ],
        "water": (user_id + dom) % 5,
    }


# Transient-by-default exception classes worth a retry: connection
# resets, timeouts, and OS-level IO errors (ConnectionError and
# TimeoutError are OSError subclasses; listed for documentation).
# Deterministic bugs (TypeError, auth misconfig) fail FAST instead of
# multiplying failure latency by max_retries sleeps per (user, day)
# call across a partition (ADVICE r3).
RETRYABLE_EXCEPTIONS: tuple[type[BaseException], ...] = (
    ConnectionError,
    TimeoutError,
    OSError,
)


def _fetch_batches_fn(
    client: Callable[[int, _date], dict],
    max_retries: int,
    retry_delay_s: float,
    retryable: tuple[type[BaseException], ...] = RETRYABLE_EXCEPTIONS,
):
    """Build the ``mapInPandas`` kernel with per-CALL retry semantics —
    the engine-side twin of the reference's
    ``@task(timeout=15, max_retries=5, retry_delay=15s)``
    (`/root/reference/myfitnesspaw/tasks.py:339-344`).

    Retries happen INSIDE the Python worker, per (user, day) call: a
    transient client failure costs one sleep + re-call, not a Spark
    task re-run re-fetching the whole partition.  A call that still
    fails after ``max_retries`` raises, escalating to Spark's task
    retry (``spark.task.maxFailures``) and then job failure — the same
    two-level ladder as Prefect task retries over flow failure.
    Request timeout is the client's own parameter (a real HTTP client
    binds its socket timeout; the fake client never blocks), so it is
    not replicated here.
    """

    def _fetch_one(user_id: int, day: _date) -> dict:
        for attempt in range(max_retries + 1):
            try:
                return client(user_id, day)
            except retryable:
                if attempt == max_retries:
                    raise
                if retry_delay_s:
                    time.sleep(retry_delay_s)
        raise AssertionError("unreachable")

    def _fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            days = [
                _fetch_one(int(u), d)
                for u, d in zip(pdf["user_id"], pdf["date"])
            ]
            yield pd.DataFrame(days)

    return _fetch_batches


def fetch_days(
    requests: DataFrame,
    fetch_partitions: int | None = None,
    client: Callable[[int, _date], dict] = _fake_client_day,
    max_retries: int = 5,
    retry_delay_s: float = 0.0,
    retryable: tuple[type[BaseException], ...] = RETRYABLE_EXCEPTIONS,
) -> DataFrame:
    """Fan-out fetch: ``requests(user_id, date)`` → nested day rows.

    ``fetch_partitions`` controls fetch parallelism (the reference's
    ``.map`` fan-out); default leaves the upstream partitioning.
    ``client``/``max_retries``/``retry_delay_s`` expose the reference's
    retry contract (see ``_fetch_batches_fn``); the default retry delay
    is 0 because the default client is deterministic and local.
    ``retryable`` bounds which exception classes are worth a retry —
    anything else (a deterministic client bug) propagates immediately.
    """
    if fetch_partitions:
        requests = requests.repartition(fetch_partitions)
    return requests.mapInPandas(
        _fetch_batches_fn(client, max_retries, retry_delay_s, retryable), DAY_SCHEMA
    )


def serialize_days(days: DataFrame) -> DataFrame:
    """E1: bronze rows ``(user_id, date, rawdaydata)`` — canonical JSON
    replaces jsonpickle (`tasks.py:365-380`)."""
    return days.select(
        "user_id",
        "date",
        F.to_json(F.struct("meals", "exercises", "water")).alias("rawdaydata"),
    )
