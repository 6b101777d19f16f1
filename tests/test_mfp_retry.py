"""S1/S2 fetch retry contract (SURVEY.md §2.1): the reference wraps the
flaky MFP scrape in ``@task(timeout=15, max_retries=5, retry_delay=15s)``
(`/root/reference/myfitnesspaw/tasks.py:339-344`).  The engine's twin is
per-call retry inside the ``mapInPandas`` worker, escalating to Spark
task retries only on exhaustion — these tests inject transient failures
and assert both halves of that ladder."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myfitnesspaw_spark.sources.mfp_source import _fake_client_day, fetch_days


def _flaky_client(fail_times: int):
    """Client failing the first ``fail_times`` attempts per (user, day).

    The attempts dict lives in the closure: cloudpickle ships one copy
    per Spark task, and the retry loop re-calls within the same worker
    process, so attempt counts accumulate exactly as a real transient
    outage would look to one executor."""
    attempts: dict = {}

    def client(user_id, day):
        key = (user_id, day)
        n = attempts.get(key, 0)
        attempts[key] = n + 1
        if n < fail_times:
            raise ConnectionError(f"transient failure {key} attempt {n}")
        return _fake_client_day(user_id, day)

    return client


def _requests(spark):
    return spark.range(6).select(
        (F.col("id") + 1).alias("user_id"),
        F.date_add(F.lit("2024-03-01").cast("date"), F.col("id").cast("int")).alias(
            "date"
        ),
    )


def test_flaky_calls_retry_and_succeed(spark):
    """3 transient failures per call < max_retries=5 → job succeeds and
    the output equals the clean-client run exactly."""
    flaky = fetch_days(
        _requests(spark), fetch_partitions=2, client=_flaky_client(3), max_retries=5
    )
    clean = fetch_days(_requests(spark), fetch_partitions=2)
    cols = ["user_id", "date", "water"]
    assert sorted(map(tuple, flaky.select(*cols).collect())) == sorted(
        map(tuple, clean.select(*cols).collect())
    )
    assert flaky.count() == 6


def test_exhausted_retries_escalate(spark):
    """Failures beyond max_retries re-raise out of the kernel, failing
    the Spark task (and, with local maxFailures, the job) — the
    reference's flow-failure semantics."""
    with pytest.raises(Exception, match="transient failure"):
        fetch_days(
            _requests(spark), client=_flaky_client(10), max_retries=2
        ).collect()


def test_deterministic_errors_fail_fast(spark):
    """A non-retryable exception (deterministic client bug) must surface
    on the FIRST attempt — not after max_retries sleeps per (user, day)
    call across the partition."""
    calls: dict = {}

    def broken(user_id, day):
        calls[(user_id, day)] = calls.get((user_id, day), 0) + 1
        raise TypeError("deterministic bug")

    with pytest.raises(Exception, match="deterministic bug"):
        fetch_days(
            _requests(spark), fetch_partitions=1, client=broken, max_retries=5
        ).collect()
    # Executor-side closure copy: counts aren't visible here, so assert
    # the contract locally on the kernel instead.
    from myfitnesspaw_spark.sources.mfp_source import _fetch_batches_fn
    import datetime
    import pandas as pd

    kernel = _fetch_batches_fn(broken, max_retries=5, retry_delay_s=0.0)
    calls.clear()
    with pytest.raises(TypeError):
        list(
            kernel(
                iter(
                    [pd.DataFrame({"user_id": [1], "date": [datetime.date(2024, 3, 1)]})]
                )
            )
        )
    assert calls == {(1, datetime.date(2024, 3, 1)): 1}  # exactly one attempt
