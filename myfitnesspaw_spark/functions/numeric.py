"""Numeric column helpers shared by the analytic plans.

Cross-engine determinism: the driver hash-compares our Spark results
against a DuckDB oracle, and double SUMs are order-dependent (Spark's
partial aggregation adds in a different order than DuckDB).  Money
aggregates therefore go through exact integer cents — per-row
``ROUND(col * 100)`` (deterministic: identical IEEE ops on identical
input bits in both engines) cast to BIGINT, then an exact integer SUM.
A final ``/ 100.0`` is a single float op on an exact integer, also
deterministic.

Truncation: the reference relies on SQLite ``CAST(x AS INT)`` which
truncates toward zero (`/root/reference/myfitnesspaw/sql.py:222-228`).
Spark's double→long cast also truncates; DuckDB's CAST *rounds*, so
oracle SQL must spell it ``CAST(TRUNC(x) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_cents(col: Column) -> Column:
    """Exact integer cents of a dollar-valued double column."""
    return F.round(col * 100).cast("long")


def trunc_long(col: Column) -> Column:
    """Truncate-toward-zero to BIGINT (SQLite CAST-AS-INT semantics)."""
    return col.cast("long")


def epoch_us(col: Column) -> Column:
    """Exact integer microseconds since epoch for a TIMESTAMP_NTZ column.

    The testdata's ``events.ts`` loads as TIMESTAMP_NTZ (naive µs, the
    same semantics as DuckDB's TIMESTAMP — sources/tables.py), where
    ``unix_micros`` is not applicable (it requires the zoned TIMESTAMP
    type and would make the result depend on the session time zone).
    ``timestamp_diff`` against the epoch literal is zone-independent
    and matches DuckDB ``epoch_us`` bit-for-bit.
    """
    return F.timestamp_diff(
        "MICROSECOND", F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00")), col
    )


def ntz_from_us(col: Column) -> Column:
    """Inverse of :func:`epoch_us` — epoch-µs BIGINT back to
    TIMESTAMP_NTZ, independent of the session time zone (unlike
    ``timestamp_micros``, whose zoned result renders through the
    session zone in ``date_format``)."""
    return F.timestamp_add(
        "MICROSECOND", col, F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00"))
    )
