"""Spark 4 Python DataSource for the (simulated) MyFitnessPal API —
the native implementation of the reference's scrape source.

Reference: the Prefect task fan-out ``get_myfitnesspal_day.map(dates)``
(`/root/reference/myfitnesspaw/flows.py:50-55`, `tasks.py:339-362`).
Where ``sources/mfp_source.py`` expresses the fetch as mapInPandas over
a requests DataFrame, this registers a first-class
``spark.read.format("mfp_api")`` source: option-driven (user range +
date window), partitioned one-(user,date-window)-slice per input
partition so a 1000-executor cluster fans the scrape out naturally,
and schema-declared so downstream stays columnar.

The per-day payload comes from the same deterministic fake client, so
results stay oracle-checkable; a real deployment swaps the client for
the HTTP call inside ``read`` (with per-call retry/backoff) and
nothing else changes.
"""

from __future__ import annotations

from datetime import date as _date, timedelta

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from myfitnesspaw_spark.sources.mfp_source import _fake_client_day

_SCHEMA_DDL = (
    "user_id BIGINT, date DATE, n_meals INT, total_calories BIGINT, "
    "cardio_minutes BIGINT, strength_minutes BIGINT, water BIGINT"
)


class _UserSlice(InputPartition):
    def __init__(self, user_lo: int, user_hi: int, d_from: _date, d_to: _date):
        self.user_lo = user_lo
        self.user_hi = user_hi
        self.d_from = d_from
        self.d_to = d_to


class MfpApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.users = int(options.get("users", "10"))
        self.d_from = _date.fromisoformat(options.get("from", "2024-01-01"))
        self.d_to = _date.fromisoformat(options.get("to", "2024-01-07"))
        self.slices = int(options.get("numpartitions", "8"))

    def partitions(self):  # noqa: D102 — fan-out unit: a user range
        per = max(1, -(-self.users // self.slices))
        return [
            _UserSlice(lo, min(lo + per, self.users), self.d_from, self.d_to)
            for lo in range(0, self.users, per)
        ]

    def read(self, partition: _UserSlice):  # noqa: D102
        day = partition.d_from
        while day <= partition.d_to:
            for uid in range(partition.user_lo, partition.user_hi):
                rec = _fake_client_day(uid, day)
                yield (
                    uid,
                    day,
                    len(rec["meals"]),
                    sum(m["calories"] for m in rec["meals"]),
                    rec["exercises"][0]["minutes"],
                    rec["exercises"][1]["minutes"],
                    rec["water"],
                )
            day += timedelta(days=1)


class MfpApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "mfp_api"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema) -> MfpApiReader:
        return MfpApiReader(self.options)

    def simpleStreamReader(self, schema) -> "MfpApiStreamReader":
        return MfpApiStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the custom source."""
    spark.dataSource.register(MfpApiDataSource)


# --- streaming form --------------------------------------------------------
# The same source as a Structured Streaming reader: offsets are ISO
# dates, each read drains the remaining backlog in one deterministic
# batch (so an availableNow run is exactly the batch result), and
# readBetweenOffsets replays any committed range for recovery — the
# contract a real incremental-scrape deployment needs.

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class MfpApiStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.users = int(options.get("users", "10"))
        self.d_from = _date.fromisoformat(options.get("from", "2024-01-01"))
        self.d_to = _date.fromisoformat(options.get("to", "2024-01-07"))

    def initialOffset(self) -> dict:
        return {"next": self.d_from.isoformat()}

    def _rows(self, d_from: _date, d_to: _date):
        day = d_from
        while day <= d_to:
            for uid in range(self.users):
                rec = _fake_client_day(uid, day)
                yield (
                    uid,
                    day,
                    len(rec["meals"]),
                    sum(m["calories"] for m in rec["meals"]),
                    rec["exercises"][0]["minutes"],
                    rec["exercises"][1]["minutes"],
                    rec["water"],
                )
            day += timedelta(days=1)

    def read(self, start: dict):
        day = _date.fromisoformat(start["next"])
        if day > self.d_to:
            return [], start
        end = {"next": (self.d_to + timedelta(days=1)).isoformat()}
        # A LIST, not a generator: prefetched rows are pickled into the
        # stream's offset cache for exactly-once replay.
        return list(self._rows(day, self.d_to)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        lo = _date.fromisoformat(start["next"])
        hi = _date.fromisoformat(end["next"]) - timedelta(days=1)
        return list(self._rows(lo, hi))

    def commit(self, end: dict) -> None:
        pass
