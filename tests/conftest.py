"""Shared test fixtures: one tuned SparkSession per test run, a DuckDB
connection with the testdata views pre-registered (mirroring the
driver's oracle harness), and an oracle-comparison helper."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from myfitnesspaw_spark.session import get_spark
from myfitnesspaw_spark.sources import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("myfitnesspaw_spark_tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "4")))
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(v):
    """Canonicalize a cell type-faithfully, at least as strict as the
    driver's value hash: ints and floats never collide (DuckDB HUGEINT
    surfacing as 618.0 must NOT match Spark's long 618 — ADVICE r01),
    and floats use shortest-round-trip repr so only bit-identical
    doubles compare equal."""
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    return f"s:{v}"


# _type_class moved to myfitnesspaw_spark.typeclass (ADVICE r13:
# scripts/driver_sim.py shares it and must not import the test
# suite); re-exported here for existing imports.
from myfitnesspaw_spark.typeclass import type_class as _type_class


def assert_matches_oracle(spark_df, duck_con, oracle_sql: str) -> None:
    """Mirror of the driver's t2 check: row-count + sorted-column schema
    + order-insensitive value comparison between Spark and DuckDB —
    plus a TYPE-CLASS parity check through DuckDB's Arrow export (the
    path the driver hashes through), which fetchall cannot see."""
    oracle = duck_con.sql(oracle_sql)
    o_cols = sorted(oracle.columns)
    s_cols = sorted(spark_df.columns)
    assert s_cols == o_cols, f"schema mismatch: spark={s_cols} oracle={o_cols}"

    # LIMIT 0 executes trivially but surfaces the exact Arrow types the
    # driver's hash reads (HUGEINT -> float64 etc.).
    arrow_schema = duck_con.sql(
        f"SELECT * FROM ({oracle_sql}) LIMIT 0"
    ).arrow().schema
    s_classes = {f.name: _type_class(f.dataType) for f in spark_df.schema.fields}
    o_classes = {
        name: _type_class(arrow_schema.field(name).type) for name in o_cols
    }
    mismatched = {
        c: (s_classes[c], o_classes[c])
        for c in o_cols
        if s_classes[c] != o_classes[c]
    }
    assert not mismatched, (
        f"type-class mismatch (spark, oracle-arrow): {mismatched} — an "
        f"integer column degrading to float under the driver's Arrow hash "
        f"needs CAST(... AS BIGINT) in the oracle"
    )

    s_rows = [tuple(_canon(r[c]) for c in s_cols) for r in spark_df.collect()]
    o_raw = oracle.fetchall()
    idx = [oracle.columns.index(c) for c in o_cols]
    o_rows = [tuple(_canon(r[i]) for i in idx) for r in o_raw]
    assert len(s_rows) == len(o_rows), f"row count: spark={len(s_rows)} oracle={len(o_rows)}"
    assert sorted(s_rows) == sorted(o_rows), "value mismatch between Spark and oracle"
