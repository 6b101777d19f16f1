"""Simulate the driver's t2 correctness harness.

Builds a PLAIN SparkSession (none of our session.py confs — the driver
uses its own), runs every ``queries()`` entry at sf0.01, runs the
matching ``oracle_sql()`` in DuckDB, and compares row-count + sorted
schema + order-insensitive canonical values.  Run:

    python scripts/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def canon(v):
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        return "f:nan" if math.isnan(v) else f"f:{v!r}"
    return f"s:{v}"


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("driver_sim")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    # The driver's t1 smoke: entry() on sf0.001 must run on THIS
    # vanilla session and return >= 0 rows with a stable schema.  The
    # sim previously skipped it, leaving one of the contract's three
    # functions covered only by the manual skill snippet.
    smoke = entrymod.entry(spark)
    print(f"smoke: entry() {smoke.count()} rows, "
          f"{len(smoke.schema.fields)} columns")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = sorted(sdf.columns)
            s_rows = [tuple(canon(r[c]) for c in s_cols) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            o = con.sql(oracles[name])
            o_cols = sorted(o.columns)
            idx = [o.columns.index(c) for c in o_cols]
            o_rows = [tuple(canon(r[i]) for i in idx) for r in o.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        # Arrow type-class parity (the driver hashes THROUGH Arrow, so
        # e.g. DuckDB HUGEINT surfacing as float64 fails there even
        # when fetchall's Python ints compare clean) — same check as
        # tests/conftest.py::assert_matches_oracle.
        try:
            from myfitnesspaw_spark.typeclass import type_class as _type_class

            arrow_schema = con.sql(
                f"SELECT * FROM ({oracles[name]}) LIMIT 0"
            ).arrow().schema
            s_classes = {
                f.name: _type_class(f.dataType) for f in sdf.schema.fields
            }
            bad_types = {
                c: (s_classes[c], _type_class(arrow_schema.field(c).type))
                for c in o_cols
                if c in s_classes
                and s_classes[c] != _type_class(arrow_schema.field(c).type)
            }
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: type-class check error: {e}")
            failed.append(name)
            continue
        if bad_types:
            print(f"FAIL {name}: arrow type-class {bad_types}")
            failed.append(name)
        elif s_cols != o_cols:
            print(f"FAIL {name}: schema spark={s_cols} oracle={o_cols}")
            failed.append(name)
        elif len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} oracle={len(o_rows)}")
            failed.append(name)
        elif sorted(s_rows) != sorted(o_rows):
            ss, oo = sorted(s_rows), sorted(o_rows)
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(ss, oo)) if a != b)
            print(f"FAIL {name}: value hash; first diff {diff}")
            failed.append(name)
        else:
            print(f"PASS {name} ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
