"""File-format source/sink queries: CSV and JSON-lines round trips and
a partitioned parquet write with partition-pruned read-back.

The reference's I/O surface is a web API in and SQLite out
(`/root/reference/myfitnesspaw/tasks.py:339-362`, `tasks.py:39-128`);
a complete engine also ships the standard file formats.  Each query
WRITES through the format under test into the local warehouse dir and
returns a result computed from the READ-BACK data, so the oracle
(running on the original parquet) certifies the whole write→read loop,
not just the read.

Scale notes: every write is ``mode("overwrite")`` through the normal
committer (the cluster path); reads supply EXPLICIT schemas — schema
inference is a full extra pass over the data at 100 TB, and CSV/JSON
types are lossy without one.  The partitioned variant asserts the
scale property that matters: a filter on the partition column prunes
directories at planning time (PartitionFilters), so a one-status scan
of a 100 TB warehouse touches 1/N of it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myfitnesspaw_spark.functions.numeric import money_cents
from myfitnesspaw_spark.sources import load_table

_WAREHOUSE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "spark-warehouse", "_io_roundtrip")


def _rt_path(name: str, sf_dir: str) -> str:
    """Round-trip dir unique per (scale factor, process): two harnesses
    running the same query concurrently (e.g. tests at sf0.001 while a
    driver sim runs sf0.01) must not overwrite each other's files
    mid-read."""
    sf = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_WAREHOUSE, f"{name}_{sf}_{os.getpid()}")


def csv_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → CSV (header) → read back with explicit schema →
    broadcast join region: certifies the CSV sink+source preserve
    values end-to-end."""
    path = _rt_path("csv_nation", sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    nation.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.schema("n_nationkey int, n_name string, n_regionkey int")
        .option("header", True)
        .csv(path)
    )
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return back.join(
        F.broadcast(region), back.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", "r_name")


CSV_ROUNDTRIP_ORACLE = """
SELECT n.n_nationkey, n.n_name, r.r_name
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
"""


def jsonl_roundtrip_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """purchase events → JSON lines → read back with explicit schema →
    per-user rollup.  The doubles survive because JSON round-trips
    shortest-repr doubles exactly; cents conversion happens after the
    read-back, certifying the stored values."""
    path = _rt_path("jsonl_purchases", sf_dir)
    events = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )
    events.write.mode("overwrite").json(path)
    back = spark.read.schema("event_id long, user_id long, value double").json(path)
    return back.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(money_cents(F.col("value"))).alias("value_cents"),
        F.max("event_id").alias("last_event_id"),
    )


JSONL_ROUNDTRIP_ORACLE = """
SELECT user_id, COUNT(*) AS n_purchases,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       MAX(event_id) AS last_event_id
FROM events WHERE event_type = 'purchase'
GROUP BY 1
"""


def partitioned_orders_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → parquet partitioned by o_orderstatus → read back ONE
    partition → per-priority rollup.

    The status filter lands in PartitionFilters (asserted in
    tests/test_plans.py) — directory pruning, zero data read from the
    other partitions.
    """
    path = _rt_path("orders_by_status", sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    back = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(money_cents(F.col("o_totalprice"))).alias("price_cents"),
    )


PARTITIONED_PRUNE_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
FROM orders WHERE o_orderstatus = 'F'
GROUP BY 1
"""


def schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two parquet batches with DIFFERENT schemas — the second adds
    ``o_totalprice`` — read back together with ``mergeSchema``: the
    evolved read yields the union schema with NULLs where the old
    batch lacks the column.  This is the append-only schema-evolution
    path every long-lived warehouse needs (a 100 TB table is never
    rewritten to add a column; readers must merge footers instead).

    mergeSchema=true costs a footer read per file at planning time, so
    production tables pin the merged schema in a catalog; the per-year
    rollup here certifies values, including NULL o_totalprice for the
    pre-evolution batch, survive the merged read.
    """
    path = _rt_path("schema_evo", sf_dir)
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("long")
    )
    old = orders.where(F.col("o_year") < 1998).select(
        "o_orderkey", "o_custkey", "o_year"
    )
    new = orders.where(F.col("o_year") >= 1998).select(
        "o_orderkey", "o_custkey", "o_year", "o_totalprice"
    )
    old.write.mode("overwrite").parquet(f"{path}/v1")
    new.write.mode("overwrite").parquet(f"{path}/v2")
    back = spark.read.option("mergeSchema", True).parquet(f"{path}/v1", f"{path}/v2")
    return back.groupBy("o_year").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count("o_totalprice").alias("n_priced"),
        F.coalesce(F.sum(money_cents(F.col("o_totalprice"))), F.lit(0)).alias(
            "price_cents"
        ),
    )


SCHEMA_EVOLUTION_ORACLE = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       COUNT(*) AS n_orders,
       COUNT(CASE WHEN EXTRACT(year FROM o_orderdate) >= 1998
                  THEN o_totalprice END) AS n_priced,
       CAST(COALESCE(SUM(CASE WHEN EXTRACT(year FROM o_orderdate) >= 1998
                 THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT)
         AS price_cents
FROM orders
GROUP BY 1
"""


def orc_roundtrip_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → ORC → read back with explicit schema → per-brand rollup:
    the third columnar format the engine ships (ORC's stripe-level
    min/max indexes give the same pushdown story as parquet; the
    filter here lands in the ORC reader's search argument)."""
    path = _rt_path("orc_part", sf_dir)
    part = load_table(spark, sf_dir, "part")
    part.write.mode("overwrite").orc(path)
    back = (
        spark.read.schema(
            "p_partkey long, p_name string, p_brand string, "
            "p_type string, p_size int, p_retailprice double"
        )
        .orc(path)
        .where(F.col("p_size") >= 25)
    )
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(money_cents(F.col("p_retailprice"))).alias("retail_cents"),
        F.max("p_size").alias("max_size"),
    )


ORC_ROUNDTRIP_ORACLE = """
SELECT p_brand, COUNT(*) AS n_parts,
       CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT)
         AS retail_cents,
       MAX(p_size) AS max_size
FROM part WHERE p_size >= 25
GROUP BY 1
"""


def corrupt_record_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bad-record tolerance, the PERMISSIVE contract end-to-end: write
    orders as JSON lines with every 13th record deterministically
    truncated mid-object, read back with an explicit schema plus a
    ``_corrupt_record`` column, and audit — good/corrupt counts, exact
    cents over the good rows only, and the orderkeys RECOVERED from
    the corrupt rows' preserved raw text (regexp over
    ``_corrupt_record``), proving the reader quarantines the byte-
    exact line instead of dropping it.

    At 100 TB this is the ingestion posture: a malformed record must
    cost one quarantined row, never a failed task (FAILFAST) or a
    silent null swallow (DROPMALFORMED with no audit trail).  The
    audit aggregate is one map-side-combined pass; the corrupt-row
    columns stay null whether or not partial-results parsing
    (``spark.sql.json.enablePartialResults``) recovers a field
    prefix, so the output is insensitive to that conf.
    """
    path = _rt_path("corrupt_orders", sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    lines = orders.select(
        F.when(
            F.col("o_orderkey") % 13 == 0,
            F.concat(
                F.lit('{"o_orderkey":'),
                F.col("o_orderkey").cast("string"),
                F.lit(',"o_custkey":<truncated'),
            ),
        )
        .otherwise(
            F.to_json(F.struct("o_orderkey", "o_custkey", "o_totalprice"))
        )
        .alias("value")
    )
    lines.write.mode("overwrite").text(path)
    back = (
        spark.read.schema(
            "o_orderkey long, o_custkey long, o_totalprice double, "
            "_corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return back.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1)).alias("n_good"),
        F.count(F.when(F.col("_corrupt_record").isNotNull(), 1)).alias(
            "n_corrupt"
        ),
        F.sum(
            F.when(
                F.col("_corrupt_record").isNull(),
                money_cents(F.col("o_totalprice")),
            )
        ).alias("good_cents"),
        F.sum(
            F.expr(
                "try_cast(regexp_extract(_corrupt_record,"
                " '\"o_orderkey\":([0-9]+)', 1) AS long)"
            )
        ).alias("corrupt_key_sum"),
    )


CORRUPT_RECORD_ORACLE = """
SELECT CAST(COUNT(CASE WHEN o_orderkey % 13 != 0 THEN 1 END) AS BIGINT) AS n_good,
       CAST(COUNT(CASE WHEN o_orderkey % 13 = 0 THEN 1 END) AS BIGINT) AS n_corrupt,
       CAST(SUM(CASE WHEN o_orderkey % 13 != 0
                THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT)
         AS good_cents,
       CAST(SUM(CASE WHEN o_orderkey % 13 = 0 THEN o_orderkey END) AS BIGINT)
         AS corrupt_key_sum
FROM orders
"""
