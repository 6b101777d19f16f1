"""Referential-integrity queries: FK orphan audit and cascade-delete
consistency.

Reference relation: the reference enforces FKs in SQLite — every
silver table declares ``FOREIGN KEY ... REFERENCES RawDayData ON
DELETE CASCADE`` (`/root/reference/myfitnesspaw/sql.py:28-31`) and
``INSERT OR REPLACE`` on a bronze day implicitly cascade-deletes its
children (`sql.py:151-154`), gated per-connection by ``PRAGMA
foreign_keys`` (`tasks.py:125-127`).  Spark enforces nothing, so the
engine makes both halves explicit (SURVEY §7.4):

- the AUDIT is a standing data-quality gate — LEFT ANTI join of every
  child table against its parent's keys, counting violations;
- the CASCADE is an explicit keyed delete — the same anti join applied
  to the children of replaced parents (operators/incremental.py
  ``replace_by_keys`` is the write-path form).

Scale shape: each audit edge is one anti join.  Parent KEY SETS are
projection-pruned to the key column before joining, so dimension-sized
parents broadcast; the fact-fact edge (lineitem→orders) shuffles on
the join key — the same key the tables would be bucketed on
(sinks/warehouse.py), which makes the audit shuffle-free against a
bucketed warehouse.  Counts aggregate map-side; the result is
edge-cardinality, never row-cardinality.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myfitnesspaw_spark.sources import load_table

# FK edges of the star schema: (child, fk col, parent, pk col).
_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per FK edge: total child rows and FK violations (child
    rows whose key has no parent) — 0 violations on consistent data."""
    parts = []
    for child, fk, parent, pk in _EDGES:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(F.col(pk).alias(fk)).distinct()
        orphans = c.join(p, fk, "left_anti")
        parts.append(
            c.agg(
                F.lit(f"{child}.{fk}").alias("fk_edge"),
                F.count(F.lit(1)).alias("n_rows"),
            ).crossJoin(orphans.agg(F.count(F.lit(1)).alias("n_orphans")))
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


FK_ORPHAN_AUDIT_ORACLE = """
SELECT 'lineitem.l_orderkey' AS fk_edge, COUNT(*) AS n_rows,
       COUNT(*) FILTER (WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
         AS n_orphans
FROM lineitem
UNION ALL
SELECT 'orders.o_custkey', COUNT(*),
       COUNT(*) FILTER (WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
FROM orders
UNION ALL
SELECT 'customer.c_nationkey', COUNT(*),
       COUNT(*) FILTER (WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
FROM customer
UNION ALL
SELECT 'supplier.s_nationkey', COUNT(*),
       COUNT(*) FILTER (WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation))
FROM supplier
UNION ALL
SELECT 'nation.n_regionkey', COUNT(*),
       COUNT(*) FILTER (WHERE n_regionkey NOT IN (SELECT r_regionkey FROM region))
FROM nation
"""


# --- cascade_delete_consistency -------------------------------------------
# Replay the reference's replace-a-window semantics on the star data:
# parents (orders) in the replaced window are deleted; WITH cascade the
# children (lineitem) of those parents are deleted too and the audit
# stays clean; WITHOUT cascade (the reference's own behavior when the
# FK pragma is off — it would silently duplicate/orphan children,
# SURVEY §7.4) the orphan count is the deleted parents' child count.

DOOMED_FROM = "1995-01-01"
DOOMED_TO = "1995-03-31"


def cascade_delete_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    doomed = orders.where(
        F.col("o_orderdate").cast("date").between(DOOMED_FROM, DOOMED_TO)
    ).select("o_orderkey")

    orders_after = orders.join(doomed, "o_orderkey", "left_anti")
    li_cascaded = lineitem.join(
        doomed.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_anti"
    )

    surviving_keys = orders_after.select(F.col("o_orderkey").alias("l_orderkey"))
    orphans_with = li_cascaded.join(surviving_keys, "l_orderkey", "left_anti")
    orphans_without = lineitem.join(surviving_keys, "l_orderkey", "left_anti")

    def counted(name: str, before: DataFrame, after: DataFrame, orph_w, orph_wo):
        return (
            before.agg(
                F.lit(name).alias("table_name"),
                F.count(F.lit(1)).alias("rows_before"),
            )
            .crossJoin(after.agg(F.count(F.lit(1)).alias("rows_after")))
            .crossJoin(orph_w.agg(F.count(F.lit(1)).alias("orphans_with_cascade")))
            .crossJoin(orph_wo.agg(F.count(F.lit(1)).alias("orphans_without_cascade")))
        )

    zero = spark.range(0)  # parents cannot be orphaned by this delete
    return counted("orders", orders, orders_after, zero, zero).unionByName(
        counted("lineitem", lineitem, li_cascaded, orphans_with, orphans_without)
    )


CASCADE_DELETE_ORACLE = f"""
WITH doomed AS (
  SELECT o_orderkey FROM orders
  WHERE CAST(o_orderdate AS DATE)
        BETWEEN DATE '{DOOMED_FROM}' AND DATE '{DOOMED_TO}'
),
orders_after AS (
  SELECT * FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM doomed)
),
li_cascaded AS (
  SELECT * FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM doomed)
)
SELECT 'orders' AS table_name,
       (SELECT COUNT(*) FROM orders) AS rows_before,
       (SELECT COUNT(*) FROM orders_after) AS rows_after,
       0 AS orphans_with_cascade,
       0 AS orphans_without_cascade
UNION ALL
SELECT 'lineitem',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM li_cascaded),
       (SELECT COUNT(*) FROM li_cascaded
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders_after)),
       (SELECT COUNT(*) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders_after))
"""
