"""Named queries exercising the normalization pipeline (SURVEY.md
§2.3/§2.4: N1-N9, E1/E2, D3, Q2e) on the star-schema testdata.

Each query builds the reference's nested ``MaterializedDay``-style
shape IN-QUERY from relational testdata, runs the normalization
operator under test, and lands back on a relational result whose
DuckDB oracle is a direct relational query — so the oracle checks that
nest → operate → flatten is semantics-preserving, exactly what the
reference's extract_* pipeline must guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from myfitnesspaw_spark.operators.normalize import (
    deserialize_struct,
    filter_nonempty,
    flatten_with_parent,
    nest_children,
    project_map_keys,
    serialize_struct,
    unpivot_map,
)
from myfitnesspaw_spark.sources import load_table

# --- N4/N5: nest → in-array filter → explode → map projection -------------
# Lineitems nest into per-order "meals" (struct with a totals map); the
# falsy-meal drop (`tasks.py:511-516`) becomes a higher-order array
# filter (qty ≥ 25) — orders whose array empties out vanish on explode,
# exactly like the reference comprehension.

_QTY_MIN = 25


def nest_explode_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.create_map(
            F.lit("quantity"), F.col("l_quantity"),
            F.lit("price"), F.col("l_extendedprice"),
        ).alias("totals"),
    )
    nested = nest_children(
        ["l_orderkey"], li, ["l_linenumber", "l_returnflag", "totals"],
        order_within="l_linenumber", array_alias="meals", sort=False,
    )
    kept = nested.select(
        "l_orderkey",
        F.filter("meals", lambda m: m["totals"]["quantity"] >= _QTY_MIN).alias("meals"),
    )
    flat = flatten_with_parent(kept, ["l_orderkey"], "meals", "meal")
    return flat.select(
        "l_orderkey",
        F.col("meal.l_linenumber").alias("linenumber"),
        F.col("meal.l_returnflag").alias("name"),
        F.col("meal.totals").getItem("quantity").alias("quantity"),
        F.col("meal.totals").getItem("price").alias("price"),
    )


NEST_EXPLODE_ORACLE = f"""
SELECT l_orderkey, l_linenumber AS linenumber, l_returnflag AS name,
       l_quantity AS quantity, l_extendedprice AS price
FROM lineitem WHERE l_quantity >= {_QTY_MIN}
"""


# --- N6: two-level nest → double explode ----------------------------------
# days → meals → entries ≙ (custkey,date) → orders → lineitems.


def two_level_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("date").alias("date")
    )
    per_order = nest_children(
        ["l_orderkey"], li, ["l_linenumber", "l_quantity", "l_extendedprice"],
        order_within="l_linenumber", array_alias="entries",
    )
    # Inner join: orders without lineitems drop, like meals without
    # entries produce no MealEntries rows (`tasks.py:547-576`).
    withkeys = orders.join(
        per_order, orders.o_orderkey == per_order.l_orderkey, "inner"
    ).select("o_custkey", "date", "o_orderkey", "entries")
    days = nest_children(
        ["o_custkey", "date"], withkeys, ["o_orderkey", "entries"],
        order_within="o_orderkey", array_alias="orders_arr",
    )
    lvl1 = flatten_with_parent(days, ["o_custkey", "date"], "orders_arr", "o")
    lvl2 = lvl1.select(
        "o_custkey", "date", F.col("o.o_orderkey").alias("o_orderkey"),
        F.explode("o.entries").alias("e"),
    )
    return lvl2.select(
        "o_custkey", "date", "o_orderkey",
        F.col("e.l_linenumber").alias("linenumber"),
        F.col("e.l_quantity").alias("quantity"),
        F.col("e.l_extendedprice").alias("price"),
    )


TWO_LEVEL_EXPLODE_ORACLE = """
SELECT o.o_custkey, CAST(o.o_orderdate AS DATE) AS date, o.o_orderkey,
       l.l_linenumber AS linenumber, l.l_quantity AS quantity,
       l.l_extendedprice AS price
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
"""


# --- N3: map getItem projection (missing key → NULL) ----------------------
# A goals-style map with a conditionally-present key; getItem must give
# NULL on missing keys (``dict.get(k, None)``, `tasks.py:486-491`).


def _goalsish_map():
    always = F.struct(F.lit("acctbal").alias("key"), F.col("c_acctbal").alias("value"))
    sometimes = F.struct(
        F.lit("nationbal").alias("key"),
        F.col("c_nationkey").cast("double").alias("value"),
    )
    entries = F.filter(
        F.array(always, sometimes),
        lambda e: (e["key"] != "nationbal") | (F.col("c_nationkey") % 2 == 0),
    )
    return F.map_from_entries(entries)


def goals_map_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_nationkey"
    )
    mapped = cust.select("c_custkey", _goalsish_map().alias("goals"))
    return project_map_keys(
        mapped, "goals", ["acctbal", "nationbal", "missing"], ["c_custkey"]
    ).select(
        "c_custkey", "acctbal", "nationbal", F.col("missing").cast("double").alias("missing")
    )


GOALS_MAP_ORACLE = """
SELECT c_custkey, c_acctbal AS acctbal,
       CASE WHEN c_nationkey % 2 = 0 THEN CAST(c_nationkey AS DOUBLE) END AS nationbal,
       CAST(NULL AS DOUBLE) AS missing
FROM customer
"""


# --- N9: map unpivot ------------------------------------------------------


def measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_nationkey"
    )
    mapped = cust.select("c_custkey", _goalsish_map().alias("measures"))
    return unpivot_map(mapped, "measures", ["c_custkey"])


MEASURES_UNPIVOT_ORACLE = """
SELECT c_custkey, 'acctbal' AS key, c_acctbal AS value FROM customer
UNION ALL
SELECT c_custkey, 'nationbal' AS key, CAST(c_nationkey AS DOUBLE) AS value
FROM customer WHERE c_nationkey % 2 = 0
"""


# --- N1: non-empty filter -------------------------------------------------
# Notes-style rows where body is '', NULL, or real text; keep real text
# (`tasks.py:431-452`).


def notes_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    noted = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(""))
        .when(F.col("o_orderkey") % 3 == 1, F.lit(None).cast("string"))
        .otherwise(F.col("o_orderpriority"))
        .alias("body"),
    )
    return filter_nonempty(noted, "body")


NOTES_FILTER_ORACLE = """
WITH noted AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN ''
              WHEN o_orderkey % 3 = 1 THEN NULL
              ELSE o_orderpriority END AS body
  FROM orders
)
SELECT o_orderkey, body FROM noted WHERE body IS NOT NULL AND body <> ''
"""


# --- E1/E2: JSON serde round-trip -----------------------------------------

_ORDER_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bronze = serialize_struct(
        orders, ["o_orderkey"], ["o_orderstatus", "o_totalprice", "o_orderpriority"]
    )
    return deserialize_struct(bronze, "payload_json", _ORDER_PAYLOAD_SCHEMA, ["o_orderkey"])


JSON_ROUNDTRIP_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders
"""


# --- E2 on real JSON: extract from events.props ---------------------------


def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


JSON_EXTRACT_ORACLE = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events
"""


# --- D3: multi-format date parsing ----------------------------------------
# The reference accepts '%Y-%m-%d' and '%d.%m.%Y' (`_utils.py:33`);
# here half the rows are formatted each way and re-parsed with a
# try_to_date coalesce chain (ANSI-safe).


def multi_format_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("d")
    )
    strs = orders.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 2 == 0, F.date_format("d", "yyyy-MM-dd")
        ).otherwise(F.date_format("d", "dd.MM.yyyy")).alias("date_str"),
    )
    parsed = F.coalesce(
        F.expr("try_to_date(date_str, 'yyyy-MM-dd')"),
        F.expr("try_to_date(date_str, 'dd.MM.yyyy')"),
    )
    return strs.select("o_orderkey", "date_str", parsed.alias("date"))


MULTI_FORMAT_DATES_ORACLE = """
WITH strs AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 2 = 0
              THEN strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
              ELSE strftime(CAST(o_orderdate AS DATE), '%d.%m.%Y') END AS date_str
  FROM orders
)
SELECT o_orderkey, date_str,
       CAST(COALESCE(TRY_STRPTIME(date_str, '%Y-%m-%d'),
                     TRY_STRPTIME(date_str, '%d.%m.%Y')) AS DATE) AS date
FROM strs
"""


# --- Q2e: presentation header-row UNION -----------------------------------
# The nutrition report prepends a literal header row and casts data
# rows to text (`sql.py:246-254`).  Integer sums (exact) keep the
# string rendering engine-independent.


def header_union_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    data = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
        .select(
            F.col("l_returnflag").alias("flag"),
            F.col("n_items").cast("string").alias("n_items"),
            F.col("sum_qty").cast("string").alias("sum_qty"),
        )
    )
    header = (
        li.sparkSession.range(1)
        .select(
            F.lit("flag").alias("flag"),
            F.lit("n_items").alias("n_items"),
            F.lit("sum_qty").alias("sum_qty"),
        )
    )
    return header.unionByName(data)


HEADER_UNION_ORACLE = """
SELECT 'flag' AS flag, 'n_items' AS n_items, 'sum_qty' AS sum_qty
UNION ALL
SELECT l_returnflag,
       CAST(COUNT(*) AS VARCHAR),
       CAST(CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS VARCHAR)
FROM lineitem GROUP BY l_returnflag
"""


# --- variant_props_rollup (Spark 4 VARIANT) -------------------------------
# The modern twin of E2's JSON deserialization: ``parse_json`` lifts the
# semi-structured ``props`` string into a VARIANT (binary-encoded,
# shredding-ready — the Spark 4 path for schema-on-read at scale;
# get_json_object re-parses text per access, VARIANT parses once) and
# ``variant_get`` does typed path extraction.  Rolled up per event_type
# so the oracle certifies both the extraction and NULL semantics
# (missing path → NULL → skipped by SUM/COUNT(col), kept by COUNT(*)).

def variant_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


VARIANT_PROPS_ROLLUP_ORACLE = """
WITH x AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type, COUNT(*) AS n_events, COUNT(k) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
FROM x GROUP BY 1
"""
