"""Normalization operators: the reference's nested-document →
relational-table pipeline (SURVEY.md §2.3/§2.4) as generic DataFrame
combinators.

The reference materializes one nested ``MaterializedDay`` per
(user, day) and flattens it into 8 silver tables with Python list
comprehensions (`/root/reference/myfitnesspaw/tasks.py:431-653`).
Here the same semantics are Spark-native:

- nesting   = ``groupBy(parent).agg(sort_array(collect_list(struct)))``
- flatten   = ``explode`` (drops parents with empty arrays — exactly
  the comprehension's falsy-drop at `tasks.py:511-516`)
- map keys  = ``col.getItem(k)`` (NULL on missing key — exactly
  ``dict.get(k, None)`` at `tasks.py:486-491`)
- unpivot   = map ``explode`` → (key, value) rows (`tasks.py:632-653`)
- serde     = ``to_json`` / ``from_json`` (`tasks.py:365-428`)

Scale notes: ``collect_list`` groups are bounded by real-world child
cardinality (entries per meal, lineitems per order), never by table
size, so nesting shuffles but does not skew; ``explode`` is pipelined
inside whole-stage codegen with no shuffle at all; ``from_json`` /
``to_json`` are JVM-side (Jackson), not Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def nest_children(
    parent_keys: Sequence[str],
    children: DataFrame,
    child_struct_cols: Sequence[str],
    order_within: str,
    array_alias: str = "children",
    sort: bool = True,
) -> DataFrame:
    """Group child rows into a per-parent sorted array of structs.

    The inverse of the reference's flatten: builds the
    ``MaterializedDay.meals``-style nested shape from relational rows.
    ``order_within`` must be the FIRST struct field for ``sort_array``
    to give a deterministic (struct-lexicographic) order.  Pass
    ``sort=False`` when the struct contains a map (maps are not
    orderable) and downstream consumption is order-insensitive.
    """
    cols = [order_within] + [c for c in child_struct_cols if c != order_within]
    arr = F.collect_list(F.struct(*cols))
    if sort:
        arr = F.sort_array(arr)
    return children.groupBy(*parent_keys).agg(arr.alias(array_alias))


def flatten_with_parent(
    nested: DataFrame,
    parent_cols: Sequence[str],
    array_col: str,
    child_alias: str = "child",
) -> DataFrame:
    """Explode an array column, attributing parent keys to each child.

    Reference: ``extract_meals`` attributes ``day.username`` /
    ``day.date`` onto every meal (`tasks.py:497-516`); parents whose
    array is empty produce no rows (``explode``'s semantics == the
    comprehension's).
    """
    return nested.select(*parent_cols, F.explode(array_col).alias(child_alias))


def project_map_keys(
    df: DataFrame,
    map_col: str,
    keys: Sequence[str],
    keep_cols: Sequence[str],
) -> DataFrame:
    """Project fixed keys out of a map column; missing keys → NULL.

    Reference: ``extract_goals`` reads six nutrient keys with
    ``goals.get(k, None)`` (`tasks.py:470-494`).
    """
    return df.select(
        *keep_cols,
        *[F.col(map_col).getItem(k).alias(k) for k in keys],
    )


def unpivot_map(df: DataFrame, map_col: str, keep_cols: Sequence[str]) -> DataFrame:
    """Unpivot a map column into (key, value) rows.

    Reference: ``extract_measures`` emits one row per measurements
    entry (`tasks.py:632-653`).  ``explode`` of a map yields
    ``key``/``value`` columns natively.
    """
    return df.select(*keep_cols, F.explode(map_col))


def serialize_struct(df: DataFrame, keep_cols: Sequence[str], payload_cols: Sequence[str],
                     json_alias: str = "payload_json") -> DataFrame:
    """E1: pack payload columns into one canonical JSON string column.

    Reference: ``serialize_myfitnesspal_days`` jsonpickles whole days
    (`tasks.py:365-380`); canonical ``to_json(struct(...))`` preserves
    the load-bearing property (byte-stable change detection for the
    CDC diff) without chasing pickle bytes.
    """
    return df.select(*keep_cols, F.to_json(F.struct(*payload_cols)).alias(json_alias))


def deserialize_struct(df: DataFrame, json_col: str, schema, keep_cols: Sequence[str]) -> DataFrame:
    """E2: parse a JSON string column back into typed columns.

    Reference: ``deserialize_records_to_process`` (`tasks.py:408-428`).
    """
    parsed = df.select(*keep_cols, F.from_json(json_col, schema).alias("__p"))
    return parsed.select(*keep_cols, "__p.*")


def filter_nonempty(df: DataFrame, col: str | Column) -> DataFrame:
    """N1's filter: drop NULL/empty-string values.

    Reference: ``extract_notes`` keeps only notes with a non-empty body
    (`tasks.py:431-452`, filter at :451).
    """
    c = F.col(col) if isinstance(col, str) else col
    return df.where(c.isNotNull() & (c != ""))
