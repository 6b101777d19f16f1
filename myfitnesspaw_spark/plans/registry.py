"""Named-query registry — the driver contract's backbone.

Every implemented operator from SURVEY.md §2 registers one named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible)
an equivalent ANSI-SQL oracle that DuckDB runs on the same parquet
tables.  ``__spark_entry__.queries()`` / ``oracle_sql()`` read straight
from here.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # None → driver runs rows-only check


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as a named query with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle)
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import side effect populates the registry.
    import myfitnesspaw_spark.plans.queries  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None}
