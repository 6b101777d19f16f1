"""myfitnesspaw_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline (nikolovdeyan/myfitnesspaw — a
Prefect + SQLite fitness ETL; see SURVEY.md).  Everything relational is
declared with the DataFrame / Spark SQL API so Catalyst + Tungsten pick
the physical strategy; nothing is hand-scheduled.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, Arrow, UTC).
- ``schemas``    : nested MaterializedDay StructType + silver-table schemas.
- ``sources``    : testdata parquet loaders + the (stubbed) web-API source.
- ``operators``  : normalization (explode/flatten), incremental (anti-join
                   CDC diff, keyed upsert), dedup, similarity, text analysis,
                   multimodal plumbing.
- ``plans``      : the analytic queries (progress report Q1, nutrition Q2,
                   and the full named-query registry with DuckDB oracles).
- ``streaming``  : Structured Streaming ingestion (watermarked rollup,
                   session windows, applyInPandasWithState sessionizer).
- ``sinks``      : warehouse DDL init, partitioned silver writes,
                   bucketed tables for shuffle-free co-located joins.
- ``report``     : driver-side presentation (tail-N, freshness guard,
                   chart segments, HTML rendering) over collected rows.
- ``functions``  : reusable Column helpers (text hashing/shingling,
                   exact-integer money arithmetic).
"""

from myfitnesspaw_spark.session import get_spark

__all__ = ["get_spark"]
