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
- ``streaming``  : Structured Streaming variant of the ingestion pipeline.
"""

from myfitnesspaw_spark.session import get_spark

__all__ = ["get_spark"]
