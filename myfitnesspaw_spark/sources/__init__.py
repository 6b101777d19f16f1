from myfitnesspaw_spark.sources.tables import (
    TABLES,
    load_table,
    register_views,
    scatter,
    sf_is_small,
)

__all__ = ["TABLES", "load_table", "register_views", "scatter", "sf_is_small"]
