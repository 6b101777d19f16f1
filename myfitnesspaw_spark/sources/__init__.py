from myfitnesspaw_spark.sources.tables import TABLES, load_table, register_views, scatter

__all__ = ["TABLES", "load_table", "register_views", "scatter"]
