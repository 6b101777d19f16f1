from myfitnesspaw_spark.sinks.warehouse import (
    SILVER_TABLES,
    init_warehouse,
    write_bucketed,
    write_silver,
)

__all__ = ["SILVER_TABLES", "init_warehouse", "write_bucketed", "write_silver"]
