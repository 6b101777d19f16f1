from myfitnesspaw_spark.plans.registry import oracle_sql, queries, register

__all__ = ["queries", "oracle_sql", "register"]
