from myfitnesspaw_spark.functions.numeric import money_cents, trunc_long

__all__ = ["money_cents", "trunc_long"]
