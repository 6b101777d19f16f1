from myfitnesspaw_spark.operators.incremental import (
    date_spine,
    diff_new_or_changed,
    latest_by,
    point_lookup,
    replace_by_keys,
    topk_per_group,
    upsert_keep_latest,
)

__all__ = [
    "date_spine",
    "diff_new_or_changed",
    "latest_by",
    "point_lookup",
    "replace_by_keys",
    "topk_per_group",
    "upsert_keep_latest",
]
