from myfitnesspaw_spark.report.progress import (
    PALETTE_DEFAULT,
    PALETTE_NEGATIVE,
    ProgressReport,
    chart_segments,
    prepare_table,
    render_html,
)

__all__ = [
    "PALETTE_DEFAULT",
    "PALETTE_NEGATIVE",
    "ProgressReport",
    "chart_segments",
    "prepare_table",
    "render_html",
]
