"""Populate the named-query registry (driver contract).

Importing this module registers every named query.  Each registration
pairs the Spark plan with its DuckDB oracle; names and column aliases
must match exactly between the two (the driver sorts columns by name
and hash-compares values).
"""

from __future__ import annotations

from myfitnesspaw_spark.plans.progress import PROGRESS_ORACLE, progress_report
from myfitnesspaw_spark.plans.registry import register

register("progress_report", PROGRESS_ORACLE)(progress_report)
