from myfitnesspaw_spark.streaming.rollup import read_events_stream, streaming_hourly_rollup
from myfitnesspaw_spark.streaming.sessions import (
    session_window_agg,
    sessionize,
    sessionize_stream,
)

__all__ = [
    "read_events_stream",
    "session_window_agg",
    "sessionize",
    "sessionize_stream",
    "streaming_hourly_rollup",
]
