from myfitnesspaw_spark.streaming.merge import stream_upsert_latest
from myfitnesspaw_spark.streaming.rollup import (
    read_events_stream,
    streaming_dedup_counts,
    streaming_hourly_rollup,
    streaming_sliding_rollup,
)
from myfitnesspaw_spark.streaming.sessions import (
    session_window_agg,
    sessionize,
    sessionize_stream,
)
from myfitnesspaw_spark.streaming.tws import tws_user_type_rollup

__all__ = [
    "read_events_stream",
    "session_window_agg",
    "sessionize",
    "sessionize_stream",
    "stream_upsert_latest",
    "streaming_dedup_counts",
    "streaming_hourly_rollup",
    "streaming_sliding_rollup",
    "tws_user_type_rollup",
]
