from myfitnesspaw_spark.streaming.rollup import read_events_stream, streaming_hourly_rollup
from myfitnesspaw_spark.streaming.sessions import sessionize

__all__ = ["read_events_stream", "streaming_hourly_rollup", "sessionize"]
