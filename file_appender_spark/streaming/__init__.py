from file_appender_spark.streaming.ops import (
    dedup_within_watermark,
    interval_join_streams,
    read_event_stream,
    running_totals_with_state,
    session_counts,
    stream_to_append_sink,
    windowed_counts,
)

__all__ = [
    "dedup_within_watermark",
    "interval_join_streams",
    "read_event_stream",
    "running_totals_with_state",
    "session_counts",
    "stream_to_append_sink",
    "windowed_counts",
]
