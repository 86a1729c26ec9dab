from scalecast_spark.streaming.ops import (
    stream_events,
    windowed_series,
    sessionize_stream,
    run_available_now,
)

__all__ = [
    "stream_events", "windowed_series", "sessionize_stream", "run_available_now",
]
