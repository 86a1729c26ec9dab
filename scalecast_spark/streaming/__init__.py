from scalecast_spark.streaming.ops import (
    stream_events,
    stream_documents,
    dedup_stream,
    windowed_series,
    sessionize_stream,
    run_available_now,
    anomaly_stream,
    cross_dedup_stream,
    asof_join_stream,
    compact_results,
    ewma_stream,
    ivfpq_encode_stream,
    ivfpq_search_stream,
)

__all__ = [
    "stream_events", "stream_documents", "dedup_stream",
    "windowed_series", "sessionize_stream", "run_available_now",
    "anomaly_stream", "asof_join_stream", "compact_results", "cross_dedup_stream", "ewma_stream", "ivfpq_encode_stream", "ivfpq_search_stream",
]
