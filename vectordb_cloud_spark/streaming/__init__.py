from vectordb_cloud_spark.streaming.ingest import (
    session_windows,
    sliding_window_counts,
    start_ingest_stream,
    tumbling_window_stats,
)

__all__ = [
    "session_windows",
    "sliding_window_counts",
    "start_ingest_stream",
    "tumbling_window_stats",
]
