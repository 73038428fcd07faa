from vectordb_cloud_spark.streaming.ingest import (
    running_user_totals,
    session_windows,
    sessionize_batch,
    sliding_window_counts,
    start_ingest_stream,
    start_rollup_stream,
    streaming_dedup,
    tumbling_window_stats,
)

__all__ = [
    "running_user_totals",
    "session_windows",
    "sessionize_batch",
    "sliding_window_counts",
    "start_ingest_stream",
    "start_rollup_stream",
    "streaming_dedup",
    "tumbling_window_stats",
]
