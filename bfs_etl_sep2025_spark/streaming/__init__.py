"""Structured Streaming jobs — the incremental/streaming execution surface."""

from bfs_etl_sep2025_spark.streaming.jobs import (
    run_stream_collect,
    run_stream_to_memory,
    stream_events,
    stream_file_ingest,
    stream_running_user_totals,
    stream_stateful_dedup,
    stream_windowed_counts,
)

__all__ = [
    "run_stream_collect",
    "run_stream_to_memory",
    "stream_events",
    "stream_file_ingest",
    "stream_running_user_totals",
    "stream_stateful_dedup",
    "stream_windowed_counts",
]
