"""Structured Streaming layer (SURVEY.md §2.3-K)."""

from s3spark.streaming.ops import (  # noqa: F401
    events_stream,
    run_available_now,
    stream_dedup,
    stream_merge_into,
    stream_tumbling_counts,
    stream_user_stats,
)
