"""Structured Streaming operators over the events stream.

The reference has no streaming surface at all (SURVEY.md §2.4 "not
present"); this package adds the Spark-native stream side: file-source
``readStream`` ingestion, watermarked tumbling/sliding windows, session
windows, and a custom stateful operator via ``applyInPandasWithState``.
Every transformation is written against a plain ``DataFrame`` so the
identical code path runs in batch (driver-contract queries + DuckDB
oracles) and as a stream (tests drive availableNow triggers into a
memory sink).
"""

from meta_frame_spark.streaming.ops import (
    dedup_events,
    enrich_with_dim,
    hourly_event_counts,
    interval_join,
    read_event_stream,
    run_to_memory,
    run_to_parquet,
    session_aggregate,
    sliding_event_value,
    user_running_totals,
)

__all__ = [
    "dedup_events",
    "enrich_with_dim",
    "hourly_event_counts",
    "interval_join",
    "read_event_stream",
    "run_to_memory",
    "run_to_parquet",
    "session_aggregate",
    "sliding_event_value",
    "user_running_totals",
]
