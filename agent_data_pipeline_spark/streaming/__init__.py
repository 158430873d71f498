"""Structured Streaming layer (SURVEY.md §2.B streaming, §7 stage 4)."""

from .core import (
    drain,
    foreach_batch_parquet_sink,
    session_window_agg,
    sliding_window_agg,
    stream_dedup,
    stream_ingest_csv,
    stream_parquet,
    stream_to_memory,
    tumbling_window_agg,
)

__all__ = [
    "drain",
    "foreach_batch_parquet_sink",
    "session_window_agg",
    "sliding_window_agg",
    "stream_dedup",
    "stream_ingest_csv",
    "stream_parquet",
    "stream_to_memory",
    "tumbling_window_agg",
]
