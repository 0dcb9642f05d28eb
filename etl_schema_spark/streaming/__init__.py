from .jobs import (
    attribution_join_stream,
    events_stream,
    hopping_window_stream,
    hourly_counts_stream,
    merge_upsert_batch,
    run_available_now,
    session_window_stream,
    streaming_hourly_counts,
    streaming_hourly_counts_oracle,
    streaming_session_windows,
    streaming_session_windows_oracle,
    upsert_hourly_sink,
)
from .stateful import dedup_stream, ewma_anomaly_stream

__all__ = [
    "attribution_join_stream",
    "events_stream",
    "hopping_window_stream",
    "hourly_counts_stream",
    "merge_upsert_batch",
    "session_window_stream",
    "streaming_hourly_counts",
    "streaming_hourly_counts_oracle",
    "streaming_session_windows",
    "streaming_session_windows_oracle",
    "run_available_now",
    "upsert_hourly_sink",
    "dedup_stream",
    "ewma_anomaly_stream",
]
