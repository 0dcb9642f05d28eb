from .jobs import (
    attribution_join_stream,
    events_stream,
    hourly_counts_stream,
    run_available_now,
    session_window_stream,
)
from .stateful import dedup_stream, ewma_anomaly_stream

__all__ = [
    "attribution_join_stream",
    "events_stream",
    "hourly_counts_stream",
    "session_window_stream",
    "run_available_now",
    "dedup_stream",
    "ewma_anomaly_stream",
]
