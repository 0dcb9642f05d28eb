from .jobs import events_stream, hourly_counts_stream, session_window_stream, run_available_now
from .stateful import dedup_stream, ewma_anomaly_stream

__all__ = [
    "events_stream",
    "hourly_counts_stream",
    "session_window_stream",
    "run_available_now",
    "dedup_stream",
    "ewma_anomaly_stream",
]
