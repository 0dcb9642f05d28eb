from .jobs import events_stream, hourly_counts_stream, session_window_stream, run_available_now

__all__ = [
    "events_stream",
    "hourly_counts_stream",
    "session_window_stream",
    "run_available_now",
]
