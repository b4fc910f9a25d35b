from .events import (
    dedup_events_stream,
    hourly_event_stats_stream,
    sessionize_stream,
    sliding_counts_stream,
)

__all__ = [
    "dedup_events_stream",
    "hourly_event_stats_stream",
    "sessionize_stream",
    "sliding_counts_stream",
]
