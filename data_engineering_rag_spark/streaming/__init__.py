from .events import hourly_event_stats_stream, sessionize_stream

__all__ = ["hourly_event_stats_stream", "sessionize_stream"]
