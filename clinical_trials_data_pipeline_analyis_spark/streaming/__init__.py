from .events import (
    hourly_event_counts_stream,
    silver_studies_stream,
    streaming_events_source,
)

__all__ = [
    "hourly_event_counts_stream",
    "silver_studies_stream",
    "streaming_events_source",
]
