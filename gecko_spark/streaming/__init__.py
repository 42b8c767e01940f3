"""Structured Streaming surface of the engine."""

from gecko_spark.streaming.stream import (
    mutate_stream,
    sessionize,
    stream_events,
    windowed_event_counts,
)

__all__ = [
    "mutate_stream",
    "sessionize",
    "stream_events",
    "windowed_event_counts",
]
