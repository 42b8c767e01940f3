"""Structured Streaming surface of the engine."""

from gecko_spark.streaming.stream import (
    decontaminate_stream,
    link_stream,
    dedupe_stream,
    heavy_hitters_from_shards,
    heavy_hitters_stream,
    interval_join_streams,
    kmv_distinct_stream,
    kmv_estimate_from_shards,
    neardup_dedupe_stream,
    pack_stream,
    mutate_stream,
    running_user_stats,
    sessionize,
    stream_events,
    windowed_event_counts,
)

__all__ = [
    "decontaminate_stream",
    "link_stream",
    "dedupe_stream",
    "heavy_hitters_from_shards",
    "heavy_hitters_stream",
    "interval_join_streams",
    "kmv_distinct_stream",
    "kmv_estimate_from_shards",
    "neardup_dedupe_stream",
    "pack_stream",
    "mutate_stream",
    "running_user_stats",
    "sessionize",
    "stream_events",
    "windowed_event_counts",
]
