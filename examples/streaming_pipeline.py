"""End-to-end streaming example: the engine's Structured Streaming
surface composed the way a live event pipeline would chain it:

  1. file-source stream   (streaming.stream_events — parquet micro-
                           batches; swap for kafka in production)
  2. exact dedup          (streaming.dedupe_stream — state bounded by
                           the watermark horizon)
  3. mutation spec        (streaming.mutate_stream — the same mutator
                           spec that corrupts a batch table, applied
                           exactly-once per row, no state)
  4. stream-stream join   (streaming.interval_join_streams — click →
                           purchase within 6 hours per user; state
                           evictable via the two-sided time bound)
  5. windowed aggregate   (streaming.windowed_event_counts — watermarked
                           tumbling windows per event type)

Every stage is a lazy streaming transform; sinks below use the memory
format for demonstration (parquet + checkpoint in production — see
tests/test_streaming.py::test_checkpoint_restart_* for the
fault-tolerant wiring). Run:

    python examples/streaming_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gecko_spark import get_spark
from gecko_spark.operators import mutators as M
from gecko_spark.streaming import (
    dedupe_stream,
    interval_join_streams,
    mutate_stream,
    stream_events,
    windowed_event_counts,
)


def build_streams(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Wire the example's three streaming outputs; nothing starts until
    a sink calls ``.writeStream``."""
    path = os.path.join(sf_dir, "events.parquet")
    events = stream_events(spark, path)

    # stateless web cleanup first: strip_html / normalize_url are pure
    # Column algebra, so they run unchanged inside a stream (no state,
    # no watermark interaction) — a no-op on this corpus's clean props,
    # shown here because a real ingest stream would need them
    from gecko_spark.operators.text import strip_html

    events = events.withColumn("props", strip_html(F.col("props")))

    # dedup within the watermark horizon, then corrupt the event_type
    # column with the library's own mutator spec (demo: 5% typos)
    deduped = dedupe_stream(events, ["event_id"], watermark="30 days")
    corrupted = mutate_stream(
        deduped, [("event_type", (0.05, M.with_substitute()))], seed=41
    )

    clicks = stream_events(spark, path).filter(F.col("event_type") == "click")
    purchases = stream_events(spark, path).filter(
        F.col("event_type") == "purchase"
    )
    correlated = interval_join_streams(
        clicks,
        purchases,
        key="user_id",
        upper="6 hours",
        watermark="30 days",
    ).select("event_id", "r_event_id", "user_id")

    # the dedup stage already declared the stream's watermark; a chained
    # stateful operator may not redefine it, so the aggregate inherits it
    hourly = windowed_event_counts(corrupted, "1 hour", watermark=None)

    # live traffic monitor: sharded Misra-Gries state tracks which
    # event types dominate the stream (candidates + lower bounds; the
    # heavy_hitters_from_shards finalizer splits confirmed from maybe)
    from gecko_spark.streaming import heavy_hitters_stream

    hh = heavy_hitters_stream(
        stream_events(spark, path), "event_type", capacity=8, n_shards=4,
        watermark="30 days",
    )
    return {
        "corrupted": corrupted,
        "correlated": correlated,
        "hourly": hourly,
        "heavy": hh,
    }


def run_to_memory(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    """Drain every stream into a memory sink and return row counts."""
    streams = build_streams(spark, sf_dir)
    counts = {}
    for name, df in streams.items():
        mode = (
            "complete" if name == "hourly"
            else "update" if name == "heavy"
            else "append"
        )
        q = (
            df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(f"ex_{name}")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        counts[name] = spark.sql(f"SELECT count(*) AS n FROM ex_{name}").first()["n"]
    return counts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="streaming-example")
    try:
        counts = run_to_memory(spark, sf_dir)
        for name, n in counts.items():
            print(f"  {name}: {n} rows")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
