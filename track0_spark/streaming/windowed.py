"""Event-time windowed crawl metrics with a watermark for late data.

The crawl emits fetch events (host, event_ts, bytes). Aggregating them
per host per tumbling window is the canonical Structured Streaming
shape: ``withWatermark`` bounds how late an event may arrive, the
engine keeps only windows newer than the watermark in state (bounded
state at any scale), and append mode emits each window exactly once —
when the watermark passes its end. Events older than the watermark are
dropped, never double-counted.

Determinism note (same reasoning as ingest.py): the watermark advances
at micro-batch boundaries from the previous batch's max event time, so
window finalization depends on batch slicing — fine for monitoring
metrics (this sink), NOT for the crawl ordering itself, which is why
the frontier loop stays batch-BSP.

Scale posture: state is O(open windows x hosts) regardless of input
volume; the shuffle is the same host-keyed exchange as the batch
metrics aggregation, with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EVENT_SCHEMA = "host string, event_ts timestamp, bytes bigint"


def host_window_counts(
    events: DataFrame,
    window: str = "60 seconds",
    max_lateness: str = "30 seconds",
) -> DataFrame:
    """Per-host tumbling-window fetch counts + byte totals; windows are
    finalized (and emitted, in append mode) once the watermark — max
    seen event time minus ``max_lateness`` — passes their end."""
    w = (
        events.withWatermark("event_ts", max_lateness)
        .groupBy(F.window("event_ts", window).alias("w"), "host")
        .agg(
            F.count("*").alias("fetches"),
            F.sum("bytes").alias("bytes"),
        )
    )
    return w.select(
        F.col("w.start").alias("win_start"),
        F.col("w.end").alias("win_end"),
        "host",
        "fetches",
        "bytes",
    )


def run_window_metrics(
    events: DataFrame, out_dir: str, checkpoint_dir: str, **window_args
) -> None:
    """Drain pending events, appending finalized windows to parquet."""
    q = (
        host_window_counts(events, **window_args)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
