"""Streaming analytics over the events stream (SURVEY.md §2C streaming
surface): watermarked tumbling/sliding/session windows and within-watermark
dedup. The reference's only stream is the delta POST firehose (a de-facto
micro-batch stream, app.js:28-38); these generalize that surface to the
event-analytics operators a harvesting/training pipeline needs.

Each builder takes a *streaming* DataFrame (``spark.readStream``) and
returns the transformed streaming frame; callers attach a sink. The batch
twins in ``plans.catalog_core`` (event_time_buckets, event_sliding_windows,
sessionize_events, dedup_events_first_per_key) compute the same answers on
bounded data and are the oracle-checked surface for these semantics.

Scale notes: every aggregation here keys its state by (window, group key)
and expires it by the watermark, so state is O(active windows × keys), not
O(stream length). dropDuplicates state likewise expires with the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, *, size: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window event counts/sums per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "sum_value")
    )


def sliding_counts(events: DataFrame, *, size: str = "1 hour",
                   slide: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Sliding-window counts (each event lands in size/slide windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "n_events")
    )


def session_aggregate(events: DataFrame, *, gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows with a dynamic gap — the native streaming
    form of the batch lag+cumsum sessionization (catalog_core
    sessionize_events)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"),
             F.sum("value").alias("sum_value"))
        .select("user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events", "sum_value")
    )


def dedup_events(events: DataFrame, *, keys: list[str] | None = None,
                 watermark: str = "2 hours") -> DataFrame:
    """Within-watermark exactly-once by key: late duplicates beyond the
    watermark age out of the state store instead of growing it forever."""
    return events.withWatermark("ts", watermark).dropDuplicates(
        (keys or ["event_id"]) + ["ts"])

def stream_stream_interval_join(
    left: DataFrame, right: DataFrame, *,
    left_key: str = "user_id", right_key: str = "user_id",
    left_ts: str = "ts", right_ts: str = "ts",
    within: str = "1 hour", watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: right-side events within
    ``[left_ts, left_ts + within]`` of a matching left-side key.

    Both inputs are streaming frames (a self-join of one source works —
    filter two views off the same ``readStream``). The watermark plus the
    two-sided time-range condition are what let Spark EVICT join state:
    without them an inner stream-stream join buffers both streams forever.
    State is O(events inside the watermark horizon), keyed by the equi-key
    — at 100 TB/day the horizon, not history, bounds executor memory.

    Column names must be disjoint across the two sides (pre-project with
    aliases); the join keeps both sides' columns. ``how`` may be any
    stream-stream-supported type ('inner', 'leftOuter', ... — outer joins
    additionally require the watermark to emit their null-padded rows)."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[left_key] == r[right_key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how)
