"""Streaming analytics operators (SURVEY §2.9 T4/T6): the event-time
surface the reference lacks — watermarked tumbling/sliding/session
windows — expressed once, usable both on a stream and as batch twins.

Each builder takes any DataFrame (streaming or batch): Structured
Streaming plans the same logical operators incrementally, so the batch
run of the identical code is the oracle for the streaming run (tested
in tests/test_streaming.py with the file source + availableNow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window counts/sums per event_type. Late rows
    beyond the watermark are dropped (bounded state — the property that
    lets this run forever at 100 TB/day)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def sliding_rates(events: DataFrame, window: str = "1 hour", slide: str = "15 minutes",
                  watermark: str = "30 minutes") -> DataFrame:
    """Sliding-window event rates (the alerting primitive)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_aggregates(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "30 minutes") -> DataFrame:
    """Native session windows (F.session_window): per-user sessions with
    dynamic close-on-gap. State per open session only."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def dedup_within_watermark(events: DataFrame, keys: list[str],
                           ts_col: str = "ts",
                           watermark: str = "30 minutes") -> DataFrame:
    """Streaming source-side dedup: drop redundant deliveries of the
    same key(s) arriving within the watermark window
    (``dropDuplicatesWithinWatermark``, Spark 3.5+) — the guard a
    CDC pipeline puts IN FRONT of ``apply_cdc_batch`` when the
    transport is at-least-once (Kinesis/Kafka redelivery,
    DMS task restarts). State is bounded by the watermark: each key
    is remembered only until the watermark passes its first arrival,
    unlike ``dropDuplicates`` on a stream, whose state grows forever.

    On a batch frame this degrades to plain ``dropDuplicates`` over
    the keys (the batch twin used as the oracle in tests) — batch
    inputs are complete, so the watermark bound is irrelevant there.
    """
    if events.isStreaming:
        return (
            events.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys)
        )
    return events.dropDuplicates(keys)
