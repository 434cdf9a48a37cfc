"""Watermarked event-time window aggregations (Structured Streaming).

Batch twins live in cqdg_etl_spark/queries/events.py (``ev_tumbling_hourly``)
and define the oracle-checked semantics; these produce the same answers
over a stream. Tests run them with ``trigger(availableNow=True)`` and
compare against the batch result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_hourly(
    events: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ``ev_tumbling_hourly``.

    ``countDistinct`` is unsupported over streams, so distinct users are
    counted as ``size(collect_set(user_id))`` — exactly equal, with
    per-window state bounded by the user-id set (at production scale,
    swap in ``approx_count_distinct`` to cap state at HLL-sketch size).
    The watermark bounds window state: windows older than the max seen
    event time minus ``watermark`` are finalized and evicted.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_value"),
            F.size(F.collect_set("user_id")).cast("long").alias("n_users"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
            "n_users",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user session aggregation via the built-in ``session_window``.

    JVM-side merging sessionization — no Python state handling; the
    state store holds one open session per (user, window) and the
    watermark closes them. Batch equivalence: running the identical
    expression through a batch frame yields the same sessions, which is
    what the test asserts.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def session_windows_batch(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Batch twin of :func:`session_windows` (same plan minus watermark)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "session_value",
        )
    )
