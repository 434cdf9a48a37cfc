"""Structured Streaming surface (SURVEY.md §2.8: reference has none —
this is the engine's forward-looking stream story).

- sources: schema-pinned file streams (swap for Kafka in production)
- windowed: watermarked tumbling windows, built-in session windows
- stateful: ``applyInPandasWithState`` custom per-key state
- dedup_stream: exact + watermark-bounded streaming deduplication
"""

from cqdg_etl_spark.streaming.dedup_stream import (
    first_occurrence_stream,
    first_occurrence_within_watermark,
)
from cqdg_etl_spark.streaming.sources import (
    read_event_stream,
    read_event_stream_with_flush,
)
from cqdg_etl_spark.streaming.stateful import running_user_totals
from cqdg_etl_spark.streaming.windowed import (
    session_windows,
    session_windows_batch,
    tumbling_hourly,
)

__all__ = [
    "first_occurrence_stream",
    "first_occurrence_within_watermark",
    "read_event_stream",
    "read_event_stream_with_flush",
    "running_user_totals",
    "session_windows",
    "session_windows_batch",
    "tumbling_hourly",
]
