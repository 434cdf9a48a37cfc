"""Streaming deduplication — the incremental arm of operators/dedup.py.

Two variants with different state-size contracts:

- ``first_occurrence_stream``: global exact dedup via
  ``dropDuplicates(keys)``. State holds every key ever seen — exact
  forever, but state grows with key cardinality. Right when the key
  space is bounded (entity ids) or the stream is bounded (backfill).
- ``first_occurrence_within_watermark``: bounded-state dedup via
  ``dropDuplicatesWithinWatermark(keys)`` — a key re-emits once the
  watermark passes its last occurrence. This is the 100 TB-sane
  default: state is bounded by keys-per-watermark-horizon, and for
  training-data ingest "the same document re-appearing days later"
  usually *should* re-surface for the batch dedup pass to arbitrate.

Emitted-row caveat: which physical row represents a key's "first"
occurrence depends on arrival order within a micro-batch, so
row-identity checks are only deterministic for ordered single-partition
sources; the key-set and exactly-one-row-per-key properties (what
dedup actually promises) are deterministic always — that is what
tests/test_streaming.py asserts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def first_occurrence_stream(
    events: DataFrame, keys: Sequence[str], watermark: str = "2 hours"
) -> DataFrame:
    """One row per key, globally exact (unbounded state)."""
    return events.withWatermark("ts", watermark).dropDuplicates(list(keys))


def first_occurrence_within_watermark(
    events: DataFrame, keys: Sequence[str], watermark: str = "2 hours"
) -> DataFrame:
    """One row per key per watermark horizon (bounded state)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
