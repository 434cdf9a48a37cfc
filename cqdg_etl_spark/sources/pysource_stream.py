"""Custom Python STREAMING DataSource (Spark 4 DataSource API).

The streaming counterpart of sources/pysource.py: a pure-Python
micro-batch source with offset tracking and exactly-once replay — the
shape a team would use to ingest an internal queue/feed into
Structured Streaming without JVM code.

``synthetic_events`` emits a deterministic event stream:

- Offsets are ``{"pos": n}`` dicts; each planned micro-batch advances
  by ``batch_size`` rows up to ``max_rows`` (then returns empty
  batches — a drained feed).
- ``readBetweenOffsets(start, end)`` regenerates EXACTLY the rows of a
  committed-but-lost batch from the offset range alone — the replay
  contract that makes recovery exactly-once: generation derives every
  field from a 60-bit md5 hash of the position, so any offset range
  reproduces bit-identical rows on any executor at any time.
- ``commit(end)`` is where a real source would ack/trim the upstream
  queue; the synthetic feed needs no trimming.

Scale note: SimpleDataSourceStreamReader plans on the driver and is
right for modest per-batch volumes (control streams, CDC feeds,
service polls); a partition-parallel ``DataSourceStreamReader`` with
``partitions()`` is the high-throughput variant (same recipe as the
batch source's RangePartition split).
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

EVENT_TYPES = ["view", "click", "purchase"]

SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


def _h60(pos: int) -> int:
    return int(hashlib.md5(f"se{pos}".encode()).hexdigest()[:15], 16)


def make_event(pos: int) -> tuple:
    h = _h60(pos)
    return (
        pos,
        h % 100,
        EVENT_TYPES[(h // 100) % 3],
        round((h // 300) % 10_000 / 100.0, 2),
    )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.batch_size = int(options.get("batch_size", 100))
        self.max_rows = int(options.get("max_rows", 1000))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        lo = start["pos"]
        hi = min(lo + self.batch_size, self.max_rows)
        return iter([make_event(i) for i in range(lo, hi)]), {"pos": hi}

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[tuple]:
        # exactly-once replay: the offset range alone reproduces the batch
        return iter([make_event(i) for i in range(start["pos"], end["pos"])])

    def commit(self, end: dict) -> None:
        pass  # a real feed would ack/trim up to `end` here


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
