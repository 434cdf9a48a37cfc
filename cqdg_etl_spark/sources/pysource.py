"""Custom Python DataSource (Spark 4 DataSource API, SPARK-44076).

The newest extension surface on the source side: a data source written
in pure Python with partition-parallel reads and FILTER PUSHDOWN into
the source — the API a team would use to expose an internal service,
a synthetic-load generator, or a bespoke format to Spark without JVM
code.

``synthetic_docs`` generates a deterministic document corpus:

- **Partition-parallel**: `partitions()` splits the id range into
  ``partitions`` InputPartitions; each executor generates its own
  range — no driver-side materialization, the property a generator
  source must have at scale (the naive
  ``spark.createDataFrame(driver_list)`` collapses on the driver).
- **Pushdown**: ``pushFilters`` consumes doc_id range/equality
  filters and PRUNES THE GENERATION RANGE — unsupported filters are
  returned to Spark for post-evaluation. The emitted ``part_lo``
  column (each row's partition lower bound) makes the pruning
  observable in tests: with pushdown, `doc_id >= X` never generates a
  partition below X.
- **Engine-portable generation**: every field derives from a 60-bit
  md5 hash of the doc id with pure integer arithmetic, so a SQL
  oracle re-derives the identical corpus from ``range(n)`` — the
  registry query checks the custom source end-to-end by value hash,
  not just by row count.

Word pool and derivation (shared with the SQL oracle in
queries/datapipe4.py::src_pysource_docs_stats):
  h      = md5_60bit('sd' || doc_id)
  lang   = LANGS[h % 5]
  n_toks = 5 + (h DIV 5) % 20
  word_j = POOL[(h DIV 7 + j * 31) % 32]
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

LANGS = ["en", "fr", "es", "de", "zh"]

POOL = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliett", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "zero", "one",
    "two", "three", "four", "five",
]

SCHEMA = (
    "doc_id bigint, lang string, n_tokens int, text string, part_lo bigint"
)


def _h60(doc_id: int) -> int:
    """First 15 md5 hex chars of 'sd<id>' as int — the same value
    DuckDB spells CAST(('0x' || substring(md5('sd' || id), 1, 15)) AS
    BIGINT)."""
    return int(hashlib.md5(f"sd{doc_id}".encode()).hexdigest()[:15], 16)


def make_row(doc_id: int, part_lo: int) -> tuple:
    h = _h60(doc_id)
    lang = LANGS[h % 5]
    n_tokens = 5 + (h // 5) % 20
    base = h // 7
    text = " ".join(POOL[(base + j * 31) % 32] for j in range(n_tokens))
    return (doc_id, lang, n_tokens, text, part_lo)


@dataclass
class RangePartition(InputPartition):
    lo: int
    hi: int


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n_docs", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.lo = 0
        self.hi = self.n

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if getattr(f, "attribute", None) == ("doc_id",):
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, int(f.value))
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
            yield f  # not pushable -> Spark evaluates it post-scan

    def partitions(self) -> list[RangePartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        total = hi - lo
        if total == 0:
            return [RangePartition(lo, lo)]
        k = min(self.n_parts, total)
        step = -(-total // k)
        return [
            RangePartition(p, min(p + step, hi)) for p in range(lo, hi, step)
        ]

    def read(self, partition: RangePartition) -> Iterator[tuple]:
        for i in range(partition.lo, partition.hi):
            yield make_row(i, partition.lo)


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the synthetic_docs format (and the
    conf gate Python-source pushdown sits behind)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticDocsDataSource)
