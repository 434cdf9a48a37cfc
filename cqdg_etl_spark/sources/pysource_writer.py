"""Custom Python DataSource WRITER (Spark 4 DataSource API) — the
write side of the pure-Python extension surface (readers:
sources/pysource.py, pysource_stream.py).

``ndjson_shards`` writes a DataFrame as newline-delimited JSON shards
with the two-phase commit protocol every distributed sink needs:

- each task writes its partition to a UNIQUELY-NAMED temp file (task
  id + UUID — retries/speculative duplicates can never collide) and
  returns a WriterCommitMessage carrying the temp path + row count;
- the DRIVER commits by renaming every temp file into place and
  writing a ``_SUCCESS`` manifest with the total row count — readers
  that respect the manifest never see a half-written job;
- ``abort`` removes the temp files, so a failed job leaves nothing
  visible.

This is the same visibility contract as Hadoop's FileOutputCommitter
(v1), expressed in ~60 lines of Python — useful as the template for
sinks Spark has no connector for (internal services, bespoke formats).

At scale: one rename + one manifest line per task on the driver —
O(#partitions) driver work, no data movement at commit time (on object
stores, swap the rename for a multipart-complete or manifest-only
commit).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType


@dataclass
class ShardCommit(WriterCommitMessage):
    temp_path: str
    n_rows: int


class NdjsonShardWriter(DataSourceWriter):
    def __init__(self, path: str, schema: StructType, overwrite: bool):
        self.path = path
        self.columns = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator: Iterator[Row]) -> ShardCommit:
        from pyspark import TaskContext

        tc = TaskContext.get()
        part = tc.partitionId() if tc is not None else 0
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path, f"_temp-{part:05d}-{uuid.uuid4().hex}.ndjson"
        )
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(
                    json.dumps(
                        {c: row[i] for i, c in enumerate(self.columns)},
                        default=str,
                    )
                )
                f.write("\n")
                n += 1
        return ShardCommit(temp_path=tmp, n_rows=n)

    def commit(self, messages: list[ShardCommit]) -> None:
        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{i:05d}.ndjson")
            os.replace(m.temp_path, final)
            total += m.n_rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"n_rows": total, "n_shards": len(messages)}, f)

    def abort(self, messages: list[ShardCommit]) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.temp_path):
                os.remove(m.temp_path)


class NdjsonShardsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ndjson_shards"

    def writer(self, schema: StructType, overwrite: bool) -> NdjsonShardWriter:
        return NdjsonShardWriter(self.options["path"], schema, overwrite)


def register(spark) -> None:
    spark.dataSource.register(NdjsonShardsDataSource)
