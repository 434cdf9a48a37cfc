"""Streaming sources over the harness event data.

The reference has no streaming surface (SURVEY.md §2.8) — this package is
the engine's forward-looking stream story, built on Structured Streaming:
``readStream`` file sources with schema pinning, watermarked event-time
windows (windowed.py), built-in session windows and an
``applyInPandasWithState`` custom stateful operator (stateful.py).

Scale notes: a parquet-directory stream shards by file; at production
scale the same code points at Kafka (``format("kafka")``) with the same
downstream plan — only this module changes.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stage_dir(parquet_file: str) -> str:
    """File streams watch *directories* (new files arrive = new data).

    The harness ships one flat file per table, so stage it behind a
    symlink in a scratch landing dir — exactly the shape a production
    ingest directory has.
    """
    d = tempfile.mkdtemp(prefix="cqdg_stream_")
    os.symlink(parquet_file, os.path.join(d, os.path.basename(parquet_file)))
    return d


def read_event_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over the events parquet with the batch-identical schema.

    File streams require an explicit schema; we pin it from the batch
    reader so stream/batch plans agree. The source's TIMESTAMP(NANOS)
    column arrives as bigint nanos (session sets
    ``spark.sql.legacy.parquet.nanosAsLong``) and is converted with
    integer division exactly like queries/registry.py::load.
    """
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(_stage_dir(path) if os.path.isfile(path) else path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(df.dtypes).get("ts") == "timestamp_ntz":
        # NTZ parquet timestamps; session tz is UTC so the cast is exact
        # and keeps watermarks/unix_micros applicable.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_event_stream_with_flush(
    spark: SparkSession,
    sf_dir: str,
    sentinel_types: tuple[str, ...] = ("__sentinel__",),
) -> DataFrame:
    """Event stream whose append-mode STATE provably flushes under an
    ``availableNow`` drain — required for outer joins and any
    watermark-gated emission.

    The mechanics: unmatched outer rows (and final windows) are held in
    the state store until the watermark passes their horizon, and the
    watermark only advances BETWEEN micro-batches — so a drain that
    ingests everything in one batch terminates with the tail of the
    data still in state. This source stages the real file plus TWO
    far-future sentinel files (strictly increasing mtimes) and forces
    ``maxFilesPerTrigger=1``: batch 2 (sentinel A) raises the
    watermark past every real row, batch 3 (sentinel B) executes under
    that watermark and flushes the remaining state. Sentinel rows carry
    ``event_type='__sentinel__'`` / negative ids, so any query that
    filters on real event types never emits them.

    ``sentinel_types``: the event_type value(s) stamped on sentinel
    rows. The default never collides with real types, but a query that
    FILTERS on event_type must pass the types it keeps — Catalyst
    pushes deterministic non-event-time predicates below the watermark
    node into the scan, so a filtered-out sentinel never reaches the
    watermark statistics and the flush never happens (observed: the
    watermark stayed at real-data max despite the 2100 sentinels).
    Sentinels always carry NEGATIVE event_id/user_id, so they join
    nothing real and the query drops them from output with an
    ``event_id >= 0``-style predicate.

    This is a drain-harness construct; a production Kafka source has an
    unbounded tail, so state flushes in the normal course of arrival.
    """
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{sf_dir}/events.parquet"
    d = tempfile.mkdtemp(prefix="cqdg_stream_flush_")
    staged = os.path.join(d, "events.parquet")
    os.symlink(path, staged)
    src_schema = pq.read_schema(path)
    now = _time.time()
    for i, year in enumerate((2100, 2101)):
        rows = [
            {
                "event_id": -(i * len(sentinel_types) + k + 1),
                "ts": __import__("datetime").datetime(year, 1, 1),
                "user_id": -(k + 1),
                "event_type": st,
                "value": 0.0,
                "props": "{}",
            }
            for k, st in enumerate(sentinel_types)
        ]
        f = os.path.join(d, f"zz_sentinel_{i}.parquet")
        pq.write_table(
            pa.Table.from_pylist(rows, schema=src_schema.remove_metadata()), f
        )
        os.utime(f, (now - 2 + i, now - 2 + i))
    schema = spark.read.parquet(path).schema
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(df.dtypes).get("ts") == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
