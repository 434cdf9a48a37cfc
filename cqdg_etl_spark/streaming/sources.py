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
