"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Writing
both facts bucketed by the join key (same bucket count) moves that
shuffle to write time — every subsequent join on the key plans with
ZERO exchanges (sort-merge over co-located buckets, or not even a sort
when ``sortBy`` matches the join key). tests/test_bucketing.py asserts
the exchange-free plan.

Bucket count guidance: buckets × target file size ≈ table size, and the
count must match across tables joined together (Spark requires equal or
multiple bucket counts to avoid a shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: Sequence[str],
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (optionally sorted) parquet table.

    ``path`` makes it an external table (data at that location);
    otherwise it lands in the session warehouse. Bucketing metadata
    lives in the catalog, so consumers must read via
    ``spark.table(table)``, not ``spark.read.parquet(path)``.
    """
    writer = df.write.format("parquet").mode("overwrite").bucketBy(
        buckets, bucket_cols[0], *bucket_cols[1:]
    )
    if sort_cols:
        writer = writer.sortBy(sort_cols[0], *sort_cols[1:])
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — preserves the bucket spec for exchange-free joins."""
    return spark.table(table)
