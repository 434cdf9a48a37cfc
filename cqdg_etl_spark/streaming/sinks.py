"""Streaming sinks with exactly-once table semantics.

``foreachBatch`` + dynamic partition overwrite gives idempotent parquet
maintenance: a replayed micro-batch (restart after failure, checkpoint
rollback) rewrites exactly the partitions it touches to the same
content, so the target table converges instead of duplicating. This is
the standard Structured Streaming pattern for "upsert into a partitioned
table" without a transactional table format.

Beyond-reference capability — the reference's only sinks are batch
parquet/JSON overwrites (SURVEY.md §2.1 S6–S9).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def foreach_batch_parquet_upsert(
    stream_df: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    partition_cols: Sequence[str],
) -> StreamingQuery:
    """Drain a bounded stream into a partitioned parquet table,
    idempotently.

    Each micro-batch overwrites ONLY the partitions present in that
    batch (``partitionOverwriteMode=dynamic``), so replaying a batch is
    a no-op content-wise. The checkpoint makes committed batches skip
    entirely on restart; the dynamic overwrite makes *uncommitted but
    written* batches (the crash window between write and commit)
    converge instead of duplicate — together: exactly-once table state.

    Scale: each executor writes its partition's files directly; no
    driver collect, no coalesce bottleneck. Partition columns should be
    low-cardinality (e.g. event date) so a micro-batch touches few
    directories.
    """
    cols = list(partition_cols)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*cols)
            .parquet(target_dir)
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
