"""Slowly-changing-dimension (type 2) merge.

The batch MERGE a warehouse ETL runs when a new dimension snapshot
arrives: close changed/deleted rows, open new versions, keep unchanged
history. Expressed as ONE full-outer join plus an explode of per-key
output rows — no MERGE statement, no transactional table format
required, and the whole operation is a single shuffle on the business
key per side.

Beyond-reference capability (the reference overwrites dimensions
wholesale — SaveMode.Overwrite at processes.scala:21-39 — and keeps no
history).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    current: DataFrame,
    snapshot: DataFrame,
    key: str,
    tracked: Sequence[str],
    snapshot_ts: str,
    close_deleted: bool = True,
) -> DataFrame:
    """Merge a new snapshot into SCD2 history.

    ``current`` holds the dimension history: ``key``, ``tracked``
    attribute columns, ``valid_from``/``valid_to`` (string dates,
    ``valid_to`` null = open row), ``is_current``. ``snapshot`` holds
    the new state: ``key`` + ``tracked``.

    Per key, the outcome is decided by comparing the open row's
    tracked attributes with the snapshot's (null-safe equality):

    - unchanged → open row passes through;
    - changed   → open row closes at ``snapshot_ts`` AND a new open
      row is emitted (the explode emits 2 rows);
    - new key   → new open row;
    - deleted   → open row closes (if ``close_deleted``).

    Closed history rows never join (filtered to open rows first) and
    are unioned back untouched — at 100 TB the join only moves the
    *open* row set plus the snapshot, both shuffled once on the key;
    history (the bulk of the table) is scan-and-append only.
    """
    tracked = list(tracked)
    open_rows = current.filter(F.col("is_current"))
    closed_rows = current.filter(~F.col("is_current"))

    cur = open_rows.select(
        F.col(key).alias("_k"),
        F.struct(*tracked).alias("_cur_attrs"),
        F.col("valid_from").alias("_cur_from"),
    )
    snap = snapshot.select(
        F.col(key).alias("_sk"), F.struct(*tracked).alias("_snap_attrs")
    )
    j = cur.join(snap, F.col("_k") == F.col("_sk"), "full_outer")

    has_cur = F.col("_k").isNotNull()
    has_snap = F.col("_sk").isNotNull()
    changed = has_cur & has_snap & ~F.col("_cur_attrs").eqNullSafe(F.col("_snap_attrs"))
    deleted = has_cur & ~has_snap
    is_new = ~has_cur & has_snap

    def out_row(attrs, valid_from, valid_to, is_current):
        return F.struct(
            F.coalesce(F.col("_k"), F.col("_sk")).alias(key),
            attrs.alias("_attrs"),
            valid_from.alias("valid_from"),
            valid_to.alias("valid_to"),
            is_current.alias("is_current"),
        )

    ts = F.lit(snapshot_ts)
    null_ts = F.lit(None).cast("string")
    survivor = F.when(
        changed,
        F.array(
            out_row(F.col("_cur_attrs"), F.col("_cur_from"), ts, F.lit(False)),
            out_row(F.col("_snap_attrs"), ts, null_ts, F.lit(True)),
        ),
    ).when(
        deleted,
        F.array(
            out_row(F.col("_cur_attrs"), F.col("_cur_from"), ts, F.lit(False))
        )
        if close_deleted
        else F.array(
            out_row(F.col("_cur_attrs"), F.col("_cur_from"), null_ts, F.lit(True))
        ),
    ).when(
        is_new, F.array(out_row(F.col("_snap_attrs"), ts, null_ts, F.lit(True)))
    ).otherwise(  # unchanged
        F.array(
            out_row(F.col("_cur_attrs"), F.col("_cur_from"), null_ts, F.lit(True))
        )
    )

    merged = (
        j.select(F.explode(survivor).alias("_r"))
        .select(
            F.col(f"_r.{key}").alias(key),
            *[F.col(f"_r._attrs.{c}").alias(c) for c in tracked],
            F.col("_r.valid_from").alias("valid_from"),
            F.col("_r.valid_to").alias("valid_to"),
            F.col("_r.is_current").alias("is_current"),
        )
    )
    history = closed_rows.select(
        key, *tracked, "valid_from", "valid_to", "is_current"
    )
    return history.unionByName(merged)
