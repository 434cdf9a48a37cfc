"""Snapshot diff (CDC-style table comparison).

ETL pipelines re-landing a source table need the change set between two
snapshots — what was inserted, deleted, or updated — to drive
incremental downstream refresh instead of full recompute. (The
reference rebuilds every index from scratch each run,
``ETL.scala:40-58``; a diff operator is what an incremental version of
that pipeline would be built on.)

Scale shape: ONE full-outer shuffle join on the key columns (AQE
handles skew/size), classification is a pure projection. Column
comparison uses null-safe equality (`<=>`) per compared column — no
row serialization, no UDF; at wide schemas pass ``compare_cols`` to
limit the compare to the columns that matter (the others are still
carried on the output for the consumer).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def keep_latest(
    log: DataFrame,
    keys: list[str],
    order_cols: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """Compact a change log to its latest row per key — the
    merge-on-read / CDC-upsert compaction primitive (the read side of
    what ``foreach_batch_parquet_upsert`` maintains incrementally).

    Shape matters at scale: this is a ``groupBy(keys).agg(max_by(...))``
    — an associative aggregate with MAP-SIDE partial combine, so each
    input partition pre-reduces to ≤ #distinct-keys rows before the
    shuffle. The obvious window formulation (row_number over key order
    by ts desc) shuffles and SORTS every log row instead; for a log
    with high update multiplicity the aggregate moves a fraction of the
    data the window does.

    ``order_cols`` must form a total order per key (add a unique id as
    tiebreaker) — otherwise "latest" is partition-dependent.
    ``payload_cols`` and ``order_cols`` must be disjoint (both are
    carried on the output, order columns last).
    """
    ord_struct = F.struct(*[F.col(c) for c in order_cols])
    val_struct = F.struct(*[F.col(c) for c in payload_cols + order_cols])
    latest = log.groupBy(*keys).agg(
        F.max_by(val_struct, ord_struct).alias("_latest")
    )
    return latest.select(
        *keys,
        *[F.col(f"_latest.{c}").alias(c) for c in payload_cols + order_cols],
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify each key across two snapshots.

    Returns one row per key present in either snapshot:
    ``keys..., change_type`` where change_type ∈
    {'insert', 'delete', 'update', 'unchanged'}.

    - insert: key only in ``new``
    - delete: key only in ``old``
    - update: key in both, any compared column differs (null-safe)
    - unchanged: key in both, all compared columns equal

    ``keys`` must be non-null in both snapshots (the CDC-key contract;
    presence is detected through the first key column). Compared
    columns may be null — the compare is null-safe. An empty
    ``compare_cols`` classifies every both-sides key as unchanged.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    o = old.alias("o")
    n = new.alias("n")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys],
    )
    # presence flags must come from non-null key columns, not from
    # compared columns (which may legitimately be null)
    o_present = F.col(f"o.{keys[0]}").isNotNull()
    n_present = F.col(f"n.{keys[0]}").isNotNull()
    same: Column = reduce(
        lambda a, b: a & b,
        [F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in compare_cols],
        F.lit(True),
    )
    change = (
        F.when(~o_present, F.lit("insert"))
        .when(~n_present, F.lit("delete"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("update"))
    )
    key_cols = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys
    ]
    return o.join(n, cond, "full_outer").select(
        *key_cols, change.alias("change_type")
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    delete_missing: bool = False,
) -> DataFrame:
    """General MERGE INTO semantics as a batch operator: the next
    version of ``target`` after applying ``source`` —

    - key in both            → source row wins (WHEN MATCHED UPDATE)
    - key only in source     → inserted (WHEN NOT MATCHED INSERT)
    - key only in target     → kept, or dropped when
      ``delete_missing=True`` (WHEN NOT MATCHED BY SOURCE DELETE —
      the "source is a full snapshot" mode)

    Both inputs must share a schema and satisfy the CDC-key contract
    (non-null keys, source unique per key — pre-compact a multi-row
    change log with ``keep_latest`` first).

    Scale shape: ONE full-outer shuffle join on the keys (AQE handles
    skew), then a pure per-column coalesce projection — no window, no
    UDF, no second pass. This is the read-side spec that
    ``foreach_batch_parquet_upsert`` maintains incrementally partition
    by partition; as a batch operator it is the engine's equivalent of
    Delta/Iceberg MERGE for plain-parquet pipelines.
    """
    payload = [c for c in target.columns if c not in keys]
    t = target.alias("t")
    s = source.alias("s")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys],
    )
    joined = t.join(s, cond, "full_outer")
    # presence probes through the first key column (non-null contract)
    in_s = F.col(f"s.{keys[0]}").isNotNull()
    in_t = F.col(f"t.{keys[0]}").isNotNull()
    out = joined.select(
        *[F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k) for k in keys],
        *[
            F.when(in_s, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in payload
        ],
        in_s.alias("_in_s"),
        in_t.alias("_in_t"),
    )
    if delete_missing:
        out = out.filter(F.col("_in_s"))
    return out.drop("_in_s", "_in_t")
