"""Incremental aggregate maintenance (partial-rollup merge).

At 100 TB you do not recompute a corpus-wide rollup when a day of data
lands — you aggregate the NEW partition into a partial state and merge
it with the stored partials. That only works for aggregates with an
associative merge: sum/count/min/max merge exactly; avg is derived at
read time from (sum, count) — never stored, because avg does not merge.

``partial_rollup`` produces the mergeable state for one batch;
``merge_rollups`` folds any number of batch states into the same
result a full recompute would give (verified exactly by the
``etl_incremental_rollup`` oracle, which IS the full recompute).

Scale shape: each batch aggregates with map-side partial combine (one
shuffle on the group keys, sized by #groups not #rows); the merge is a
union of #batches × #groups tiny frames + one more grouped sum —
independent of the fact-table size entirely.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partial_rollup(
    batch: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Mergeable per-group state for one batch: exact-decimal sum (so
    merge order can never flip a rounded value), count, min, max."""
    return batch.groupBy(*group_cols).agg(
        F.sum(F.col(value_col).cast("decimal(27,6)")).alias("p_sum"),
        F.count(value_col).alias("p_count"),
        F.min(value_col).alias("p_min"),
        F.max(value_col).alias("p_max"),
    )


def merge_rollups(partials: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Fold batch states into the full rollup; avg derived at the end."""
    merged = reduce(DataFrame.unionByName, partials)
    out = merged.groupBy(*group_cols).agg(
        F.sum("p_sum").alias("d_sum"),
        F.sum("p_count").alias("n"),
        F.min("p_min").alias("v_min"),
        F.max("p_max").alias("v_max"),
    )
    return out.select(
        *group_cols,
        F.round(F.col("d_sum"), 2).cast("double").alias("v_sum"),
        "n",
        "v_min",
        "v_max",
        F.round(F.col("d_sum").cast("double") / F.col("n"), 4).alias("v_avg"),
    )
