"""Denormalization / nesting operators (SURVEY.md §2.4 A1, §2.3 J7).

The reference's core transformation is groupBy+collect_list(struct(...))
(~15 call sites, e.g. ProcessETLUtils.scala:194-216) and the
"wrap parent as 1-element array of struct" join (DonorIndex.scala:82-89).
These helpers give them names and consistent semantics.

Scale note: collect_list concentrates a whole group into one row. Safe
for bounded fan-in (entities per donor, lines per order); for unbounded
groups prefer re-aggregating to summaries or windowed top-k first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_nest(
    df: DataFrame,
    keys: Sequence[str],
    payload: Sequence[str | Column],
    alias: str,
    sort_by: str | None = None,
) -> DataFrame:
    """groupBy(keys) → collect_list(struct(payload)) AS alias.

    With ``sort_by`` the array is ordered by that payload field via
    array_sort on (sort_key, struct) pairs — collect_list order is
    otherwise partition-dependent (SURVEY §7 risk 5).
    """
    struct_col = F.struct(*payload)
    agg = F.collect_list(struct_col)
    if sort_by is not None:
        agg = F.array_sort(
            F.collect_list(F.struct(F.col(sort_by).alias("_k"), struct_col.alias("_v")))
        )
        return (
            df.groupBy(*keys)
            .agg(agg.alias("_sorted"))
            .withColumn(alias, F.transform(F.col("_sorted"), lambda p: p["_v"]))
            .drop("_sorted")
        )
    return df.groupBy(*keys).agg(agg.alias(alias))


def nest_parent_as_array(
    child: DataFrame,
    parent: DataFrame,
    on: Sequence[str],
    parent_alias: str,
    how: str = "left",
) -> DataFrame:
    """Join a parent entity and embed it as a 1-element array of struct
    (reference: DonorIndex.scala:82-89 ``array(struct("study.*"))``).

    No ``F.broadcast`` hint: this is a generic operator and the parent
    is not guaranteed dimension-sized — an unconditional hint here is
    the corpus-sized-broadcast class the round-8 audit purged from
    retrieval.py / sparse_sim.py / quality.py (driver OOM at fleet
    scale, invisible at harness SFs). The join is equi-keyed, so AQE
    still picks a broadcast join at runtime whenever the wrapped parent
    is actually small (every clinical-model use: the parent is the
    study dimension) and degrades to a shuffle join when it is not.
    """
    parent_cols = [c for c in parent.columns if c not in on]
    wrapped = parent.select(
        *on, F.array(F.struct(*parent_cols)).alias(parent_alias)
    )
    return child.join(wrapped, list(on), how)
