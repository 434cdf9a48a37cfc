"""Single-pass table profiling (data-validation for pipeline inputs).

A 100 TB ingest needs cheap schema/quality profiling before heavier
stages; this computes per-column null counts, distinct counts, and
min/max in ONE aggregation over ONE scan (long-format output), instead
of a scan per column.

Beyond-reference capability (the reference validates columns only
against a dictionary allow-list, PreProcessETL.scala:75-81 — it has no
value-level profiling).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str], exact_distinct: bool = True
) -> DataFrame:
    """Profile `cols` → (column, n_nonnull, n_nulls, n_distinct,
    min_str, max_str), one row per column.

    Everything folds into a single global aggregate (one scan, one
    1-row exchange) followed by a driver-trivial unpivot (``stack`` on
    a 1-row frame).

    ``exact_distinct=True`` uses ``countDistinct``: with multiple
    distinct aggregates Catalyst plans an Expand that replicates every
    row once per profiled column — exact, but a len(cols)× row blowup
    before the partial aggregate. At 100 TB profile widths > a few
    columns should pass ``exact_distinct=False`` to use HyperLogLog
    (``approx_count_distinct``, one pass, no Expand, ~2% error).

    min/max are cast to string after the aggregate (type-preserving
    comparison, string-typed output) so heterogeneous columns share
    one output schema.
    """
    aggs: list[Column] = []
    for c in cols:
        col = F.col(c)
        ndv = (
            F.countDistinct(col)
            if exact_distinct
            else F.approx_count_distinct(col)
        )
        aggs += [
            F.count(col).alias(f"{c}__nonnull"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("bigint").alias(
                f"{c}__nulls"
            ),
            ndv.alias(f"{c}__ndv"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__nonnull`, `{c}__nulls`, `{c}__ndv`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stack_args}) as "
        "(column, n_nonnull, n_nulls, n_distinct, min_str, max_str)"
    )


def fixed_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int,
) -> DataFrame:
    """Fixed-width histogram → (bucket, lo_edge, hi_edge, cnt).

    Bucket ids: 0..n_buckets-1 inside [lo, hi); -1 catches underflow,
    ``n_buckets`` catches overflow (and the exact upper edge). With the
    edges given a priori this is a single scan + one aggregate over at
    most n_buckets+2 groups — map-side combine collapses each input
    partition to its local histogram, so the exchange carries
    #partitions × #buckets tiny rows regardless of table size. (When
    edges are unknown, run profile_columns first for min/max — two
    scans total, still no full-data shuffle.)
    """
    width = (hi - lo) / n_buckets
    c = F.col(col)
    bucket = (
        F.when(c < lo, F.lit(-1))
        .when(c >= hi, F.lit(n_buckets))
        .otherwise(F.floor((c - lo) / width))
        .cast("bigint")
    )
    return (
        df.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
        .select(
            "bucket",
            F.round(F.lit(lo) + F.col("bucket") * width, 6).alias("lo_edge"),
            F.round(F.lit(lo) + (F.col("bucket") + 1) * width, 6).alias("hi_edge"),
            "cnt",
        )
    )
