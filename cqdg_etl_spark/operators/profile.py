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

from pyspark.sql import Column, DataFrame, Window as W
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


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    sample of a numeric column → one row per bin:
    (bin, n_ref, n_cur, p_ref, p_cur, psi_term). Σ psi_term is the PSI
    (rule of thumb: < 0.1 stable, > 0.25 drifted) — the standard
    snapshot-to-snapshot distribution-drift gate for feature/quality
    columns between pipeline runs.

    Plan shape: equi-width bins from the REFERENCE side's min/max —
    one 1-row bounds aggregate broadcast onto both sides (the same
    two-pass quantization contract as ``similarity.quantize_int8``),
    then one groupBy(bin) per side; the 2·n_bins-row result is
    densified against ``range(n_bins)`` and the proportions come from
    a whole-frame window sum over those n_bins rows — no third scan of
    either input. Zero-count bins are clamped to ``eps`` before the
    log-ratio (the conventional PSI guard), mirrored in the oracle.
    A constant reference column (max = min) would make the bin width 0
    and turn every bin expression into NaN/Infinity — whose ordering
    under least/greatest differs between engines — so the width is
    clamped to a positive 1e-12: all reference mass lands in bin 0 and
    drifted current values clamp to the edge bins, deterministically on
    every engine (mirror the same ``greatest(w, 1e-12)`` in oracles).
    """
    from pyspark import StorageLevel

    spark = ref.sparkSession
    # 1-row frame, persisted (r11): both binned() calls crossJoin it —
    # unpersisted, each evaluated the min/max aggregate's scan of ref
    # again (3 reference scans for a 2-pass algorithm).
    bounds = ref.agg(
        F.min(value_col).alias("mn"),
        F.greatest(
            (F.max(value_col) - F.min(value_col)) / F.lit(float(n_bins)),
            F.lit(1e-12),
        ).alias("w"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    def binned(df: DataFrame, out: str) -> DataFrame:
        b = F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(value_col) - F.col("mn")) / F.col("w")).cast(
                    "int"
                ),
            ),
        ).cast("long")
        return (
            df.crossJoin(F.broadcast(bounds))
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(out))
        )

    bins = spark.range(n_bins).select(F.col("id").alias("bin"))
    f = (
        bins.join(binned(ref, "c_ref"), "bin", "left")
        .join(binned(cur, "c_cur"), "bin", "left")
        .select(
            "bin",
            F.coalesce("c_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("c_cur", F.lit(0)).alias("n_cur"),
        )
    )
    w_all = W.partitionBy()
    pr = F.greatest(
        F.col("n_ref").cast("double") / F.sum("n_ref").over(w_all).cast("double"),
        F.lit(eps),
    )
    pc = F.greatest(
        F.col("n_cur").cast("double") / F.sum("n_cur").over(w_all).cast("double"),
        F.lit(eps),
    )
    return f.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(pr, 6).alias("p_ref"),
        F.round(pc, 6).alias("p_cur"),
        F.round((pc - pr) * F.log(pc / pr), 6).alias("psi_term"),
    )


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """One-row skew audit of a join/aggregation key — the numbers that
    decide between a plain shuffle join, salting, and AQE skew
    handling: (n_rows, n_keys, top1_share, top10_share, entropy).

    entropy is the Shannon entropy (nats) of the key distribution; a
    top1_share near 1 or entropy near 0 means one reducer receives the
    whole table. Scale shape: the per-key count is one map-side-combined
    aggregate (n_keys output rows); the top-10 comes from
    orderBy+limit — TakeOrderedAndProject, a per-partition top-k merge,
    never a global sort or a single-partition window; the three one-row
    frames meet in broadcast scalar joins. No step materializes more
    than n_keys skinny rows.
    """
    from pyspark import StorageLevel

    # n_keys-row frame, persisted (r11): totals AND the top-10 branch
    # consume it — unpersisted, the corpus-sized per-key count
    # aggregate ran twice.
    cnts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    totals = cnts.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("top1"),
        F.sum(
            F.col("c").cast("double") * F.log(F.col("c").cast("double"))
        ).alias("sum_clnc"),
    )
    top10 = (
        cnts.orderBy(F.desc("c"), F.asc("k"))
        .limit(10)
        .agg(F.sum("c").alias("top10"))
    )
    return (
        totals.crossJoin(F.broadcast(top10))  # 1-row scalar meet
        .select(
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.round(
                F.col("top1").cast("double") / F.col("n_rows"), 6
            ).alias("top1_share"),
            F.round(
                F.col("top10").cast("double") / F.col("n_rows"), 6
            ).alias("top10_share"),
            # H = ln n_rows − Σ c·ln c / n_rows, computed in one pass
            F.round(
                F.log(F.col("n_rows").cast("double"))
                - F.col("sum_clnc") / F.col("n_rows"),
                6,
            ).alias("entropy"),
        )
    )
