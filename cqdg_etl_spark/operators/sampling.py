"""Deterministic sampling & split assignment for training-data pipelines.

``df.sample``/``sampleBy`` are seed-deterministic only per partitioning
and per engine — useless for reproducible train/val splits that must
survive repartitioning, backfills, or a different engine re-deriving
the same split. These operators derive membership from a hash of the
row's stable id instead:

    bucket(id) = first 8 hex digits of md5(salt || id)  in [0, 2^32)

- the same row lands in the same split forever, on any engine that can
  compute md5 (the DuckDB oracles reproduce the exact assignment);
- no shuffle, no state: membership is a per-row projection, fully
  pushed into the scan stage;
- changing ``salt`` redraws the assignment (new experiment), changing
  rates only moves boundary buckets (splits stay nested: a 5% sample
  is a subset of the 10% sample with the same salt).

md5 (not xxhash64) is deliberate: it is the portable choice every
engine agrees on; the cost is amortized inside the scan projection.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_BUCKETS = 1 << 32


def hash_bucket(id_col: Column, salt: str = "") -> Column:
    """Stable uniform bucket in [0, 2^32) from a row id."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def assign_split(
    df: DataFrame,
    id_col: str,
    splits: Mapping[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Add a split label ('train'/'val'/...) by cumulative bucket range.

    ``splits`` maps label -> fraction; fractions must sum to <= 1 (any
    remainder is labeled None — useful for holding data back).
    """
    expr: Column = F.lit(None).cast("string")
    bucket = hash_bucket(F.col(id_col), salt)
    cum = 0.0
    conds = []
    for label, frac in splits.items():
        cum += frac
        conds.append((bucket < int(cum * _BUCKETS), label))
    for cond, label in reversed(conds):
        expr = F.when(cond, F.lit(label)).otherwise(expr)
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows (e.g. keep 50%
    of lang='en', 10% of everything else). Pure projection + filter —
    reproducible regardless of partitioning or engine."""
    bucket = hash_bucket(F.col(id_col), salt)
    threshold: Column = F.lit(int(default_rate * _BUCKETS))
    for value, rate in rates.items():
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(rate * _BUCKETS))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def mixture_weighted_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    weights: Mapping[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Sample the LARGEST corpus whose domain mixture matches ``weights``
    (target proportions per domain value, e.g. language or source mix
    for a training run). Domains absent from ``weights`` are dropped.

    Derivation: each domain d with n_d rows caps the feasible total at
    floor(n_d / w_d); the binding constraint N = min_d of those caps;
    per-domain keep-rate = N·w_d / n_d. Membership is then the usual
    deterministic md5-bucket test, so the sample is reproducible on any
    engine and stable under repartitioning — and nested: lowering N
    keeps a subset of the same rows per domain.

    Scale shape: ONE map-side-combined aggregate over the corpus for
    the domain counts; the per-domain threshold table (|domains| rows)
    is derived from it and broadcast back; membership is a per-row
    projection+filter in the scan stage. All float arithmetic is a
    fixed left-to-right expression both engines evaluate identically
    (each IEEE op correctly rounded), and thresholds go through an
    explicit floor() so no engine-specific double→int rounding is
    involved.
    """
    w_map = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in (kv[0], float(kv[1]))]
    )
    from pyspark import StorageLevel

    # |domains|-row frame with a corpus-aggregate lineage: persisted
    # (r11) because BOTH n_target and the threshold projection consume
    # it — unpersisted, the corpus count aggregate ran twice (plus the
    # membership scan: 3 corpus passes for a 2-pass algorithm).
    counts = (
        df.groupBy(domain_col)
        .agg(F.count("*").alias("n_domain"))
        .withColumn("w", w_map[F.col(domain_col)])
        .filter(F.col("w").isNotNull())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_target = counts.agg(
        F.min(
            F.floor(F.col("n_domain").cast("double") / F.col("w"))
        ).alias("n_target")
    )
    thresholds = counts.crossJoin(F.broadcast(n_target)).select(
        F.col(domain_col),
        F.col("n_domain"),
        F.floor(
            F.col("n_target").cast("double")
            * F.col("w")
            / F.col("n_domain").cast("double")
            * F.lit(float(_BUCKETS))
        ).alias("thr"),
    )
    bucket = hash_bucket(F.col(id_col), salt)
    return df.join(F.broadcast(thresholds), domain_col).filter(
        bucket < F.col("thr")
    )


def pps_systematic_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sampling, k picks
    per stratum (Madow '49): lay every row's integer weight end-to-end
    along a line of length T (the stratum's weight total), drop k
    equally-spaced pins, keep the rows a pin lands in. Inclusion
    probability ∝ weight, zero randomness, zero libm — row i is
    selected iff

        (cum_i · k) DIV T  >  (cum_{i-1} · k) DIV T

    with cum the running weight sum in ``id_col`` order. ALL-INTEGER
    arithmetic (the classic floor-ratio form), so the sample is
    engine-exact — no u^(1/w) keys, no pow/ln ulp hazards.

    One shuffle: a single window partitioned by stratum (ordered by
    id) computes both the running sum and the stratum total. Rows with
    weight > T/k can straddle several pins — they are kept once with
    ``n_pins`` recording their multiplicity (standard PPS-with-
    replacement accounting).
    """
    w_ord = W.partitionBy("_st").orderBy(id_col).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_all = W.partitionBy("_st")
    base = df.select(
        F.col(stratum_col).alias("_st"),
        F.col(id_col).alias(id_col),
        F.col(weight_col).cast("long").alias("_w"),
    )
    cum = base.select(
        "_st",
        id_col,
        "_w",
        F.sum("_w").over(w_ord).alias("_cum"),
        F.sum("_w").over(w_all).alias("_t"),
    )
    pins = F.expr(f"(_cum * {k}) DIV _t") - F.expr(
        f"((_cum - _w) * {k}) DIV _t"
    )
    return (
        cum.withColumn("n_pins", pins.cast("long"))
        .filter(F.col("n_pins") > 0)
        .select(
            F.col("_st").alias(stratum_col),
            id_col,
            F.col("_w").alias(weight_col),
            "n_pins",
        )
    )
