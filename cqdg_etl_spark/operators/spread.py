"""Input spreading for heavy per-row operators.

A small parquet input arrives as ONE scan partition (single row group,
unsplittable), so an operator whose cost is per-row Python or a heavy
per-row expression chain runs serially however many cores the session
has. Aligning such inputs to ``spark.sql.shuffle.partitions`` — the
width every downstream shuffle uses anyway, tuned to the cluster at
production scale — spreads the per-row work across the executor cores
for the price of one skinny round-robin exchange. At real corpus scale
the scan already has enough partitions and the exchange is a no-op-cost
pass-through of the same rows (guide §2.5 "input skew: repartition
immediately after the read").

Only safe for operators whose per-row results are independent of
partitioning (pure row-wise functions, or pipelines whose downstream
aggregation is order-insensitive). Operators that sum floating-point
partials across partitions (e.g. embstats covariance) must NOT spread:
more partitions changes double-summation order and therefore low bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_to_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` across the session's shuffle parallelism.

    Not guarded on ``df.rdd.getNumPartitions()`` (same rationale as the
    dedup module's ``_spread``): that forces physical planning of the
    whole frame on the driver per call just to sometimes skip a cheap
    exchange of skinny rows. Instead the knob is a session conf:
    ``spark.cqdg.spreadInputs`` (default true). A production cluster
    whose scans are already parallel (splittable parquet, many files)
    sets it false and the helper is an exact no-op — the local default
    keeps the single-row-group bench inputs from serializing per-row
    work on one core.
    """
    if (
        df.sparkSession.conf.get("spark.cqdg.spreadInputs", "true").lower()
        == "false"
    ):
        return df
    target = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    return df.repartition(target)
