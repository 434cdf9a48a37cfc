"""Exact money aggregation on the fast path (long micro-units).

``registry.dec_sum`` accumulates in DECIMAL(18,6) so the rounded 2dp
result is summation-order independent (matches the DuckDB oracle).
Correct, but Spark's decimal sum widens the accumulator to DECIMAL(28,6),
which exceeds the 18-digit compact-long representation and falls back to
JVM BigDecimal per row — measured ~6x slower than a long sum and the
dominant cost of scan-heavy aggregates (TPC-H Q1 at sf0.1: 1.36s of a
2.0s query).

These helpers keep the exact-decimal *semantics* while accumulating in
a primitive ``long`` of micro-units (value * 1e6, HALF_UP): per-row
``round(col * 1e6) AS long`` quantizes to the same 6-decimal grid as
``CAST(col AS DECIMAL(18,6))`` (both JVM paths quantize
``BigDecimal.valueOf(double)``, i.e. the double's shortest decimal
representation, with HALF_UP), and a long sum of the quantized units is
exact. The final value is rebuilt as a decimal (``sum * DECIMAL '0.000001'``
— exact decimal multiply, no double division) so rounding matches
``dec_sum`` bit-for-bit. Equality with the decimal path is asserted in
tests/test_correctness.py over sf0.1 (600k rows).

Overflow analysis (the reason there are two entry points):

- ``micro_sum`` — single-phase, the whole group accumulates in one long.
  Safe iff rows-per-group * max_value * 1e6 < 2^63, i.e. bounded groups:
  per-order lineitems (<= 7), per-customer orders, per-document shingles.
  NOT safe for whole-table groups at 100 TB (TPC-H Q1 has 6 groups over
  6e9 rows at sf1000 -> ~1e20 units > 2^63).
- ``micro_agg`` — two-phase for unbounded/low-cardinality groups:
  phase 1 groups by (spark_partition_id, keys) and sums in long — bounded
  by rows *per input partition* (<= ~6M rows per 128 MB parquet split
  * 1e11 max units = 6e17 << 2^63, a 1500x margin regardless of total
  data size); phase 2 merges the per-partition longs as DECIMAL(28,0)
  (exact, unbounded). The extra shuffle moves only
  (#partitions x #groups) rows — negligible exactly when this variant
  is needed (few groups). Phase 1's partial aggregation is computed
  map-side (partition id is in the key, so every group is local to its
  input split); Catalyst's partial/final split makes the phase-1
  exchange carry only pre-aggregated rows.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _micro_inv() -> Column:
    """Exact decimal rescale factor: long micro-units -> decimal(_, 6).
    Built lazily — F.lit needs an active SparkContext at import time."""
    return F.lit("0.000001").cast("decimal(7,6)")


def _long_units(col: Column) -> Column:
    """Quantize a double column to long micro-units (HALF_UP at 6dp)."""
    return F.round(col * MICRO).cast("long")


def _units_to_decimal(sum_units: Column) -> Column:
    """Rebuild the exact decimal value from summed micro-units."""
    return sum_units.cast("decimal(28,0)") * _micro_inv()


def micro_sum(col: Column, scale: int = 2) -> Column:
    """Drop-in for ``registry.dec_sum`` when groups are bounded
    (see module docstring for the overflow analysis)."""
    return F.round(_units_to_decimal(F.sum(_long_units(col))), scale).cast("double")


def micro_agg(
    df: DataFrame,
    keys: Sequence[str | Column],
    sums: Mapping[str, Column] | None = None,
    avgs: Mapping[str, Column] | None = None,
    count_star: str | None = None,
    scale: int = 2,
    avg_scale: int = 4,
) -> DataFrame:
    """Two-phase exact money aggregation for unbounded groups.

    Returns ``df.groupBy(keys)`` with, per name: ``sums`` as
    ``round(exact_sum, scale) AS double`` (== ``dec_sum``), ``avgs`` as
    ``round(exact_sum AS double / count, avg_scale)`` (== ``dec_avg``),
    and optionally ``count(*) AS count_star``.
    """
    sums = dict(sums or {})
    avgs = dict(avgs or {})
    key_names = [k if isinstance(k, str) else None for k in keys]
    # Materialize Column keys in phase 1 so phase 2 can regroup by name.
    p1_keys: list[Column] = [F.spark_partition_id().alias("_pid")]
    final_names: list[str] = []
    for i, k in enumerate(keys):
        if isinstance(k, str):
            p1_keys.append(F.col(k))
            final_names.append(k)
        else:
            name = key_names[i] or f"_k{i}"
            p1_keys.append(k)
            # pull the alias Spark assigned (Column.alias upstream)
            final_names.append(df.select(k).columns[0])

    p1_aggs = [
        F.sum(_long_units(c)).alias(f"_s_{n}") for n, c in {**sums, **avgs}.items()
    ]
    p1_aggs += [F.count(c).alias(f"_n_{n}") for n, c in avgs.items()]
    if count_star:
        p1_aggs.append(F.count("*").alias("_cnt"))
    p1 = df.groupBy(*p1_keys).agg(*p1_aggs)

    out: list[Column] = []
    for n in sums:
        out.append(
            F.round(
                _units_to_decimal(F.sum(F.col(f"_s_{n}").cast("decimal(28,0)"))),
                scale,
            )
            .cast("double")
            .alias(n)
        )
    for n in avgs:
        out.append(
            F.round(
                _units_to_decimal(F.sum(F.col(f"_s_{n}").cast("decimal(28,0)")))
                .cast("double")
                / F.sum(F.col(f"_n_{n}")),
                avg_scale,
            ).alias(n)
        )
    if count_star:
        out.append(F.sum("_cnt").alias(count_star))
    return p1.groupBy(*final_names).agg(*out)
