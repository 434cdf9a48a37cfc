"""Declarative data-quality expectations — the validation gate a
large-scale ingest runs before anything downstream trusts a table.

Four check kinds, each returning (check, violations, passed):

- ``not_null(col)``       — NULL count must be 0
- ``in_range(col, lo, hi)`` — values outside [lo, hi] (NULLs ignored)
- ``unique(col)``         — duplicate count (count - countDistinct)
- ``ref_integrity(col → dim.key)`` — orphan foreign keys

Scale shape: every aggregate check folds into ONE pass over the fact
table (a single agg() with conditional sums — map-side combined, one
exchange); each referential check is a broadcast anti-join against its
dimension (dims are the broadcastable side by definition), contributing
one skinny count branch to the final union. No check materializes
violating rows — production flows re-query with the check predicate
when a gate fails.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    violations: Column  # aggregate expression over the fact table


def not_null(col: str) -> Check:
    return Check(
        f"{col}_not_null",
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)),
    )


def in_range(col: str, lo, hi) -> Check:
    return Check(
        f"{col}_in_range",
        F.sum(
            F.when((F.col(col) < lo) | (F.col(col) > hi), 1).otherwise(0)
        ),
    )


def unique(col: str) -> Check:
    return Check(
        f"{col}_unique", F.count(col) - F.count_distinct(F.col(col))
    )


def expectation_report(
    df: DataFrame,
    checks: list[Check],
    ref_checks: list[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Run all checks → (check, violations, passed), one row per check.

    ``ref_checks``: (fk_col, dim_df, key_col) triples; each contributes
    a broadcast left-anti orphan count. Either list may be empty (a
    referential-integrity-only gate passes checks=[]; df.agg() with no
    expressions would raise), but not both.
    """
    if not checks and not ref_checks:
        raise ValueError("expectation_report needs at least one check")
    report = None
    if checks:
        agg_row = df.agg(
            *[c.violations.cast("bigint").alias(c.name) for c in checks]
        )
        report = agg_row.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c.name).alias("check"),
                            F.col(c.name).alias("violations"),
                        )
                        for c in checks
                    ]
                )
            ).alias("r")
        ).select("r.check", "r.violations")
    for fk, dim, key in ref_checks:
        orphans = (
            df.select(F.col(fk))
            .filter(F.col(fk).isNotNull())
            .join(F.broadcast(dim.select(key)), F.col(fk) == F.col(key), "left_anti")
            .agg(F.count("*").cast("bigint").alias("violations"))
            .select(
                F.lit(f"{fk}_ri_{key}").alias("check"), "violations"
            )
        )
        report = orphans if report is None else report.unionByName(orphans)
    return report.select(
        "check", "violations", (F.col("violations") == 0).alias("passed")
    )
