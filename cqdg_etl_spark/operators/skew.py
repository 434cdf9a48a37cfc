"""Skew-mitigation join strategies.

AQE's runtime skew-join splitting (on in session.py) handles most skew;
this module is the *deterministic* fallback for keys known to be hot at
plan time — e.g. a null-bucket, a mega-customer, a stop-shingle — where
pre-splitting beats waiting for AQE to detect the skew.

``salted_join`` implements the classic transform: the skewed (large)
side gets a per-row salt in [0, salt); the other side is replicated
``salt`` times; the join key becomes (key, salt), splitting each hot
key's rows across ``salt`` reducers. Row multiplicity is unchanged, so
any downstream aggregate is exactly equal to the unsalted join — which
is what the registry oracle checks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Join ``skewed`` (large, hot-keyed) with ``other`` (too big to
    broadcast, small enough to replicate ``salt``×).

    The salt is derived from xxhash64 over the skewed side's full row —
    deterministic for a given input, uniform across reducers. Supported
    ``how``: inner / left joins (the replicated side must be the
    preserved-row side's *lookup*, so right/full are not meaningful).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salted = skewed.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt))
    )
    replicated = other.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted.join(replicated, [*keys, SALT_COL], how).drop(SALT_COL)
