"""Vector math over array<float|double> columns — pure built-in expressions.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic in the JVM; no UDF,
no Arrow transfer. Inputs are cast to double for stable accumulation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# NOTE on unrolling: flat element_at(v,1)*c1 + ... expansions of these
# folds were benchmarked as an alternative to the interpreted HOFs and
# LOST both ways — 32×64 unrolled terms push Catalyst planning past
# minutes, and a single 64-term chain hits codegen fallback on the deep
# Add tree and runs ~4× slower than the fold. The fast path for
# per-pair/per-vector hot loops is Arrow (see operators/similarity.py
# _band_keys_arrow/_dot_arrow), which reproduces the fold bit-for-bit
# via elementwise multiply + np.add.accumulate.
