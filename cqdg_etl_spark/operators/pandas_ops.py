"""Grouped-map Pandas operators (``groupBy(...).applyInPandas``) —
the third Arrow-batched Python API class next to scalar
``pandas_udf`` (textstats.quality_score_vectorized) and
``applyInPandasWithState`` (streaming.stateful): each group arrives as
ONE pandas DataFrame, the function returns a DataFrame per group.

When to reach for it: per-group logic that genuinely needs the whole
group in memory at once (order statistics, model fits, resampling) and
can't be a window/aggregate expression. The contract at scale: a GROUP
must fit in one executor's memory — keys here are user ids with
hundreds of rows, not corpus-wide keys; for skewed keys pre-split with
salting and merge.

Determinism: outputs are SELECTIONS (sorted-order statistics), never
accumulations — numpy float sums are pairwise/SIMD and depend on row
arrival order, but the k-th element of the sorted multiset is the same
value no matter how the shuffle ordered the rows. That is what makes
these exact-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def grouped_order_stats(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group order statistics via applyInPandas → (group, n,
    med_lo, med_hi, v_min, v_max).

    med_lo/med_hi are the lower/upper middle elements of the sorted
    multiset (equal when n is odd) — selections, so engine-exact; the
    conventional interpolated median is (med_lo+med_hi)/2, left to the
    caller because interpolation formulas differ across engines in the
    last ulp.
    """
    import numpy as np
    import pandas as pd

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(pdf[value_col].to_numpy(np.float64))
        n = len(v)
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n": [n],
                "med_lo": [v[(n - 1) // 2]],
                "med_hi": [v[n // 2]],
                "v_min": [v[0]],
                "v_max": [v[-1]],
            }
        )

    out_schema = (
        f"{group_col} long, n long, med_lo double, med_hi double, "
        "v_min double, v_max double"
    )
    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(
        stats, out_schema
    )
