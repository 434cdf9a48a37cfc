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

    group_type = df.schema[group_col].dataType.simpleString()
    out_schema = (
        f"{group_col} {group_type}, n long, med_lo double, med_hi double, "
        "v_min double, v_max double"
    )
    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(
        stats, out_schema
    )


def cusum_drift(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    target: float,
    threshold: float,
) -> DataFrame:
    """One-sided CUSUM drift detector per group (Page, Biometrika '54)
    → (group, n_points, n_alarms, max_s).

    S_0 = 0;  S_i = max(0, (S_{i−1} + x_i) − target);  alarm ⇔ S_i >
    threshold. The clamp at zero breaks prefix-sum decomposability —
    no window/aggregate expression computes it — so this is the
    grouped-map case the module docstring reserves for genuinely
    sequential per-group logic. Groups are entity-sized (a user's
    events), never corpus-wide keys.

    Determinism: float accumulation here is NOT order-free, so the op
    sequence is pinned by sorting each group on ``order_cols`` (a
    total order) and evaluating the recurrence left-to-right with
    plain double ops — the exact op-for-op sequence a recursive-CTE
    oracle performs, so results hash-match despite being IEEE doubles.
    ``max_s`` is returned raw; callers round at the Spark layer.
    """
    import pandas as pd

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values(order_cols, kind="mergesort")
        s = 0.0
        mx = 0.0
        alarms = 0
        for v in g[value_col].to_numpy(dtype="float64"):
            s = max(0.0, (s + float(v)) - target)
            if s > mx:
                mx = s
            if s > threshold:
                alarms += 1
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n_points": [len(g)],
                "n_alarms": [alarms],
                "max_s": [mx],
            }
        )

    group_type = df.schema[group_col].dataType.simpleString()
    out_schema = (
        f"{group_col} {group_type}, n_points long, n_alarms long, "
        "max_s double"
    )
    return (
        df.select(group_col, *order_cols, value_col)
        .groupBy(group_col)
        .applyInPandas(run, out_schema)
    )
