"""Embedding-matrix statistics: covariance structure and its spectrum.

The covariance matrix of an embedding corpus is the workhorse audit for
representation collapse (rank-deficient spectra), anisotropy (one
dominant direction — the classic sentence-embedding pathology), and
whitening/PCA preprocessing decisions before ANN indexing or semantic
dedup. At corpus scale it is a textbook one-pass distributed GEMM:
every partition contributes a d×d partial Xᶜᵀ·Xᶜ, and d is small
(64–4096), so the reduce side is O(partitions · d²) regardless of row
count.

Engine-exactness follows the repo-wide convention (queries/registry.py):
float64 arithmetic, explicit round(6) on both the Spark and the DuckDB
oracle side so summation-order differences cannot flip the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dimension_means(
    df: DataFrame, vec_col: str = "embedding"
) -> list[float]:
    """Per-dimension mean as a bounded driver-side list (O(d) values) —
    closure data for the covariance kernel, same pattern as the IVF
    centroids. One shuffle: posexplode → per-dim avg (map-side partial
    over the dim-replicated rows)."""
    rows = (
        df.select(F.posexplode(F.col(vec_col).cast("array<double>")))
        .groupBy("pos")
        .agg(F.avg("col").alias("m"))
        .orderBy("pos")
        .collect()
    )
    return [r["m"] for r in rows]


def covariance_cells(
    df: DataFrame,
    vec_col: str = "embedding",
    means: list[float] | None = None,
) -> DataFrame:
    """Upper-triangle covariance cells (i, j, cov) of the embedding
    matrix, 0-based dims, i ≤ j, cov rounded to 6dp.

    cov(i,j) = Σ (xᵢ−μᵢ)(xⱼ−μⱼ) / n  (population covariance — the
    denominator every PCA/whitening pipeline uses).

    Scale shape: the d means ride the Arrow-kernel closure; each corpus
    partition computes ONE numpy partial Xᶜᵀ·Xᶜ per Arrow batch plus
    its row count and emits d·(d+1)/2 + 1 skinny partial rows. The
    groupBy(i, j) reduce therefore aggregates O(partitions · d²) rows —
    independent of corpus size, the shape that survives 100 TB. No
    join, no per-pair row explosion (a posexplode self-join formulation
    shuffles n·d² product rows — d× the corpus — and was rejected for
    exactly that reason).
    """
    import numpy as np
    import pandas as pd

    mu = np.asarray(
        means if means is not None else dimension_means(df, vec_col),
        dtype=np.float64,
    )
    d = len(mu)
    iu = np.triu_indices(d)

    def partials(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(pdf["_v"].tolist(), dtype=np.float64) - mu
            s = x.T @ x  # d × d partial of the centered Gram matrix
            yield pd.DataFrame(
                {
                    "i": np.append(iu[0].astype(np.int64), -1),
                    "j": np.append(iu[1].astype(np.int64), -1),
                    "s": np.append(s[iu], float(len(pdf))),
                }
            )

    agg = (
        df.select(F.col(vec_col).cast("array<double>").alias("_v"))
        .mapInPandas(partials, "i bigint, j bigint, s double")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
    )
    n = agg.filter(F.col("i") == -1).select(F.col("s").alias("n"))
    return (
        agg.filter(F.col("i") >= 0)
        .crossJoin(F.broadcast(n))  # 1-row corpus scalar
        .select(
            "i",
            "j",
            # + 0.0 canonicalizes IEEE negative zero (a tiny negative
            # covariance rounds to -0.0 on some engines; -0.0 + 0.0 is
            # +0.0 in every rounding mode) so stringified driver
            # compares can't split on the sign of zero.
            (F.round(F.col("s") / F.col("n"), 6) + F.lit(0.0)).alias("cov"),
        )
    )


def _cov_matrix(df: DataFrame, vec_col: str, means: list[float] | None = None):
    """Collect covariance_cells into the symmetric d×d numpy matrix —
    the bounded closure-scale reconstruction shared by the spectrum and
    whitening fits."""
    import numpy as np

    cells = covariance_cells(df, vec_col, means=means).collect()
    if not cells:
        raise ValueError("empty corpus: no covariance cells")
    d = max(r["j"] for r in cells) + 1
    c = np.zeros((d, d))
    for r in cells:
        c[r["i"], r["j"]] = r["cov"]
        c[r["j"], r["i"]] = r["cov"]
    return c


def covariance_spectrum(
    df: DataFrame, vec_col: str = "embedding"
) -> list[float]:
    """Eigenvalues of the covariance matrix, descending — the
    representation-collapse / anisotropy audit (effective rank, top-1
    energy share). Driver-side eigh on the collected d×d matrix: the
    distributed work is covariance_cells; the O(d²) collect is bounded
    closure-scale data, not corpus data."""
    import numpy as np

    c = _cov_matrix(df, vec_col)
    return sorted((float(v) for v in np.linalg.eigvalsh(c)), reverse=True)


def whitening_matrix(
    df: DataFrame, vec_col: str = "embedding", eps: float = 1e-6
):
    """PCA whitening transform W = Λ^(-1/2)·Uᵀ (plus the mean) from the
    distributed covariance — driver-side eigh on the d×d collect, the
    same bounded closure-scale step as covariance_spectrum. Returns
    (mu: ndarray d, w: ndarray d×d). eps floors near-zero eigenvalues
    so collapsed directions don't explode."""
    import numpy as np

    mu = np.asarray(dimension_means(df, vec_col), dtype=np.float64)
    c = _cov_matrix(df, vec_col, means=list(mu))
    lam, u = np.linalg.eigh(c)
    w = (u / np.sqrt(np.maximum(lam, eps))) @ u.T  # ZCA form: symmetric
    return mu, w


def whiten(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 1e-6,
    out_col: str = "whitened",
) -> DataFrame:
    """Apply ZCA whitening to the embedding column: out = W·(x − μ),
    giving a corpus whose covariance is (numerically) the identity —
    the standard preprocessing before cosine ANN when the raw space is
    anisotropic. The (μ, W) fit is closure data (O(d²)); the apply is
    one zero-shuffle Arrow pass with a single GEMM per batch."""
    import numpy as np
    import pandas as pd

    mu, w = whitening_matrix(df, vec_col, eps)
    wt = w.T.copy()

    def apply(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(pdf["_v"].tolist(), dtype=np.float64) - mu
            y = x @ wt
            yield pd.DataFrame(
                {"_id": pdf["_id"].to_numpy(), "_w": list(y)}
            )

    out = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).mapInPandas(apply, "_id bigint, _w array<double>")
    return out.select(
        F.col("_id").alias(id_col), F.col("_w").alias(out_col)
    )
