"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline. The query side is broadcast
  (queries ≪ corpus), the corpus side streams — one pass, no shuffle of
  the big side, ranking via per-query window.
- LSH (sign-random-projection) top-k: the scale path. Deterministic
  hyperplanes bucket vectors; only same-bucket (or neighboring-probe)
  pairs are scored. Recall is tested against the brute-force baseline.
- cosine threshold self-join for embedding near-dup detection.

Vector math is either JVM-side (zip_with/aggregate folds, see
functions/vectors.py) or Arrow-vectorized with identical numerics
(elementwise float64 multiply + np.add.accumulate = the same
single-rounded left-to-right fold) — reproducible bit-for-bit by any
engine that folds sequentially, which the DuckDB oracles rely on.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from cqdg_etl_spark.functions.vectors import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, cos).

    Ties broken by neighbor id — fully deterministic output.

    Degenerate-vector contract (shared with the GEMM twin,
    operators/gemm.py): a zero-norm vector scores cos 0.0 against
    everything. Unguarded, IEEE 0/0 = NaN and Spark orders NaN as the
    LARGEST double — a degenerate corpus row would silently rank
    first here while the numpy path dropped it last. The SQL oracles
    omit the guard: the embeddings tables carry unit-norm vectors
    (min norm asserted ≈1 across SFs), so the guard branch is
    value-invisible on oracle-checked data.
    """
    from cqdg_etl_spark.functions.vectors import dot, l2_norm

    # Norms are per-VECTOR quantities: compute them in each side's
    # projection (once per vector), not inside the pair expression —
    # inline cosine re-folds the corpus norm once per QUERY (|Q|×
    # wasted work at scale). Same IEEE values, same oracle.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
    ).select("query_id", "q_vec", l2_norm(F.col("q_vec")).alias("q_norm"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
    ).select("neighbor_id", "c_vec", l2_norm(F.col("c_vec")).alias("c_norm"))
    prod = F.col("q_norm") * F.col("c_norm")
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "neighbor_id",
        F.when(prod == 0, F.lit(0.0))
        .otherwise(dot(F.col("q_vec"), F.col("c_vec")) / prod)
        .alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k via sign-random-projection LSH.

    Bucket key = sign bits of <v, h_j> for deterministic gaussian
    hyperplanes h_j. Queries and corpus shuffle only on the bucket key;
    within-bucket scoring is exact cosine. Returns the same schema as
    brute_force_topk (rank within found candidates).

    ``multiprobe=True`` additionally probes every bucket at Hamming
    distance 1 from the query's bucket (classic multi-probe LSH): the
    QUERY side explodes ×(n_planes+1) — the corpus side, which is the
    big side at 100 TB, still shuffles exactly once on its single
    bucket key. Recall vs the exact baseline is asserted in tests.
    """
    planes = _hyperplanes(dim, n_planes, seed)

    def bucket(vec_col_name: str):
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col_name).cast("array<double>"),
                        F.array(*[F.lit(x) for x in plane]),
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                > 0,
                F.lit(1),
            ).otherwise(F.lit(0))
            for plane in planes
        ]
        expr = bits[0]
        for b in bits[1:]:
            expr = expr * 2 + b
        return expr

    from cqdg_etl_spark.functions.vectors import dot, l2_norm

    if multiprobe:
        # query bucket plus every 1-bit flip: bucket XOR 2^j
        probes = F.array_distinct(
            F.array(
                bucket(vec_col),
                *[
                    bucket(vec_col).bitwiseXOR(F.lit(1 << j))
                    for j in range(n_planes)
                ],
            )
        )
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode(probes).alias("bucket"),
        )
    else:
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            bucket(vec_col).alias("bucket"),
        )
    # per-vector norms computed in the projections, not per pair (the
    # corpus norm would otherwise re-fold once per matching query)
    q = q.select("*", l2_norm(F.col("q_vec")).alias("q_norm"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        bucket(vec_col).alias("bucket"),
    ).select("*", l2_norm(F.col("c_vec")).alias("c_norm"))
    scored = q.join(c, "bucket").select(
        "query_id",
        "neighbor_id",
        (
            dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_norm") * F.col("c_norm"))
        ).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )


def _srp_cell(vec_col_name: str, planes: list[list[int]]):
    """Seed-cell id: packed sign bits of <v, h_j> for Rademacher planes.
    Same fold/packing as lsh_bucket_topk's bucket() — JVM HOF, left-to-
    right, so DuckDB's list_sum reproduces the identical cell ids."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col_name).cast("array<double>"),
                    F.array(*[F.lit(float(x)) for x in plane]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for plane in planes
    ]
    expr = bits[0]
    for b in bits[1:]:
        expr = expr * 2 + b
    return expr


def ivf_fit_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 4,
    seed: int = 42,
    train_mod: int = 1,
) -> list[tuple[int, list[float]]]:
    """Train the IVF coarse quantizer: deterministic SRP seed cells →
    one Lloyd refinement (per-cell element-wise mean). Returns the
    sorted [(cell_id, centroid)] list — at most 2^n_bits entries.

    Engine-portable by construction (this is what upgraded ann_topk_ivf
    from the registry's last rows-only check to a full value-hash
    oracle): seed cells come from seeded ±1 Rademacher planes (compact
    literals both engines share), and the mean is computed as an EXACT
    decimal(38,12) sum divided in double — decimal addition is
    associative, so the centroid is bit-identical regardless of
    partitioning or engine, unlike a double sum whose value depends on
    accumulation order. MLlib KMeans (the previous trainer) was neither
    reproducible outside Spark nor cheap: implementation-defined init
    and convergence, and a full-corpus fit.

    ``train_mod`` is the seeded systematic sample for the fit: only
    rows with id % train_mod == 0 train the centroids (assignment still
    covers everything). At 100 TB you fit on a ~1e-3 sample
    (train_mod=1000); the default 1 trains on all rows at test scale.

    Scale shape: one pass over the (sampled) corpus — posexplode to
    (cell, dim, value) skinny rows, map-side partial decimal sums, one
    shuffle of #cells × #dims rows, and a ≤2^n_bits-row collect. That
    collect is the index-build action every IVF engine performs (FAISS
    trains the quantizer before indexing too); the centroids are tiny
    (cells × dims doubles) and travel to executors as task data, not as
    plan literals.
    """
    dim = len(corpus.select(vec_col).first()[0])
    planes = rademacher_planes(dim, n_bits, seed)
    seeded = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        _srp_cell(vec_col, planes).alias("cell"),
    )
    if train_mod > 1:
        seeded = seeded.filter(F.pmod(F.col("_id"), F.lit(train_mod)) == 0)
    per_dim = (
        seeded.select("cell", F.posexplode(F.col("_vec").cast("array<double>")).alias("d", "v"))
        .groupBy("cell", "d")
        .agg(
            (
                F.sum(F.col("v").cast("decimal(38,12)")).cast("double")
                / F.count("v")
            ).alias("m")
        )
    )
    rows = (
        per_dim.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("dm"))
        .collect()
    )
    return sorted(
        (int(r["cell"]), [float(s["m"]) for s in r["dm"]]) for r in rows
    )


def _nearest_cells_arrow(centers: list[tuple[int, list[float]]], nprobe: int):
    """Arrow-vectorized nearest-centroid assignment, bit-identical to
    the SQL oracle's left-to-right (a-b)^2 fold: elementwise float64
    subtract/multiply + np.add.accumulate, ties → lower cell id (stable
    argsort over ascending-sorted cells). Centroids ride in the UDF
    closure — O(1) plan size however many cells, vs the previous
    per-centroid literal expression array that grew the plan (and
    Catalyst time) linearly in n_cells."""
    import numpy as np
    import pandas as pd

    cells = np.asarray([c for c, _ in centers], dtype=np.int32)
    mat = np.asarray([v for _, v in centers], dtype=np.float64)

    @F.pandas_udf("array<int>")
    def nearest(v):
        if len(v) == 0:  # Arrow may hand over an empty batch
            return pd.Series([], dtype=object)
        M = np.stack(v.values).astype(np.float64)
        n = M.shape[0]
        dists = np.empty((n, len(cells)), dtype=np.float64)
        for j in range(len(cells)):
            diff = M - mat[j][None, :]  # single-rounded IEEE subtract
            dists[:, j] = np.add.accumulate(diff * diff, axis=1)[:, -1]
        order = np.argsort(dists, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([cells[row].tolist() for row in order])

    return nearest


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 4,
    nprobe: int = 6,
    seed: int = 42,
    train_mod: int = 1,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    Train: ivf_fit_centroids — deterministic SRP seed cells + one
    exact-decimal Lloyd step over a seeded systematic sample. Index:
    each corpus vector is assigned to its nearest centroid (Arrow UDF,
    centroids as closure data). Search: each query probes its ``nprobe``
    closest cells and scores only those cells' vectors with exact
    cosine.

    At 100 TB: n_bits scales with corpus size (2^n_bits ≈ √n is the
    classic cell count) with NO plan growth — assignment cost is one
    vectorized numpy pass per batch and the plan carries zero centroid
    literals; the corpus shuffles once on cell id, the query explode
    multiplies only the small side. Raising nprobe trades latency for
    recall — measured against brute force in tests/test_datapipe.py.
    """
    from cqdg_etl_spark.functions.vectors import dot, l2_norm

    centers = ivf_fit_centroids(
        corpus, id_col, vec_col, n_bits=n_bits, seed=seed, train_mod=train_mod
    )
    assign1 = _nearest_cells_arrow(centers, 1)
    assignp = _nearest_cells_arrow(centers, nprobe)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        assign1(F.col(vec_col))[0].alias("cell"),
    ).select("*", l2_norm(F.col("c_vec")).alias("c_norm"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(assignp(F.col(vec_col))).alias("cell"),
    ).select("*", l2_norm(F.col("q_vec")).alias("q_norm"))
    scored = q.join(c, "cell").select(
        "query_id",
        "neighbor_id",
        (
            dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_norm") * F.col("c_norm"))
        ).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )


def rademacher_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[int]]:
    """Deterministic ±1 (Rademacher) projection vectors.

    Sign-random-projection LSH needs only the SIGN of <v, h>; Rademacher
    entries give the same locality-sensitive family as gaussian ones
    (collision prob 1 - θ/π) while being embeddable as compact literals
    in an engine-portable SQL oracle.
    """
    rng = random.Random(seed)
    return [[rng.choice((-1, 1)) for _ in range(dim)] for _ in range(n_planes)]


def derive_banding(
    n: int,
    threshold: float = 0.4,
    base_rows: int = 4,
    base_bands: int = 8,
    n0: int = 2000,
) -> tuple[int, int]:
    """Scale-derived ``(bands, rows_per_band)`` for
    ``banded_cosine_dup_pairs`` at corpus size ``n``.

    Why this exists (SCALE_PROBE_r05.md finding #1): a FIXED banding is
    a constant-divisor quadratic — a random pair collides in one r-bit
    band w.p. 2^-r, so junk candidates are B·n²/2^(r+1); the fixed
    (8, 4) config measured exponent ~3 over x1→x10 (2.45 s → 507.8 s).
    This prescription grows r with log2(n) and re-solves B from the
    OR-amplified recall bound 1-(1-p1^r)^B = R — where
    p1 = 1 - acos(threshold)/π and R is the BASE config's own per-pair
    recall — so per-pair recall is held constant while candidate volume
    drops to the LSH-theoretic n^(1+ρ), ρ = ln(1/p1)/ln 2. Measured:
    exponent 1.42 at 4.2× less x10 wall time, against the
    Indyk–Motwani floor n^1.66 at cos 0.4 (Indyk & Motwani, STOC'98).

    For n ≤ n0 the result is EXACTLY ``(base_bands, base_rows)`` — the
    bit-unrolled engine-portable oracle of the registered query stays
    exact at every harness SF (≤ 2000 vectors) while fleet-scale
    corpora get the recall-held rescale. The 1e-9 slack absorbs the
    float epsilon when the bound solves to an exact integer (at n = n0
    the raw solution is 8.000…).

    Deeper point (probe finding #1): pair ENUMERATION at cos 0.4 is
    similarity SEARCH mis-posed as dedup — at this threshold even the
    theoretic floor is ~n^1.66. Real near-dup thresholds (0.85+,
    ρ = 0.28) scale as n^1.28 under the same prescription; for
    bounded-output top-k similarity the scale path is the ANN family
    (``operators/gemm.py::ann_topk_gemm`` measured FLAT 0.33→0.44 s
    over the same decade, output O(|Q|·k)).
    """
    p1 = 1.0 - math.acos(threshold) / math.pi
    recall = 1.0 - (1.0 - p1 ** base_rows) ** base_bands
    r = base_rows + max(0, math.ceil(math.log2(max(n, 1) / n0)))
    raw = math.log(1.0 - recall) / math.log(1.0 - p1 ** r)
    return max(1, math.ceil(raw - 1e-9)), r


def derive_cell_bits(n: int, base_bits: int = 4, n0: int = 2000) -> int:
    """Scale-derived IVF cell bits for ``semantic_dedup`` /
    ``ivf_fit_centroids`` at corpus size ``n``: 2^n_bits ∝ n keeps the
    CELL SIZE constant, so within-cell quadratic compare stays a
    constant per-cell cost and total work is ~linear.

    Measured (SCALE_PROBE_r05.md finding #2): fixed n_bits=4 is a
    constant-divisor quadratic (1.18 s → 56.43 s x1→x10, exponent
    2.24); this prescription measures exponent 0.61 at IDENTICAL
    output — the knob divides work without a recall trade, so scaling
    it is pure win. For n ≤ n0 the result is exactly ``base_bits``,
    keeping the registered query's SQL oracle (which re-derives the
    quantizer at 2^base_bits cells) bit-exact at every harness SF.
    """
    return base_bits + max(0, math.ceil(math.log2(max(n, 1) / n0)))


def _band_keys_arrow(
    planes: list[list[int]], bands: int, rows_per_band: int
):
    """Arrow-vectorized SRP band keys, BIT-IDENTICAL to the declarative
    zip_with/aggregate fold (and therefore to the SQL oracle):

    - elementwise float64 multiply = the same single-rounded IEEE op the
      JVM performs (no FMA, unlike a BLAS matmul);
    - ``np.add.accumulate`` along the dim axis = guaranteed left-to-right
      summation, matching the 0.0-seeded fold exactly.

    Why Python here: 32 hyperplane projections per vector through
    interpreted HOF lambdas dominated the operator runtime (the banding
    runs per VECTOR but the lambda dispatch costs ~100 ns/element); the
    Arrow path cut candidate generation ~10×. Equivalence is asserted in
    tests against the expression form (kept in git history) via the
    unchanged oracle.
    """
    import numpy as np
    import pandas as pd

    P = np.asarray(planes, dtype=np.float64)  # (n_planes, dim)

    @F.pandas_udf("array<bigint>")
    def band_keys(v):
        if len(v) == 0:  # Arrow may hand over an empty batch
            return pd.Series([], dtype=object)
        M = np.stack(v.values).astype(np.float64)  # (n, dim) exact widen
        n = M.shape[0]
        bits = np.empty((n, len(P)), dtype=np.int64)
        for j, p in enumerate(P):
            prods = M * p[None, :]  # single-rounded, same as JVM a*b
            dots = np.add.accumulate(prods, axis=1)[:, -1]  # l-to-r fold
            bits[:, j] = dots > 0
        keys = np.empty((n, bands), dtype=np.int64)
        for l in range(bands):
            k = np.zeros(n, dtype=np.int64)
            for j in range(rows_per_band):
                k = k * 2 + bits[:, l * rows_per_band + j]
            keys[:, l] = k
        return pd.Series(list(keys))

    return band_keys


def _dot_arrow():
    """Arrow-vectorized dot product over two array columns, bit-identical
    to functions/vectors.dot (elementwise float64 multiply + guaranteed
    left-to-right np.add.accumulate). The verify side of banded near-dup
    evaluates one dot per CANDIDATE PAIR — the interpreted HOF fold was
    the second-largest cost after banding."""
    import numpy as np
    import pandas as pd

    @F.pandas_udf("double")
    def dot_udf(a, b):
        if len(a) == 0:  # Arrow may hand over an empty batch
            return pd.Series([], dtype=np.float64)
        A = np.stack(a.values).astype(np.float64)
        B = np.stack(b.values).astype(np.float64)
        return pd.Series(np.add.accumulate(A * B, axis=1)[:, -1])

    return dot_udf


def banded_cosine_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bands: int = 8,
    rows_per_band: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs at scale: banded sign-random-projection
    candidate generation + exact cosine verify. Returns (doc_a < doc_b,
    cos ≥ threshold) for pairs sharing at least one band key.

    The banding IS part of the operator's semantics (deterministic ±1
    hyperplanes, so any engine reproduces the identical candidate set);
    recall vs the exact all-pairs baseline is the usual OR-amplified LSH
    bound 1 - (1 - (1-θ/π)^r)^L and is measured against
    ``cosine_dup_pairs`` in tests.

    Fixed ``(bands, rows_per_band)`` is a constant-divisor QUADRATIC in
    n (measured exponent ~3 at x10, SCALE_PROBE_r05.md #1) — at fleet
    scale pass ``derive_banding(n, threshold)``, which holds per-pair
    recall while bending the curve to the measured n^1.42 (the
    Indyk–Motwani floor at cos 0.4 is n^1.66).

    Scale shape: the skinny (doc, band_idx, band_key) index self-joins on
    an equi-key (shuffle hash join — never a cartesian/BNLJ); candidate
    ids are distinct-ed BEFORE the vectors are fetched, so the wide
    embedding arrays shuffle once per side by id, not ×bands through the
    band explode. The VERIFY path computes per-vector L2 norms ONCE on
    the fetch side, so each candidate pair evaluates a single dot fold
    instead of a full 3-fold cosine (measured: norms are 2/3 of the
    per-pair work). All folds stay in zip_with/aggregate HOF form —
    both unrolling experiments lost: 32×64 unrolled banding terms blew
    Catalyst planning past minutes, and a 64-term unrolled verify hit
    codegen fallback on the deep Add chain and ran 4× slower than HOF.
    """
    from cqdg_etl_spark.functions.vectors import l2_norm

    from pyspark import StorageLevel

    planes = rademacher_planes(dim, bands * rows_per_band, seed)
    # Persist the skinny band index: its two self-join sides would each
    # re-run the Arrow banding pass over the full corpus otherwise (the
    # differing pushed filters per side make the subtrees non-canonical,
    # so exchange reuse never fires — same finding as
    # dedup.minhash_verified_pairs). Measured 1.8 s → 1.3 s at sf0.1;
    # the index is 3 bigints × bands per vector, far smaller than the
    # embeddings themselves, and spills to disk at scale.
    skinny = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            _band_keys_arrow(planes, bands, rows_per_band)(F.col(vec_col))
        ).alias("band_idx", "band_key"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a, b = skinny.alias("a"), skinny.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    # Two-step select: the norm is an expensive fold referenced per
    # pair downstream — keep it a plain attribute of the fetch frame.
    vd = F.col(vec_col).cast("array<double>")
    ea = df.select(F.col(id_col).alias("doc_a"), vd.alias("va")).select(
        "doc_a", "va", l2_norm(F.col("va")).alias("na")
    )
    eb = df.select(F.col(id_col).alias("doc_b"), vd.alias("vb")).select(
        "doc_b", "vb", l2_norm(F.col("vb")).alias("nb")
    )
    dot_udf = _dot_arrow()
    return (
        cand.join(ea, "doc_a")
        .join(eb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                dot_udf(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("doc_a", "doc_b", F.round("cos", 6).alias("cos"))
    )


def cosine_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: (a < b, cos ≥ threshold).

    Brute-force O(n²) pair enumeration — the exact TEST BASELINE for
    ``banded_cosine_dup_pairs`` (which is what the registry serves);
    not registered itself because the plan is a cartesian.
    """
    a = df.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            cosine_similarity(F.col("va"), F.col("vb")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("doc_a", "doc_b", F.round("cos", 6).alias("cos"))
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 6,
) -> DataFrame:
    """Element-wise mean vector per label → (label, centroid_str).

    The centroid is serialized as comma-joined fixed-6dp decimals in
    dimension order (engine-portable comparison form). Scale shape:
    posexplode → per-(label, dim) avg (one shuffle, map-side partial
    over dim× replicated rows) → per-label re-assembly via sorted
    collect_list (second shuffle, #labels × dim rows only). The
    replication factor is the embedding dim — the same cost any
    engine pays to touch every component; no row ever carries more
    than (label, dim_index, double).
    """
    pos = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "v"),
    )
    per_dim = pos.groupBy("label", "pos").agg(
        F.avg(F.col("v").cast("double")).alias("m")
    )
    assembled = per_dim.groupBy("label").agg(
        F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("dims")
    )
    return assembled.select(
        "label",
        F.concat_ws(
            ",",
            F.transform(
                "dims",
                lambda s: F.round(s["m"], scale)
                .cast(f"decimal(18,{scale})")
                .cast("string"),
            ),
        ).alias("centroid_str"),
    )


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar int8 quantization of an embedding column → (id, codes).

    Per-dimension global [min, max] is learned from the data, then each
    component maps to ``floor((v - min) / (max - min) * 256) - 128``
    (clamped to 127, constant dims → 0) — the standard symmetric-range
    scalar quantizer that shrinks float32 vectors 4× for ANN serving.

    Scale shape: ONE aggregation pass (posexplode → per-dim min/max,
    partial-aggregated map-side so the shuffle moves #dims rows per
    partition), then the #dims×2 bounds collapse to a single row that
    is broadcast back; quantization itself is a map-side array
    ``transform`` — no second shuffle, no UDF, whole-stage codegen.
    The codes column serializes as comma-joined ints in dimension order
    (engine-portable comparison form; a production sink would emit
    ``array<tinyint>`` / binary).

    All arithmetic is IEEE double on both engines (float inputs widen
    exactly), min/max are selections not sums, so results are
    bit-reproducible regardless of partitioning.
    """
    bounds = (
        df.select(F.posexplode(F.col(vec_col)).alias("d", "v"))
        .groupBy("d")
        .agg(
            F.min(F.col("v").cast("double")).alias("mn"),
            F.max(F.col("v").cast("double")).alias("mx"),
        )
        .agg(F.array_sort(F.collect_list(F.struct("d", "mn", "mx"))).alias("b"))
        .select(
            F.expr("transform(b, x -> x.mn)").alias("mns"),
            F.expr("transform(b, x -> x.mx)").alias("mxs"),
        )
    )
    return df.crossJoin(F.broadcast(bounds)).select(
        id_col,
        F.expr(
            f"""concat_ws(',', transform({vec_col}, (v, i) ->
                CASE WHEN element_at(mxs, i + 1) = element_at(mns, i + 1) THEN 0
                     ELSE CAST(least(255.0,
                            floor((CAST(v AS DOUBLE) - element_at(mns, i + 1))
                                  / (element_at(mxs, i + 1) - element_at(mns, i + 1))
                                  * 256.0)) AS INT) - 128
                END))"""
        ).alias("codes"),
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 4,
    seed: int = 42,
    train_mod: int = 1,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with the deterministic IVF
    coarse quantizer, then compare pairs ONLY within a cluster and
    prune every vector that has a lower-id cluster-mate with cosine
    ≥ ``threshold``. Returns one row per input vector:
    ``(id, cell, dup_of)`` where ``dup_of`` is the smallest surviving
    duplicate-of id, or -1 for kept representatives.

    Keep-lowest-id is the deterministic representative rule (the paper
    keeps low-centroid-similarity examples; any fixed rule gives the
    same dedup RATE, and lowest-id is reproducible on any engine with
    no extra pass).

    Scale shape — the whole point of SemDeDup: the quadratic compare is
    confined to cells of ~n/2^n_bits vectors. Fix n_bits and that is
    still a constant-divisor quadratic (measured exponent 2.24,
    SCALE_PROBE_r05.md #2); pass ``derive_cell_bits(n)`` so 2^n_bits ∝ n
    keeps cell size constant — measured exponent 0.61 at identical
    output, no recall trade. The cell assignment
    frame is persisted and self-joined on the cell equi-key (shuffle
    hash join, never cartesian); per-vector L2 norms are computed once
    on the persisted frame; the per-pair dot is Arrow-vectorized
    (bit-identical to the oracle's left-to-right fold). The final
    left join back to the assignment frame reuses the same persisted
    subtree. Quantizer training samples via ``train_mod`` exactly as
    ``ivf_fit_centroids`` documents.
    """
    from pyspark import StorageLevel

    from cqdg_etl_spark.functions.vectors import l2_norm

    centers = ivf_fit_centroids(
        corpus, id_col, vec_col, n_bits=n_bits, seed=seed, train_mod=train_mod
    )
    assign1 = _nearest_cells_arrow(centers, 1)
    base = (
        corpus.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).cast("array<double>").alias("v"),
            assign1(F.col(vec_col))[0].alias("cell"),
        )
        .select("vid", "v", "cell", l2_norm(F.col("v")).alias("nrm"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = base.select(
        F.col("cell"),
        F.col("vid").alias("dup_of"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = base.select(
        F.col("cell"),
        F.col("vid").alias("vid"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    dot_udf = _dot_arrow()
    pruned = (
        a.join(b, ["cell"])
        .filter(F.col("dup_of") < F.col("vid"))
        .select(
            "vid",
            "dup_of",
            (
                dot_udf(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .groupBy("vid")
        .agg(F.min("dup_of").alias("dup_of"))
    )
    return (
        base.select("vid", "cell")
        .join(pruned, "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            "cell",
            F.coalesce(F.col("dup_of"), F.lit(-1).cast("long")).alias("dup_of"),
        )
    )


def pq_codes(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    n_bits: int = 4,
    seed: int = 42,
    train_mod: int = 1,
) -> DataFrame:
    """Product-quantization codes (Jégou et al. 2011, TPAMI): split the
    vector into ``m`` contiguous sub-vectors and quantize each subspace
    independently with the deterministic coarse quantizer
    (``ivf_fit_centroids`` — SRP seed cells + one exact-decimal Lloyd
    step, seeded ``seed + s`` per subspace so subspace codebooks are
    independent draws). A 64-dim float32 vector (256 bytes) compresses
    to ``m`` sub-codes (m bytes at 8 bits) — the memory step that makes
    billion-vector ANN feasible; at search time asymmetric distances
    are computed from per-subspace lookup tables.

    Returns (id, code_0..code_{m-1}, code) where ``code`` is the
    pipe-joined string form (hash-friendly).

    Scale shape: ``m`` independent fits, each one pass over a SLICED
    projection of the (sampled) corpus — the slice happens in the scan
    projection, so each fit reads only dim/m of the vector bytes.
    Assignment is one Arrow-vectorized pass per subspace over the full
    corpus with codebooks as closure data (no plan literals); no
    shuffles at all in the assignment (the fits shuffle cells×dims
    skinny rows as documented in ivf_fit_centroids).
    """
    sub, books = pq_fit_codebooks(
        corpus, id_col, vec_col, m=m, n_bits=n_bits, seed=seed,
        train_mod=train_mod,
    )
    out = _pq_assign(corpus, books, sub, id_col, vec_col)
    code_cols = [f"code_{s}" for s in range(m)]
    return out.select(
        id_col,
        *code_cols,
        F.concat_ws("|", *[F.col(c).cast("string") for c in code_cols]).alias(
            "code"
        ),
    )


def pq_fit_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    n_bits: int = 4,
    seed: int = 42,
    train_mod: int = 1,
) -> tuple[int, list[list[tuple[int, list[float]]]]]:
    """Train the ``m`` per-subspace PQ codebooks (shared by
    ``pq_codes`` and ``pq_adc_topk``): each is one
    ``ivf_fit_centroids`` fit over a SLICED projection with seed
    ``seed + s`` — independent subspace draws, slice pruned in the
    scan. Returns (sub_dim, codebooks)."""
    dim = len(corpus.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = []
    for s in range(m):
        lo = s * sub  # 0-based; F.slice is 1-based
        sliced = corpus.select(
            F.col(id_col),
            F.slice(F.col(vec_col), lo + 1, sub).alias("_sub"),
        )
        books.append(
            ivf_fit_centroids(
                sliced,
                id_col,
                "_sub",
                n_bits=n_bits,
                seed=seed + s,
                train_mod=train_mod,
            )
        )
    return sub, books


def _pq_assign(
    corpus: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    sub: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, vec, code_0..code_{m-1}) — per-subspace nearest-centroid
    codes, Arrow-vectorized with codebooks as closure data."""
    out = corpus.select(F.col(id_col), F.col(vec_col))
    for s, centers in enumerate(books):
        assign = _nearest_cells_arrow(centers, 1)
        out = out.withColumn(
            f"code_{s}", assign(F.slice(F.col(vec_col), s * sub + 1, sub))[0]
        )
    return out


def _adc_distance_arrow(books: list[list[tuple[int, list[float]]]], sub: int):
    """Arrow-vectorized asymmetric PQ distance: query keeps its full
    float vector, the corpus row is represented ONLY by its m codes —
    distance = Σ_s ||q_s − codebook_s[code_s]||². Per subspace the
    squared-diff fold is left-to-right (np.add.accumulate — the
    package's oracle-matched fold); subspace partials then add in
    subspace order, so DuckDB's ((d0+d1)+d2)+d3 reproduces the exact
    IEEE double. Codebooks ride in the closure — O(1) plan size."""
    import numpy as np
    import pandas as pd

    m = len(books)
    # cell ids are sparse in [0, 2^n_bits); index a dense table by id
    tabs = []
    for centers in books:
        size = max(c for c, _ in centers) + 1
        t = np.zeros((size, sub), dtype=np.float64)
        for c, v in centers:
            t[c] = v
        tabs.append(t)

    @F.pandas_udf("double")
    def adc(qv, codes):
        if len(qv) == 0:
            return pd.Series([], dtype=np.float64)
        Q = np.stack(qv.values).astype(np.float64)
        C = np.stack(codes.values)
        total = np.zeros(len(Q), dtype=np.float64)
        for s in range(m):
            diff = Q[:, s * sub : (s + 1) * sub] - tabs[s][C[:, s]]
            total = total + np.add.accumulate(diff * diff, axis=1)[:, -1]
        return pd.Series(total)

    return adc


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    n_bits: int = 4,
    seed: int = 42,
    train_mod: int = 1,
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance computation (ADC —
    Jégou et al. 2011): corpus vectors are replaced by their ``m``
    sub-codes, queries stay full-precision, and candidate distance is
    the sum of per-subspace query-to-assigned-centroid distances.
    Returns (query_id, neighbor_id, rank, adc_dist) — rank ascending
    by distance, ties → lower neighbor id.

    Why this is the 100-TB serving shape: after the (tiny) codebook
    fit, the corpus is represented by m small ints per vector — a
    256-byte float32 row becomes m bytes — so the scan that scoring
    streams over is ~64× smaller than the raw embedding column, and
    per-candidate work is m table lookups + m·sub subtractions instead
    of a dim-length dot product. The query side is broadcast
    (queries ≪ corpus, same contract as brute_force_topk); the corpus
    codes stream map-side with NO shuffle until the per-query top-k.
    Recall vs the exact baseline is a codebook-resolution knob
    (n_bits, m), asserted in tests.
    """
    sub, books = pq_fit_codebooks(
        corpus, id_col, vec_col, m=m, n_bits=n_bits, seed=seed,
        train_mod=train_mod,
    )
    coded = _pq_assign(corpus, books, sub, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.array(*[F.col(f"code_{s}") for s in range(m)]).alias("codes"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    dist = _adc_distance_arrow(books, sub)
    scored = F.broadcast(q).crossJoin(coded).select(
        "query_id",
        "neighbor_id",
        dist(F.col("q_vec"), F.col("codes")).alias("adc_dist"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("adc_dist", 6).alias("adc_dist"),
        )
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive hard-negative mining: for each query vector, the
    top-k most-similar corpus vectors with a DIFFERENT label —
    (query_id, query_label, neighbor_id, neighbor_label, rank, cos).

    The staple of embedding-model training-data curation (dense
    retrievers / contrastive fine-tuning mine their negatives exactly
    this way). Same scale shape as ``brute_force_topk``: the query side
    is broadcast, norms are per-vector projections computed once per
    side (never inside the pair expression), and the label-mismatch
    filter runs BEFORE the rank window so positives never occupy
    ranks. Ties broken by neighbor id — fully deterministic. For
    corpus-×-corpus mining at 100 TB swap the broadcast cross join for
    the banded-SRP candidate generator (``banded_cosine_dup_pairs``)
    and keep this label filter + window unchanged.
    """
    from cqdg_etl_spark.functions.vectors import dot, l2_norm

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        F.col(vec_col).alias("q_vec"),
    ).select(
        "query_id", "query_label", "q_vec",
        l2_norm(F.col("q_vec")).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col(vec_col).alias("c_vec"),
    ).select(
        "neighbor_id", "neighbor_label", "c_vec",
        l2_norm(F.col("c_vec")).alias("c_norm"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_label") != F.col("neighbor_label"))
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            (
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            F.col("rank").cast("long").alias("rank"),
            F.round("cos", 6).alias("cos"),
        )
    )


def hard_negatives_banded(
    emb: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = 64,
    bands: int = 8,
    rows_per_band: int = 4,
    seed: int = 42,
    min_cos: float = 0.0,
) -> DataFrame:
    """Corpus×corpus hard-negative mining — the 100-TB path the
    ``hard_negatives`` docstring prescribes: candidate pairs come from
    the banded-SRP generator (``banded_cosine_dup_pairs``) instead of a
    broadcast cross join, then the label-mismatch filter + per-query
    rank window run over candidates only. Returns (query_id,
    query_label, neighbor_id, neighbor_label, rank ≤ k, cos) with every
    corpus vector acting as a query.

    ``min_cos`` floors the candidate cosine (a pair below it is not a
    "hard" negative by definition); like the banding itself it is part
    of the declared semantics, so any engine reproduces the identical
    mined set. Scale shape: the band self-join is an equi-key shuffle
    hash join, candidate pairs are symmetrized (each undirected pair
    serves both endpoints as queries), labels join in as skinny
    (id, label) projections, and the rank window partitions by
    query_id over candidate rows only — bounded by the band collision
    count, never |corpus|² and never a single task.
    """
    pairs = banded_cosine_dup_pairs(
        emb,
        threshold=min_cos,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        bands=bands,
        rows_per_band=rows_per_band,
        seed=seed,
    )
    # Labels attach and the mismatch filter runs on the UNDIRECTED
    # pair frame, BEFORE symmetrization (r11): the filter is symmetric
    # and labels are per-id, so join-then-explode ≡ explode-then-join
    # — but the joins and the filter process half the rows, and the
    # symmetrize is ONE explode instead of a two-branch union that
    # re-evaluated the banded candidate+verify subtree per branch.
    lab_a = emb.select(
        F.col(id_col).alias("doc_a"), F.col(label_col).alias("label_a")
    )
    lab_b = emb.select(
        F.col(id_col).alias("doc_b"), F.col(label_col).alias("label_b")
    )
    enriched = (
        pairs.join(lab_a, "doc_a")
        .join(lab_b, "doc_b")
        .filter(F.col("label_a") != F.col("label_b"))
    )
    scored = enriched.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("query_id"),
                    F.col("label_a").alias("query_label"),
                    F.col("doc_b").alias("neighbor_id"),
                    F.col("label_b").alias("neighbor_label"),
                    F.col("cos"),
                ),
                F.struct(
                    F.col("doc_b").alias("query_id"),
                    F.col("label_b").alias("query_label"),
                    F.col("doc_a").alias("neighbor_id"),
                    F.col("label_a").alias("neighbor_label"),
                    F.col("cos"),
                ),
            )
        ).alias("e")
    ).select(
        "e.query_id", "e.query_label", "e.neighbor_id",
        "e.neighbor_label", "e.cos",
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            F.col("rank").cast("long").alias("rank"),
            "cos",
        )
    )


# Driver-collect ceiling for the label-noise query block: 32M float64
# elements ≈ 256 MB — the upper end of the broadcast class (guide §3.1;
# the same class the IVF centroid collects document). Above this the
# exact-kernel design is wrong, not just slow: use the banded-SRP
# candidate path instead.
_LNS_MAX_QUERY_ELEMS = 32 * (1 << 20)


def label_noise_scores(
    emb: DataFrame,
    k: int = 5,
    query_filter=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """kNN label-consistency scoring (the confident-learning screen for
    mislabeled examples): for each scored vector, the fraction of its
    up-to-k nearest neighbors (cosine, self excluded) whose label
    DISAGREES — (vec_id, label, n_diff, noise_score). The denominator
    is the ACTUAL neighbor count (min(k, |corpus| - 1)), so a 3-vector
    corpus with every neighbor disagreeing scores 1.0, not k-deflated.
    A score near 1 flags a likely label error; rank by it to build a
    re-annotation queue.

    Determinism: neighbors are ranked under the total order
    (cos desc, neighbor_id), so the k-set — and therefore the
    disagreement count — is engine-exact even with tied cosines.

    Execution (r11): the old form evaluated the interpreted zip_with/
    aggregate dot fold once per (query, corpus) PAIR — |Q|·|C| HOF
    folds (6.4 s at sf0.1). Now a mapInPandas kernel (the
    ``brute_force_topk_gemm`` local-top-k shape) ships each corpus
    vector across the Arrow boundary ONCE, computes all dots with
    d-major vectorized accumulation in the EXACT zero-seeded
    left-to-right IEEE order of functions/vectors.dot (one
    single-rounded elementwise add per dimension — bit-identical cos,
    so the pinned oracle and the tie behaviour are unchanged), and
    emits k candidates per (partition, query) — a lossless superset
    of the global top-k under the same total order. Labels then join
    onto the ≤ |Q|·k survivors instead of the full pair stream. The
    query block is size-GUARDED (r12): building this DataFrame runs a
    Spark count job on the scored side and raises if |Q|·dim exceeds
    ``_LNS_MAX_QUERY_ELEMS`` (the broadcast class the kernel assumes —
    the previous form broadcast the same side implicitly), then the
    collected block ships to executors via a TorrentBroadcast (once
    per executor) instead of riding the task closure (once per task).
    At corpus scale — a scored side past the guard — swap the exact
    pair generator for the banded-SRP candidates and keep the
    disagreement aggregate unchanged.

    Zero-norm vectors (r12, ADVICE r11): their cosines are 0/0 = NaN;
    Spark's window ranks NaN FIRST under ``desc`` while NumPy's argsort
    ranks NaN last, so the kernel masks NaN → +inf before candidate
    selection — the candidate SET and the tie order (all-equal → id
    asc) then match the Spark/oracle NaN-greatest semantics exactly.
    ``cos`` is a ranking intermediate only (never in the output), so
    the mask cannot change declared results.
    """
    import numpy as np
    import pandas as pd

    scored_side = emb if query_filter is None else emb.filter(query_filter)
    sized = scored_side.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.size(F.col(vec_col))).alias("dim"),
    ).collect()[0]
    if (sized["n"] or 0) * (sized["dim"] or 0) > _LNS_MAX_QUERY_ELEMS:
        raise ValueError(
            f"label_noise_scores: scored side has {sized['n']} vectors × "
            f"dim {sized['dim']} = {sized['n'] * sized['dim']} elements, "
            f"over the driver-collect ceiling {_LNS_MAX_QUERY_ELEMS}; "
            "narrow query_filter or use the banded-SRP candidate path"
        )
    q_rows = scored_side.select(
        F.col(id_col), F.col(vec_col).cast("array<double>")
    ).collect()
    nq = len(q_rows)
    q_ids = np.asarray([r[0] for r in q_rows])
    if nq:
        q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
        # exact zero-seeded left-to-right fold of x*x, then sqrt —
        # the l2_norm op sequence
        q_norm = np.sqrt(np.add.accumulate(q_mat * q_mat, axis=1)[:, -1])
    else:
        q_mat = np.zeros((0, 0), dtype=np.float64)
        q_norm = np.zeros(0, dtype=np.float64)
    # one copy per executor, not one per task closure (guide §4.5)
    bc = emb.sparkSession.sparkContext.broadcast((q_ids, q_mat, q_norm))
    id_type = emb.schema[id_col].dataType.simpleString()

    def local_topk(batches):
        l_ids, l_mat, l_norm = bc.value
        l_nq = len(l_ids)
        run_ids = [[] for _ in range(l_nq)]
        run_cos = [[] for _ in range(l_nq)]
        for pdf in batches:
            if pdf.empty or not l_nq:
                continue
            b_ids = pdf["_id"].to_numpy()
            c_mat = np.array(pdf["_v"].tolist(), dtype=np.float64)
            c_norm = np.sqrt(
                np.add.accumulate(c_mat * c_mat, axis=1)[:, -1]
            )
            # chunk so the |chunk|×|Q| score matrix stays ~32 MB
            step = max(1, (1 << 22) // l_nq)
            for s0 in range(0, len(b_ids), step):
                cc = c_mat[s0 : s0 + step]
                ii = b_ids[s0 : s0 + step]
                nn = c_norm[s0 : s0 + step]
                # d-major accumulation == per-pair left-to-right fold:
                # acc_0 = p_0 (0.0 + p_0 is exact), acc_d = acc + p_d,
                # each a single-rounded elementwise double op.
                acc = cc[:, [0]] * l_mat[:, 0][None, :]
                for dd in range(1, cc.shape[1]):
                    acc = acc + cc[:, [dd]] * l_mat[:, dd][None, :]
                cos = acc / (nn[:, None] * l_norm[None, :])
                # zero-norm cosines are 0/0 = NaN; Spark ranks NaN
                # FIRST under desc, argsort ranks it last — mask to
                # +inf so the candidate set matches NaN-greatest
                # semantics (cos never reaches the output)
                nan_mask = np.isnan(cos)
                if nan_mask.any():
                    cos[nan_mask] = np.inf
                # self-pairs ranked out, never emitted
                self_mask = ii[:, None] == l_ids[None, :]
                if self_mask.any():
                    cos[self_mask] = -np.inf
                kk = min(k, cc.shape[0])
                # rows pre-sorted by id asc (parquet order is id-
                # sorted is NOT assumed): stable argsort of -cos keeps
                # id-ascending order among exact ties, matching
                # (cos desc, neighbor_id asc)
                id_order = np.argsort(ii, kind="stable")
                cos = cos[id_order]
                ii = ii[id_order]
                sel = np.argsort(-cos, axis=0, kind="stable")[:kk, :]
                for j in range(l_nq):
                    cj = cos[sel[:, j], j]
                    keep = cj > -np.inf
                    run_ids[j].append(ii[sel[:, j]][keep])
                    run_cos[j].append(cj[keep])
        out_i, out_n, out_c = [], [], []
        for j in range(l_nq):
            if not run_ids[j]:
                continue
            mi = np.concatenate(run_ids[j])
            mc = np.concatenate(run_cos[j])
            best = np.lexsort((mi, -mc))[:k]
            out_i.extend([l_ids[j]] * len(best))
            out_n.extend(mi[best])
            out_c.extend(mc[best])
        if out_i:
            yield pd.DataFrame(
                {"query_id": out_i, "neighbor_id": out_n, "cos": out_c}
            )

    # Spread the corpus side before the kernel: a single-row-group
    # parquet arrives as ONE scan partition, serializing the whole
    # |C|·|Q| score computation on one core (probe read 58.8 s at x10
    # unspread). Gated by the session spreadInputs knob — a cluster
    # whose scans are naturally parallel makes this a no-op. Safe:
    # the kernel is per-partition local-top-k; candidates are a
    # lossless superset under any partitioning and the global window
    # re-ranks them.
    from cqdg_etl_spark.operators.spread import spread_to_parallelism

    cand = spread_to_parallelism(
        emb.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
    ).mapInPandas(
        local_topk,
        f"query_id {id_type}, neighbor_id {id_type}, cos double",
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    q_labels = emb.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("label")
    )
    n_labels = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("n_label")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .join(q_labels, "query_id")
        .join(n_labels, "neighbor_id")
        .groupBy("query_id", "label")
        .agg(
            F.sum(
                F.when(F.col("n_label") != F.col("label"), 1).otherwise(0)
            ).cast("long").alias("n_diff"),
            # denominator = neighbors actually ranked, not a fixed k:
            # on small/heavily-filtered corpora (< k+1 vectors) a fixed
            # k silently deflates the score (3/3 disagreeing would read
            # 0.6, not 1.0)
            F.count(F.lit(1)).alias("_n_nbrs"),
        )
        .select(
            F.col("query_id").alias(id_col),
            "label",
            "n_diff",
            F.round(
                F.col("n_diff").cast("double")
                / F.col("_n_nbrs").cast("double"),
                6,
            ).alias("noise_score"),
        )
    )
