"""IVF + PQ-ADC + exact-rerank ANN — the production serving shape.

Composes the engine's three verified ANN stages into the pipeline a
billion-vector index actually runs (FAISS `IndexIVFPQ` + refine,
Jégou et al. 2011 §V; Johnson et al. 2017): an IVF coarse quantizer
prunes the corpus to the query's ``nprobe`` cells, PQ asymmetric
distances over m-byte codes rank those candidates WITHOUT touching a
single full vector, and only the per-query ``shortlist`` survivors pay
the exact-cosine rerank on real vectors.

New module on purpose: every building block imports from
``operators/similarity.py`` unchanged, so the published ANN fleet's
verification closure does not move (the same hash-discipline reasoning
as operators/gemm.py and operators/lsh_audit.py).

Scale shape at 100 TB: the quantizers fit on a systematic sample
(``train_mod``); the corpus-sized artifacts are ONE cell id + m small
codes per vector (a 256-byte float32 row becomes ~5 bytes of index);
the ADC scan streams map-side over codes with no shuffle until the
per-query shortlist window; and the only full-vector traffic in the
whole query is the |Q|·shortlist-row fetch join before the rerank —
bounded by the OUTPUT size times shortlist/k, independent of corpus
size. Every stage is deterministic (seeded Rademacher planes, exact
decimal centroid sums, fixed-order IEEE folds), so the approximate
result itself is value-hash-checkable by an external engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from cqdg_etl_spark.operators.similarity import (
    _adc_distance_arrow,
    _nearest_cells_arrow,
    _pq_assign,
    ivf_fit_centroids,
    pq_fit_codebooks,
)


def ivf_pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse_bits: int = 4,
    nprobe: int = 2,
    m: int = 4,
    pq_bits: int = 4,
    seed: int = 42,
    train_mod: int = 1,
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos): exact-cosine top-k over the
    PQ-ADC shortlist of the query's ``nprobe`` IVF cells.

    Contract details that make the result engine-exact: corpus vectors
    are assigned to their single nearest coarse centroid (ties → lower
    cell id); the candidate set is the distinct (query, neighbor)
    pairs sharing a probed cell (a corpus vector lives in exactly one
    cell, so no dedup pass is needed); ADC shortlist rank orders by
    (adc, neighbor_id) and the final rank by (cos DESC, neighbor_id).
    A query whose probed cells hold fewer than ``shortlist`` vectors
    simply reranks them all.

    Sizing rule: ``shortlist`` must exceed the expected size of the
    query's true-neighbor cluster within the probed cells — the PQ
    stage's per-candidate noise (sigma grows as codebooks coarsen) is
    only harmless if the exact rerank sees every plausible candidate
    (measured on an 8x30 clustered fixture: shortlist 20 -> recall
    0.62, shortlist 40 -> 1.0; tests/test_datapipe16.py).
    """
    from cqdg_etl_spark.functions.vectors import dot, l2_norm

    centers = ivf_fit_centroids(
        corpus, id_col, vec_col, n_bits=coarse_bits, seed=seed,
        train_mod=train_mod,
    )
    assign1 = _nearest_cells_arrow(centers, 1)
    assignp = _nearest_cells_arrow(centers, nprobe)
    sub, books = pq_fit_codebooks(
        corpus, id_col, vec_col, m=m, n_bits=pq_bits, seed=seed,
        train_mod=train_mod,
    )

    # Index artifacts: (neighbor_id, cell, codes) — NO full vectors.
    coded = _pq_assign(corpus, books, sub, id_col, vec_col)
    index = coded.select(
        F.col(id_col).alias("neighbor_id"),
        assign1(F.col(vec_col))[0].alias("cell"),
        F.array(*[F.col(f"code_{s}") for s in range(m)]).alias("codes"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(assignp(F.col(vec_col))).alias("cell"),
    )

    adc = _adc_distance_arrow(books, sub)
    scored = F.broadcast(q).join(index, "cell").select(
        "query_id",
        "neighbor_id",
        adc(F.col("q_vec"), F.col("codes")).alias("adc"),
    )
    w_short = W.partitionBy("query_id").orderBy(
        F.asc("adc"), F.asc("neighbor_id")
    )
    short = (
        scored.withColumn("srank", F.row_number().over(w_short))
        .filter(F.col("srank") <= shortlist)
        .select("query_id", "neighbor_id")
    )

    # Rerank: the ONLY full-vector traffic — |Q|·shortlist rows.
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
    )
    rer = (
        short.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cos"),
        )
    )
    w_final = W.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cos", 6).alias("cos"),
        )
    )
