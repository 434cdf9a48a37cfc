"""Cache discipline over the persisting operators (VERDICT r11 #6).

Operators persist shared sub-frames that the returned lazy plan
references (see cqdg_etl_spark/operators/__init__.py for the
contract). A long-lived session composing many operators must have ONE
standard reclamation path: ``spark.catalog.clearCache()`` after the
consuming action. That only works if every operator persist goes
through the DataFrame API (CacheManager-tracked) — a bare RDD-level
persist would survive clearCache and leak forever. This test sweeps a
representative query per persisting operator family, runs the
consuming action, clears the catalog cache, and asserts the JVM
reports zero persistent RDDs.
"""

from __future__ import annotations

import pytest

# One registered query per persisting operator family (operators/ or
# query-level persists): graph wedge/link ops, graph metrics, bigram
# LM, retrieval, importance, sampling, profile, temporal, sketches,
# dedup shingle frames, similarity band index, ranking cumsum,
# sparse_sim postings, plus the heaviest query-level persist sites.
SWEEP = [
    "graph_triangle_counts",   # operators/graph.py (e, nbrs)
    "graph_adamic_adar",       # operators/graph.py (e, adj, half)
    "graph_modularity_brands",  # operators/graph_metrics.py
    "tx_bigram_lm_score",      # operators/lm.py toked frame
    "ret_bm25_topk",           # operators/retrieval.py doc-length table
    "ds_dsir_logweights",      # operators/importance.py count tables
    "ds_mixture_weighted_sample",  # operators/sampling.py counts frame
    "pf_key_skew_profile",     # operators/profile.py n_keys frame
    "ev_resample_ffill",       # operators/temporal.py bucketed aggregate
    "dd_minhash_verified_pairs",   # operators/dedup.py signature frames
    "dd_embedding_cosine_pairs",   # operators/similarity.py band index
    "ds_quality_budget_select",    # operators/ranking.py global cumsum
    "dd_lsh_param_audit",      # query-level persist (datapipe15)
    "pipe_corpus_curation_e2e",    # query-level persist (datapipe11)
]


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


@pytest.mark.parametrize("name", SWEEP)
def test_clear_cache_reclaims_operator_persists(spark, sf_dir, name):
    from cqdg_etl_spark.queries import REGISTRY

    df = REGISTRY[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    assert _n_persistent_rdds(spark) == 0, (
        f"{name}: persisted frames survive clearCache — an RDD-level "
        "persist escaped the CacheManager (see operators/__init__.py)"
    )


def test_iterative_ops_blocks_are_gc_reclaimable(spark, sf_dir):
    """The localCheckpoint-based iterative ops leave RDD-LEVEL
    persistent blocks (localCheckpoint persists outside the
    CacheManager, so clearCache cannot touch them). The reclamation
    path for a long-lived session is the ContextCleaner: once the
    returned DataFrame is garbage-collected, every checkpoint block
    must become unreferenced and get cleaned. This pins that no hidden
    reference (module global, registry memo) keeps them alive."""
    import gc
    import time

    from cqdg_etl_spark.queries import REGISTRY

    spark.catalog.clearCache()
    df = REGISTRY["graph_pagerank_coparts"].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    assert _n_persistent_rdds(spark) > 0  # checkpoint blocks exist
    del df
    spark.catalog.clearCache()
    # generous deadline: the ContextCleaner is async and a loaded box
    # (driver gate runs suites concurrently) can delay full GCs
    deadline = time.time() + 90
    n = _n_persistent_rdds(spark)
    while n > 0 and time.time() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        n = _n_persistent_rdds(spark)
    assert n == 0, (
        f"{n} localCheckpoint blocks still referenced after the "
        "returned frame was dropped — an operator or registry global "
        "is pinning per-round checkpoints"
    )
