"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 as a smoke check;
``queries()`` / ``oracle_sql()`` publish the full named-query registry
from cqdg_etl_spark.queries (one entry per implemented operator from
SURVEY.md §2 plus the training-data operators). Queries without a
SQL-expressible semantics (e.g. LSH banding) omit the oracle entry and
get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cqdg_etl_spark.queries import REGISTRY

# Round-1 driver CORRECTNESS covered exactly the first 50 names in
# registry insertion order, leaving the event/streaming/LLM-pipeline
# suites without driver rows. Publish the registry with the
# not-yet-driver-verified names first (oracle-bearing before rows-only,
# so the strongest checks land inside any per-round cap), then the 50
# already-green round-1 names.
_FRONT = [
    "agg_cube_priority_status",
    "set_intersect_except_buyers",
    "agg_unpivot_order_metrics",
    "ops_global_sort_daily",
    "j_bloom_filtered_join",
    "ops_zorder_orders",
    "ev_tumbling_hourly",
    "ev_sessionize",
    "ev_hopping_halfhour",
    "ev_funnel_transitions",
    "ev_top3_users_per_type",
    "ev_moving_avg_3",
    "ev_weekly_retention",
    "ev_rfm_segments",
    "ev_anomaly_robust_z",
    "ev_tumbling_hourly_stream",
    "ev_stream_dedup_keys",
    "ev_stream_view_purchase_join",
    "ev_stream_enrich_static",
    "ev_stream_hopping_halfhour",
    "ev_stream_session_windows",
    "ev_stream_stateful_totals",
    "pipe_customer_document",
    "pipe_clinical_e2e",
    "ev_asof_purchase_view",
    "ev_range_error_near_signup",
    "etl_scd2_customer_merge",
    "dd_exact_fingerprint_groups",
    "dd_ngram_jaccard_pairs",
    "dd_embedding_cosine_pairs",
    "ann_topk_bruteforce",
    "tx_quality_features",
    "tx_language_id",
    "tx_token_counts_by_source",
    "tx_fingerprints",
    "tx_winnowing_fingerprints",
    "tx_cms_heavy_hitters",
    "tx_sentences_udtf",
    "mm_media_meta",
    "dd_duplicate_clusters",
    "tx_tfidf_term_stats",
    "ds_train_val_split",
    "ds_stratified_sample",
    "ds_decontaminate_vs_benchmark",
    "ds_pack_sequences",
    "ds_chunk_documents",
    "tx_quality_quantile_filter",
    "tx_quality_calibrated_udf",
    "mm_png_header_roundtrip",
    "tx_repetition_metrics",
    "tx_c4_rule_filter",
    "tx_pii_redaction",
    "dd_canonical_per_cluster",
    "tx_top_bigrams",
    "pf_profile_orders",
    "pf_expect_orders",
    "emb_label_centroids",
    "pf_histogram_totalprice",
    "emb_quantize_int8",
    "dd_minhash_lsh_candidates",
    "dd_minhash_verified_pairs",
    "dd_simhash_near_pairs",
    "ann_topk_lsh",
    "ann_topk_lsh_multiprobe",
    "ann_topk_ivf",
    "mm_media_features",
]


def _ordered_names() -> list[str]:
    front = [n for n in _FRONT if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(front)]
    return front + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5 star join) on /root/testdata/sf0.001."""
    return REGISTRY["q5_local_supplier_volume"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
