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

# Driver correctness-row ordering. The driver caps a round at 50 rows,
# so _FRONT position is the publication priority.
_FRONT = [
    # Mechanically derived at the round-10 window build: `python
    # tools/verification_state.py front` after the r09 promote (zero
    # roll-over — all 50 r9 rows verified) and the datapipe18
    # publication. Debt-prefix policy (tests/test_verification_state
    # .py): positions 1-8 the datapipe18 publication (never
    # driver-verified); positions 9-14 the six r4-currency names
    # (hash-unchanged since their rows — currency debt, not
    # correctness doubt; VERDICT r9 lists them); positions 15-50
    # drain the r5 tail oldest-first. This round's edits (datapipe23
    # repair, datapipe21 chi2 guard) touched only staged modules —
    # the tool confirmed zero hash-stale published names. Positions
    # 51+ continue the r5/r6 tail for roll-over headroom.
    "fe_woe_information_value",
    "ev_changepoint_cusum",
    "graph_modularity_brands",
    "graph_bfs_hops",
    "ret_ndcg_eval",
    "pf_column_mutual_information",
    "ev_attribution_linear",
    "mm_image_dhash_index",
    "pipe_clinical_e2e",
    "graph_label_propagation",
    "fe_winsorize_totalprice",
    "mb_association_rules",
    "pf_ks_totalprice_drift",
    "pf_benford_totalprice",
    "tx_fingerprints",
    "ds_decontaminate_vs_benchmark",
    "ds_pack_sequences",
    "tx_cms_heavy_hitters",
    "ds_chunk_documents",
    "pf_profile_orders",
    "ds_deterministic_shuffle",
    "ds_interleave_sources",
    "ds_per_group_sample",
    "pf_equidepth_nchars_by_lang",
    "agg_modern_functions",
    "ev_markov_transitions",
    "etl_merge_upsert",
    "ds_dsir_logweights",
    "sk_hll_users",
    "graph_adamic_adar",
    "tx_ccnet_buckets",
    "sk_hll_users_by_type",
    "ev_resample_ffill",
    "ev_cusum_drift",
    "sk_hll_union_intersection",
    "pf_psi_totalprice_drift",
    "tx_vocab_coverage",
    "ev_trend_daily",
    "ds_pps_systematic_sample",
    "ds_quality_budget_select",
    "ds_temperature_mixture",
    "tx_inverted_index",
    "tx_bpe_first_merges",
    "tx_source_kl_divergence",
    "ann_topk_gemm",
    "emb_covariance_cells",
    "pf_key_skew_profile",
    "ev_conversion_latency_quantiles",
    "fe_target_encoding_loo",
    "ds_shard_assignment",
    "sql_pipe_syntax_orders",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q22_idle_customers",
    "q12_priority_by_returnflag",
    "q13_order_count_distribution",
    "q17_small_quantity_revenue",
    "q21_last_shipper",
    "q2_min_cost_supplier",
    "q16_supplier_part_variety",
    "q20_heavy_shippers",
    "j2_left_join_order_counts",
    "j5_full_outer_summary_merge",
    "j6_cross_domain_zero_fill",
    "ann_topk_bruteforce",
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
