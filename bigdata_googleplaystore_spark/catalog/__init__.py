"""Query catalog: importing this package populates the registry."""

from __future__ import annotations

from .registry import QUERIES, QueryDef, register  # noqa: F401

# Populate the registry. Each module registers its queries at import time.
from . import llm, ops, tpch  # noqa: E402,F401

from .tpch import flagship  # noqa: E402,F401


# The driver records CORRECTNESS rows for only the first ~50 entries of
# queries(), so dict order decides which queries get the hard signal.
#
# ROTATION POLICY (round 3+): each round the window head is
#   (a) never-driver-checked queries, judge-flagged / bench-headline /
#       scale-shape ones first;
#   (b) any query whose semantics or implementation changed this round
#       (it needs a fresh row regardless of past greens);
#   (c) ~5 STALE-GREEN RECHECK slots — previously-green queries, oldest
#       evidence first, so no §2 row ever rides a >2-round-old signal
#       (VERDICT r02 item 6);
# then the remaining never-checked (the next round's rotation head), then
# the rest of the previously-green set, oldest evidence first.
#
# Round-13 window (VERDICT r12 item 1, prescription followed verbatim):
# (a) the 4 gates that landed late in r12 and have never had a driver
# row (judge full-sim green at r12 HEAD), plus (b) the 4 names whose
# newest driver row is still r06 (deferred from the r12 window with a
# committed targeted sim); then (c) 42 of the 46 r07-stale names,
# alphabetical. 50 names total = the driver's window. The 4 r07-stale
# names that don't fit (unpivot_measures + the three window_* shapes —
# pure-expression gates with dense pytest coverage) head the r14
# rotation together with gates NEW this round (registered immediately
# after slot 50, per policy).
_PRIORITY: list[str] = [
    # ===== ROUND-13 WINDOW (the driver records exactly 50 rows) =====
    # (a) never-driver-checked (late-r12 additions):
    "stream_cdf_update_pairing",
    "stream_cdf_scd2_dimension",
    "mv_manifest_timestamp_travel",
    "batch_table_changes",
    # (b) newest driver row is r06:
    "pydatasource_scan_agg",
    "text_sink_scan_roundtrip",
    "json_sink_scan_roundtrip",
    "orc_sink_scan_roundtrip",
    # (c) 42 of the 46 r07-stale names, alphabetical:
    "agg_approx_distinct",
    "array_l2_norm",
    "array_set_functions",
    "case_when_buckets",
    "cohort_retention",
    "collect_list_sorted",
    "compaction_fidelity",
    "corpus_curation_pipeline",
    "cross_join_dims",
    "cube_counts",
    "dedup_embedding_cosine",
    "dedup_exact_docs",
    "dedup_fingerprint_md5",
    "dedup_near_clusters",
    "embedding_covariance",
    "filter_null_nan_threshold",
    "heavy_hitter_terms",
    "incremental_join_view_maintenance",
    "interval_join_sessions",
    "json_variant_extract",
    "max_string_and_date",
    "nested_struct_map",
    "observed_scan_metrics",
    "pack_sequences",
    "percentiles_exact",
    "pivot_status_counts",
    "pydatasource_stream_scan_agg",
    "pydatasource_writer_roundtrip",
    "regexp_extract_number",
    "scan_project_prune",
    "session_window_gap",
    "set_except_all",
    "sql_interface_revenue",
    "sql_pipe_syntax_agg",
    "sql_session_vars_params",
    "stream_incremental_agg_view",
    "stream_static_enrich_counts",
    "string_function_suite",
    "text_quality_rules",
    "time_bounded_self_join",
    "time_window_sliding",
    "time_window_tumbling",
    # ===== past slot 50: r14 rotation head =====
    # the 4 r07-stale names deferred from this window:
    "unpivot_measures",
    "window_lag_delta",
    "window_ntile_percent_rank",
    "window_running_sum",
    # gates NEW this round are appended here as they land (policy above):
    "multimodal_video_frames",
    "multimodal_av_demux",
    "dedup_video_frames",
    # ===== r12 window, kept for the record (all green in r12) =====
    "stream_cdf_from_manifest",
    "stream_cdf_mv_maintenance",
    "stream_cdf_table_replication",
    "mv_manifest_conditional_put",
    "mv_manifest_schema_enforcement",
    "dedup_ingest_on_write",
    "dedup_simhash",
    "sim_cosine_topk",
    "text_token_stats",
    "text_quality_score",
    "text_lang_id",
    "doc_fingerprint_winnow",
    "text_bpe_token_count",
    "text_repetition_ratio",
    "split_train_test",
    "sample_quota_per_source",
    "text_scrub_patterns",
    "distinct_count_agg",
    "set_except",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_supplier_volume",
    "q6_forecast_revenue",
    "q4_order_priority",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_orders",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q22_inactive_customers",
    "q7_nation_volume_shipping",
    "q15_top_supplier",
    "q21_waiting_suppliers",
    "q9_product_profit",
    "q16_supplier_variety",
    "q20_excess_stock_suppliers",
    "q12_priority_shipping",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q11_important_stock",
    "window_range_frame_sum",
    "asof_join_last_click",
    "bpe_learn_merges",
    "bucketed_join_no_shuffle",
    "dedup_image_ahash",
    "dedup_image_ahash_recall",
    "graph_triangle_count",
    "schema_evolution_merge",
    "embedding_pq_train_invariant",
]

# Pre-rotation (round-2) window order, kept for the record of what r02
# checked; everything here already has a green r01/r02 row and sorts
# after the block above via _ordered()'s registry-order fallback.
_R02_WINDOW: list[str] = [
    # TPC-H shapes (never driver-checked in round 1)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_supplier_volume",
    "q6_forecast_revenue",
    "q4_order_priority",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_orders",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q22_inactive_customers",
    "q7_nation_volume_shipping",
    "q15_top_supplier",
    "q21_waiting_suppliers",
    "q9_product_profit",
    "q16_supplier_variety",
    "q20_excess_stock_suppliers",
    "q12_priority_shipping",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q11_important_stock",
    # windows / time / joins / misc (never driver-checked in round 1)
    "window_lag_delta",
    "window_running_sum",
    "window_range_frame_sum",
    "window_ntile_percent_rank",
    "time_window_tumbling",
    "time_window_sliding",
    "session_window_gap",
    "asof_join_last_click",
    "interval_join_sessions",
    "time_bounded_self_join",
    "agg_approx_distinct",
    "sql_interface_revenue",
    "cube_counts",
    "nested_struct_map",
    "pivot_status_counts",
    "unpivot_measures",
    "set_except_all",
    "percentiles_exact",
    "array_set_functions",
    "string_function_suite",
    # round-1 reds, fixed this round (need a fresh row to go green)
    "collect_list_sorted",
    "multimodal_frame_stats",
    "pack_sequences",
    # new or newly-oracled this round
    "dedup_embedding_ann",
    "dedup_minhash_lsh",
    "dedup_simhash_containment",
    # semantics changed this round (null-content exclusion) — re-check
    "dedup_exact_docs",
    # new training-pipeline queries (the window holds ~50; the overflow
    # rotates in next round once the above have their green rows)
    "text_quality_rules",
    "decontaminate_ngram_overlap",
    "sample_token_budget_per_source",
    # round-2 late additions — next in line if the window extends, and the
    # head of the round-3 rotation otherwise
    "graph_bipartite_projection",
    "text_dup_ngram_fraction",
    "text_char_lm_score",
    "regression_per_source",
    "embedding_covariance",
    "embedding_pca_label_means",
    "heavy_hitter_terms",
    "mad_robust_stats",
    "dedup_semantic",
    "dedup_incremental_fingerprints",
    "sliding_distinct_users",
    "markov_transition_matrix",
    "source_share_gini",
    "knn_label_accuracy",
    "chi2_contingency_assoc",
    "multimodal_audio_rms",
    "percentiles_disc",
    "running_distinct_types",
    "grouped_agg_pandas_weighted_avg",
    "kfold_assignment",
    "text_linear_classifier_scores",
    "sql_lateral_topk",
]


def _ordered() -> dict[str, QueryDef]:
    out = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    out.update({n: qd for n, qd in QUERIES.items() if n not in out})
    return out


def spark_queries():
    """name -> (spark, sf_dir) -> DataFrame, for __spark_entry__.queries()."""
    return {name: qd.fn for name, qd in _ordered().items()}


def oracle_sqls():
    """name -> DuckDB SQL, for __spark_entry__.oracle_sql(); rows-only
    queries (no SQL-expressible oracle) are omitted per the driver contract."""
    return {name: qd.oracle for name, qd in _ordered().items() if qd.oracle}
