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
# Round-3 window: 44 never-checked (cohort/funnel lead — their broadcast
# fix needs a fresh row), agg_approx_distinct (newly oracled, was
# no_oracle in r02), and 5 r01-era greens backing the most SURVEY §2
# rows (scan_project_prune, filter_null_nan_threshold, case_when_buckets,
# regexp_extract_number, max_string_and_date).
_PRIORITY: list[str] = [
    # --- (a) never-driver-checked: judge-named bench/scale shapes first
    "heavy_hitter_terms",
    "corpus_curation_pipeline",
    "embedding_covariance",
    "cohort_retention",        # (b) broadcast hint removed this round
    "funnel_conversion",       # (b) broadcast hints removed this round
    "sessionize_gap_cumsum",
    "scd2_type_intervals",
    "hll_distinct_accuracy",
    "bitmap_distinct_rollup",
    "pandas_group_gap_stats",
    "cogroup_order_reconciliation",
    "udtf_word_bigrams",
    "grouped_agg_pandas_weighted_avg",
    "pandas_udf_digit_sum",
    "sql_lateral_topk",
    "percentiles_disc",
    "running_distinct_types",
    "kfold_assignment",
    "text_linear_classifier_scores",
    # --- never-checked: LLM-pipeline and analytics family
    "decontaminate_ngram_overlap",
    "sample_token_budget_per_source",
    "text_top_ngram_fraction",
    "tfidf_top_terms",
    "embedding_quantize_int8",
    "embedding_label_centroids",
    "chunk_documents_overlap",
    "mixture_weighted_resample",
    "boilerplate_token_prune",
    "multimodal_arrow_stats",
    "text_dup_ngram_fraction",
    "text_char_lm_score",
    "regression_per_source",
    "dedup_incremental_fingerprints",
    "source_share_gini",
    "knn_label_accuracy",
    # --- never-checked: SQL/relational surface
    "grouping_sets_id",
    "window_first_last_nth",
    "timeseries_gapfill_ffill",
    "corr_covar_exact",
    "window_time_range_rolling",
    "salted_two_stage_agg",
    # --- (b) new this round, oracle-bearing (verified in driver_sim)
    "anomaly_rolling_zscore",
    "bpe_first_merge_invariant",
    # --- newly oracle-bound this round (r02 row was no_oracle)
    "agg_approx_distinct",
    # --- (c) stale-green recheck slots: r01-era greens carrying the most
    #     SURVEY §2 rows (P1, P4-P7, P8, F1, A3 ride these)
    "scan_project_prune",
    "filter_null_nan_threshold",
    "case_when_buckets",
    "regexp_extract_number",
    "max_string_and_date",
    # ===== window cutoff (~50) — entries below are the r04 rotation head
    # --- never-checked, displaced from the r03 window by the two new
    #     oracle queries above (first in line next round)
    "merge_upsert_orders",
    "recursive_cte_hierarchy",
    # --- new this round (oracle-verified via driver_sim at sf0.01+sf0.1)
    "bm25_topk_docs",
    "contrastive_hard_negatives",
    "skew_salted_join",
    "embedding_random_projection",
    "zscore_normalize_features",
    "tokenize_to_vocab_ids",
    "stream_session_counts",
    "group_holdout_split",
    "temporal_split_leakage",
    "sim_ann_recall_eval",
    "pagerank_invariants",
    # percentiles_approx gained a GK-bound oracle this round; it already
    # sits in the never-checked overflow above
    # --- never-checked overflow (oracle-bearing)
    "collocation_pmi_topk",
    "doc_hash_embedding",
    "dedup_cluster_keep_best",
    "cdc_apply_changes",
    "weighted_sample_per_source",
    "stream_dedup_counts",
    "table_checksum_orders",
    "stream_stream_join_counts",
    "rfm_customer_segments",
    "basket_part_affinity",
    "path_3gram_topk",
    "monthly_revenue_moving_avg",
    "value_band_join",
    "nation_revenue_share",
    "attribution_last_touch",
    "segment_repeat_rate",
    "hourly_seasonal_baseline",
    "curriculum_length_buckets",
    "posexplode_ordinality",
    "incremental_agg_merge",
    "zorder_bucket_histogram",
    "variant_shred_props",
    "map_functions_suite",
    "try_arithmetic_suite",
    "regexp_extract_all_tokens",
    "listagg_distinct_sources",
    "fuzzy_name_match_blocked",
    "data_quality_audit",
    "global_row_number_shards",
    "xml_parse_extract",
    "collation_case_insensitive",
    "date_function_suite",
    "stream_tumbling_counts",
    "pivot_multi_agg",
    "generator_null_semantics",
    "histogram_fixed_buckets",
    "graph_bipartite_projection",
    "mad_robust_stats",
    "sliding_distinct_users",
    "markov_transition_matrix",
    "chi2_contingency_assoc",
    # --- never-checked overflow (rows-only by design)
    "bpe_learn_merges",        # full merge table; first merge oracled above
    "embedding_pq_codes",      # numpy-reference-verified in pytest
    "sim_ann_pq_adc",          # ADC arithmetic numpy-exact in pytest
    "embedding_pca_label_means",
    "dedup_semantic",          # (b) sim/dup_of coupling fixed this round
    "multimodal_audio_rms",
    "percentiles_approx",
    "pagerank_event_transitions",
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
