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
# Round-7 window (VERDICT r06 items 1, 3, 7): the 12 queries changed or
# added this round head the window (the three newly oracle-gated scale
# features — dynamic partition pruning, runtime bloom-filter join
# pruning, Z-order pruning payoff — the two advisor-fixed queries,
# observed_scan_metrics' timezone-independent reconstruction and
# compaction_fidelity's real-file-count gate, the two connector gates
# promoting the Python DataSource's stream reader and two-phase writer
# from test-only to hash-checked, the two Spark-4 SQL-surface gates —
# pipe syntax and session-variable/EXECUTE IMMEDIATE binding — and the
# delta-rule join-view-maintenance gate, and the two streaming gates —
# the foreachBatch materialized view and the stream-static broadcast
# enrichment), then ALL
# 26 queries whose newest driver row is still r01/r02 (the r06 verdict's
# top item: 5 r01 + 21 r02, each judge-verified green in the r06 session
# — this closes the rotation goal: after r07 no row rides pre-r03
# evidence), then 12 of the 49 r03-stale queries, oldest evidence first.
# The remaining 37 r03-stale sit just below the cutoff as the r08
# rotation head.
_PRIORITY: list[str] = [
    # ===== ROUND-7 WINDOW (the driver records ~50 rows) =====
    # (a) changed or new this round — fresh rows required:
    "dpp_partition_pruned_join",  # new: DPP gate, runtime partition metric
    "bloom_join_pruning",         # new: might_contain rewrite, shuffle regime
    "zorder_pruning_payoff",      # new: footer-measured 2-D scan pruning
    "observed_scan_metrics",      # changed: tz-independent bounds round trip
    "compaction_fidelity",        # changed: gates actual on-disk file count
    "pydatasource_stream_scan_agg",  # new: connector stream-reader gate
    "pydatasource_writer_roundtrip",  # new: connector 2-phase-commit writer
    "sql_pipe_syntax_agg",        # new: Spark 4 |> pipe-syntax parse gate
    "sql_session_vars_params",    # new: DECLARE/SET VAR + EXECUTE IMMEDIATE
    "incremental_join_view_maintenance",  # new: delta-rule join-IVM gate
    "stream_incremental_agg_view",  # new: streaming materialized-view gate
    "stream_static_enrich_counts",  # new: stream-static broadcast join gate
    "json_variant_extract",       # new: Spark 4 VARIANT round-trip gate
    "analyze_table_stats",        # new: ANALYZE->catalog->CBO stats gate
    # (b) all 26 pre-r03 queries — the registry's oldest evidence
    #     (5 r01 + 21 r02; judge-verified green in the r06 session):
    "array_l2_norm",
    "cross_join_dims",
    "dedup_embedding_cosine",
    "dedup_fingerprint_md5",
    "dedup_near_clusters",
    "collect_list_sorted",
    "dedup_exact_docs",
    "pack_sequences",
    "window_lag_delta",
    "window_running_sum",
    "window_ntile_percent_rank",
    "time_window_tumbling",
    "time_window_sliding",
    "session_window_gap",
    "interval_join_sessions",
    "time_bounded_self_join",
    "sql_interface_revenue",
    "cube_counts",
    "nested_struct_map",
    "pivot_status_counts",
    "unpivot_measures",
    "set_except_all",
    "percentiles_exact",
    "array_set_functions",
    "string_function_suite",
    "text_quality_rules",
    # (c) 10 of the 49 r03-stale queries, oldest evidence first (two of
    #     the original twelve moved below the cutoff when the round-7
    #     VARIANT and ANALYZE-stats gates took window slots above):
    "scan_project_prune",
    "filter_null_nan_threshold",
    "case_when_buckets",
    "regexp_extract_number",
    "max_string_and_date",
    "agg_approx_distinct",
    "heavy_hitter_terms",
    "corpus_curation_pipeline",
    "embedding_covariance",
    "cohort_retention",
    # ===== window cutoff (~50) — entries below are the r08 rotation
    # head: the remaining r03-stale queries (the seven names directly
    # below moved down when the seven round-7 connector/SQL-surface/
    # IVM/streaming gate queries took window slots above):
    "funnel_conversion",
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
    "grouping_sets_id",
    "window_first_last_nth",
    "timeseries_gapfill_ffill",
    "corr_covar_exact",
    "window_time_range_rolling",
    "salted_two_stage_agg",
    "anomaly_rolling_zscore",
    "merge_upsert_orders",
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
