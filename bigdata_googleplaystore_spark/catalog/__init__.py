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
# Round-9 window (VERDICT r08 items 2-3 + all four r08 ADVICE items,
# plus the round's feature additions):
# (a) the 26 NEW gates (eleven manifest/lakehouse, eight sketch-tier,
# SQL scripting, statestore reader, incremental minhash, IVF index
# persistence) and the four gates whose implementations changed this
# round (compaction's write-base-before-delete swap, the '{]'
# guaranteed-invalid JSON injection, the watermark data-assumption
# guard, ivf_topk's stored-index consistency check) need fresh rows
# regardless of past greens. Then (b) the 15 queries whose newest
# driver row is r03 — the registry's oldest evidence — and (c) the 45
# r04-stale names in r04 insertion order. 94 names total; the driver
# records ~50, so roughly the last 40 r04 names roll to r10 (after
# r09 no query's newest row is older than r04; r10 clears the
# remainder to r05+).
_PRIORITY: list[str] = [
    # ===== ROUND-9 WINDOW (the driver records ~50 rows) =====
    # (a) new or implementation-changed this round — fresh rows required:
    "mv_manifest_snapshot_read",  # new: manifest-committed atomic snapshots
    "stream_manifest_exactly_once",  # new: stream publish via manifest commits
    "mv_manifest_row_deletes",  # new: merge-on-read equality deletes + CoW catch-up
    "mv_manifest_change_feed",  # new: O(delta) CDF between manifest versions
    "mv_manifest_zone_skip",  # new: zone-map data skipping from manifest stats
    "mv_manifest_upsert",  # new: atomic MERGE via sequence-aware delete cutoff
    "mv_manifest_bloom_lookup",  # new: bloom sidecar point-lookup skipping
    "mv_manifest_metadata_count",  # new: COUNT(*) from manifest metadata
    "mv_manifest_rollback",  # new: RESTORE via one atomic commit, history intact
    "mv_manifest_schema_evolution",  # new: additive columns via footer-union reads
    "mv_manifest_forget_keys",  # new: right-to-be-forgotten with erasure proof
    "sketch_kmv_merge_partials",  # new: KMV semilattice merge via state table
    "sketch_cms_signed_cdc",  # new: CMS under retractions (signed linearity)
    "sketch_cms_join_size",  # new: CBO join-size estimate via CMS inner product
    "sketch_sample_quantiles",  # new: deterministic hash-sample order stats
    "sketch_kmv_distinct",  # new: KMV distinct-count sketch vs exact
    "sketch_theta_set_ops",  # new: theta union/intersection estimates
    "sketch_cms_point_queries",  # new: count-min point queries, top-20 terms
    "sketch_cms_merge_partials",  # new: CMS linear merge via state table
    "sql_scripting_control_flow",  # new: BEGIN..END WHILE-loop SQL scripting
    "stream_state_store_read",  # new: statestore-format checkpoint reader
    "dedup_minhash_incremental",  # new: indexed near-dup over a delta batch
    "dedup_ngram_jaccard_incremental",  # new: exact-tier incremental near-dup
    "dedup_incremental_clusters",  # new: label-fold incremental connected components
    "sim_ann_ivf_index_persist",  # new: train->persist->reload->query lifecycle
    "sim_ann_ivf_index_append",  # new: frozen-quantizer index growth (ingest)
    "mv_state_compaction",  # changed: write-base-before-delete crash safety
    "json_corrupt_record_permissive",  # changed: '{]' guaranteed-invalid inject
    "stream_watermark_late_drop",  # changed: data-assumption guard
    "sim_ann_ivf_index_reuse",  # changed: stored-index cid consistency check
    # (b) the 15 r03-stale queries — the registry's oldest evidence
    #     (each green in the r08 judge's full driver_sim re-run):
    "salted_two_stage_agg",
    "sample_token_budget_per_source",
    "scd2_type_intervals",
    "sessionize_gap_cumsum",
    "source_share_gini",
    "sql_lateral_topk",
    "text_char_lm_score",
    "text_dup_ngram_fraction",
    "text_linear_classifier_scores",
    "text_top_ngram_fraction",
    "tfidf_top_terms",
    "timeseries_gapfill_ffill",
    "udtf_word_bigrams",
    "window_first_last_nth",
    "window_time_range_rolling",
    # (c) the 45 r04-stale queries, r04 insertion order (the driver
    #     window holds ~50, so the last ~15 roll to r10):
    "text_char_entropy",
    "logreg_quality_classifier",
    "multimodal_bytes_meta",
    "multimodal_frame_stats",
    "dedup_ngram_jaccard",
    "dedup_simhash_containment",
    "bpe_first_merge_invariant",
    "dedup_embedding_ann",
    "partitioned_scan_prune",
    "multimodal_audio_rms",
    "sim_ann_recall_eval",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "dedup_semantic",
    "pagerank_event_transitions",
    "embedding_pca_label_means",
    "dedup_cluster_keep_best",
    "stream_dedup_counts",
    "stream_stream_join_counts",
    "stream_session_counts",
    "stream_tumbling_counts",
    "percentiles_approx",
    "recursive_cte_hierarchy",
    "bm25_topk_docs",
    "contrastive_hard_negatives",
    "skew_salted_join",
    "embedding_random_projection",
    "zscore_normalize_features",
    "tokenize_to_vocab_ids",
    "group_holdout_split",
    "temporal_split_leakage",
    "pagerank_invariants",
    "collocation_pmi_topk",
    "doc_hash_embedding",
    "cdc_apply_changes",
    "weighted_sample_per_source",
    "table_checksum_orders",
    "rfm_customer_segments",
    "basket_part_affinity",
    "path_3gram_topk",
    "variant_shred_props",
    "map_functions_suite",
    "try_arithmetic_suite",
    "date_function_suite",
    "xml_parse_extract",
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
