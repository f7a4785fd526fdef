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
# Round-10 window (VERDICT r09 item 2 + all five r09 ADVICE fixes):
# (a) the 10 gates whose implementations changed this round — the
# manifest commit core (committer-unique staging + pluggable
# CommitBackend + checkpoint pointer), the empty-micro-batch commit
# guard (stream_manifest_exactly_once), compaction's spent-delete drop
# + vacuum's _deletes GC with the extended erasure proof
# (mv_manifest_row_deletes, mv_manifest_forget_keys), the
# prune_snapshot_batches granularity normalization
# (mv_manifest_zone_skip), latest_version's checkpoint fast path
# (mv_manifest_rollback via history), cms_lookup's left-join absent-
# item fix (the three cms_lookup gates), and the shingle-bucketed
# posting store (dedup_ngram_jaccard_incremental). Then (b) the 40
# r04-stale queries — the registry's oldest evidence — in r04
# insertion order. 50 names total = the driver's window; after r10 no
# query's newest driver row is older than r05.
_PRIORITY: list[str] = [
    # ===== ROUND-10 WINDOW (the driver records ~50 rows) =====
    # (a) implementation-changed this round — fresh rows required:
    "dedup_ngram_jaccard_incremental",  # changed: shingle-bucketed store + pruning
    "mv_manifest_forget_keys",  # changed: cutoff deletes + _deletes erasure proof
    "mv_manifest_row_deletes",  # changed: compaction drops spent delete ids
    "mv_manifest_snapshot_read",  # changed: commit backend + checkpoint pointer
    "stream_manifest_exactly_once",  # changed: empty-micro-batch commit guard
    "mv_manifest_zone_skip",  # changed: date/timestamp granularity normalization
    "mv_manifest_rollback",  # changed: latest_version checkpoint fast path
    "sketch_cms_point_queries",  # changed: cms_lookup left-join absent items
    "sketch_cms_merge_partials",  # changed: cms_lookup left-join absent items
    "sketch_cms_signed_cdc",  # changed: cms_lookup left-join absent items
    # (b) the 40 r04-stale queries, r04 insertion order (every one
    #     green in the r09 judge's full driver_sim re-run):
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
