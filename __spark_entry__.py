"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end semantic-search pipeline
(chunk -> hash-embed -> cosine top-k -> fetch-back) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the full catalog from
wagtail_vector_index_spark.queries — one entry per implemented operator
from SURVEY.md §2 plus the north-star EXT operators, each with a DuckDB
oracle computing identical values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from wagtail_vector_index_spark.queries import QUERY_FNS

    return QUERY_FNS["search_hash_knn"](spark, "/root/testdata/sf0.001")


# Driver-sample recency per catalog query (round of the most recent
# CORRECTNESS_r0N row, merged r1-r5). Catalog iteration orders
# least-recently-sampled first so the driver's 50-per-round sample
# keeps rotating through the full catalog instead of re-drawing the
# same keys; queries with no entry (newly added) go before everything.
# Pure ordering - no renames, no semantic change.
_DRIVER_LAST_SAMPLED = {
    # last sampled in round 2 (5 queries)
    "pipeline_dataset_mix": 7,
    "pipeline_decontaminate": 7,
    "pipeline_mix_epochs": 7,
    "pipeline_quality_filter": 7,
    "text_lang_id": 7,
    # last sampled in round 3 (37 queries)
    "ann_ivf_cosine": 8,
    "ann_ivfpq_adc": 8,
    "ann_lsh_cosine": 8,
    "ann_recall_ivf": 8,
    "ann_recall_lsh": 8,
    "ann_recall_pq": 8,
    "corpus_report": 7,
    "dedup_components": 7,
    "dedup_shared_passages": 7,
    "embedding_neardup_lsh": 8,
    "hybrid_search_rrf": 8,
    "multimodal_audio_fingerprint": 8,
    "multimodal_feature_embed": 8,
    "multimodal_feature_knn": 8,
    "multimodal_frame_sample": 8,
    "pipeline_chunk_explode": 7,
    "pipeline_corpus_prep": 7,
    "pipeline_export_shards": 7,
    "pipeline_incremental_staleness": 7,
    "pipeline_pack_sequences": 7,
    "pipeline_shuffle_rank": 7,
    "pipeline_train_val_split": 7,
    "q_array_functions": 8,
    "q_session_window": 8,
    "q_skew_salted_count": 7,
    "rag_batch_echo": 8,
    "search_tfidf_knn": 8,
    "sketch_distinct_kmv": 7,
    "streaming_click_view_join": 8,
    "streaming_events_hourly": 8,
    "text_bm25": 7,
    "text_gopher_rules": 7,
    "text_lang_id_ngram": 7,
    "text_repetition": 7,
    "text_top_ngram_frac": 7,
    "text_unigram_logprob": 7,
    "vector_centroids": 8,
    # last sampled in round 4 (50 queries)
    "ann_ivf_filtered": 4,
    "ann_recall_ivf_learned": 4,
    "dedup_semantic": 4,
    "graph_pagerank": 4,
    "knn_binary_hamming": 4,
    "knn_matryoshka_recall": 4,
    "knn_quantized_int8": 4,
    "pipeline_bpe_merges": 4,
    "pipeline_dsir_select": 4,
    "pipeline_incremental_neardup": 4,
    "pipeline_source_cap": 4,
    "q11_value_concentration": 8,
    "q12_priority_shipping": 4,
    "q13_custdist": 8,
    "q15_top_supplier": 8,
    "q16_part_supplier_diversity": 8,
    "q17_small_qty_revenue": 8,
    "q19_disjunctive_revenue": 8,
    "q1_pricing_summary": 8,
    "q20_dominant_suppliers": 8,
    "q21_waiting_suppliers": 8,
    "q22_idle_customers": 8,
    "q2_min_supplier": 8,
    "q3_shipping_priority": 8,
    "q4_order_priority": 8,
    "q5_region_revenue": 8,
    "q7_volume_shipping": 8,
    "q8_market_share": 8,
    "q9_nation_profit": 8,
    "q_anti_join": 8,
    "q_asof_join": 8,
    "q_asof_join_forward": 4,
    "q_cube_lineitem": 4,
    "q_events_user_gaps": 8,
    "q_funnel_conversion": 4,
    "q_range_join_bands": 4,
    "q_retention_cohorts": 4,
    "q_rolling_revenue": 8,
    "q_rollup_acctbal": 4,
    "q_semi_join": 8,
    "q_set_except": 8,
    "q_set_intersect": 8,
    "q_top_customers": 8,
    "q_value_histogram": 4,
    "q_window_top_orders": 8,
    "search_mmr_rerank": 4,
    "sketch_countmin_tokens": 4,
    "sketch_kmv_set_ops": 4,
    "text_quality_classifier": 4,
    "text_zipf_slope": 4,
    # last sampled in round 5 (50 queries)
    "dedup_apply": 5,
    "dedup_exact": 5,
    "dedup_jaccard_exact": 5,
    "dedup_jaccard_prefix": 5,
    "dedup_keep_best": 5,
    "dedup_minhash_lsh": 5,
    "dedup_simhash": 5,
    "doc_fingerprint": 5,
    "embedding_neardup": 5,
    "find_similar_hash": 5,
    "graph_pagerank_dangling": 5,
    "knn_cosine": 5,
    "knn_jl_recall": 5,
    "knn_l2": 5,
    "knn_mip": 5,
    "knn_threshold": 5,
    "multimodal_decode_meta": 5,
    "pipeline_weighted_sample": 5,
    "q10_returned_items": 5,
    "q14_promo_share": 5,
    "q6_forecast_revenue": 5,
    "q_above_global_avg": 5,
    "q_above_nation_avg": 5,
    "q_big_orders": 5,
    "q_case_agg": 5,
    "q_distinct_agg": 5,
    "q_events_anomaly": 5,
    "q_events_hourly": 5,
    "q_events_json": 5,
    "q_having": 5,
    "q_median_price": 5,
    "q_monthly_orders": 5,
    "q_outer_join_counts": 5,
    "q_pivot_flags": 5,
    "q_scalar_functions": 5,
    "q_sessionize": 5,
    "q_ship_delay": 5,
    "q_stats_agg": 5,
    "q_union_all": 5,
    "q_window_analytics": 5,
    "search_hash_knn": 5,
    "similarity_join_topk": 5,
    "sketch_quantiles_price": 5,
    "streaming_neardup_corpus": 5,
    "streaming_stateful_dedup": 5,
    "text_quality": 5,
    "text_token_count": 5,
    "text_wordcount": 5,
    "vector_pca_power": 5,
    "vector_pca_top2": 5,
    # last sampled in round 6 (50 queries)
    "dedup_containment": 6,
    "dedup_lsh_recall": 6,
    "dedup_source_overlap": 6,
    "dedup_substring_coverage": 6,
    "er_blocked_pairs": 6,
    "er_entity_clusters": 6,
    "graph_bfs_reach": 6,
    "graph_communities": 6,
    "graph_hits": 6,
    "graph_kcore": 6,
    "graph_pagerank_seeded": 6,
    "graph_triangles": 6,
    "pipeline_bpe_encode": 6,
    "pipeline_dense_ids": 6,
    "pipeline_perplexity_buckets": 6,
    "pipeline_quality_calibrate": 6,
    "q18_large_volume_customer": 6,
    "q_anomaly_mad": 6,
    "q_attribution_last_touch": 6,
    "q_attribution_linear": 6,
    "q_bloom_semi_join": 6,
    "q_column_entropy": 6,
    "q_concurrent_peak": 6,
    "q_daily_trend": 6,
    "q_dau_mau": 6,
    "q_drift_ks": 7,
    "q_event_paths": 6,
    "q_ewma_daily": 6,
    "q_funnel_time_bounded": 6,
    "q_grouping_sets": 6,
    "q_market_basket": 6,
    "q_new_vs_returning": 6,
    "q_pareto_frontier": 6,
    "q_quality_expectations": 7,
    "q_snapshot_diff": 6,
    "q_user_value_deciles": 6,
    "q_yoy_growth": 6,
    "search_phrase_positions": 6,
    "search_posting_lists": 6,
    "sketch_f2_selfjoin": 6,
    "sketch_heavy_hitters": 6,
    "sketch_heavy_hitters_grouped": 6,
    "sketch_hll_distinct": 6,
    "sketch_join_size": 6,
    "sketch_kmv_sliding": 6,
    "sketch_overlap_matrix": 6,
    "sketch_quantiles_by_type": 6,
    "text_collocations_pmi": 6,
    "text_keywords_tfidf": 6,
    "text_ngram_novelty": 6,
    # last sampled in round 7 (25 new keys; existing keys above bumped to 7)
    "ann_mrr": 7,
    "ann_posting_stats": 7,
    "dedup_lsh_precision": 7,
    "embedding_outliers": 7,
    "er_match_scores": 7,
    "knn_hard_negatives": 7,
    "knn_mutual_graph": 7,
    "pipeline_contamination_report": 7,
    "pipeline_line_dedup": 7,
    "pipeline_mix_temperature": 7,
    "pipeline_token_budget": 7,
    "q_drift_psi": 7,
    "q_key_skew_gini": 7,
    "q_profile_columns": 7,
    "q_trend_regression": 7,
    "q_watermark_lateness": 7,
    "streaming_drift_daily": 7,
    "streaming_sliding_topk": 7,
    "text_readability": 7,
    "text_tokenizer_fertility": 7,
    "vector_centroid_drift": 7,
    "vector_dbscan": 7,
    "vector_meanpool_docs": 7,
    "vector_silhouette": 7,
    "vector_standardize": 7,
    # last sampled in round 8 (5 new r8 keys; existing keys above bumped to 8)
    "ann_nprobe_sweep": 8,
    "pipeline_dup_aware_weights": 8,
    "pipeline_ngram_collision": 8,
    "pipeline_split_leakage": 8,
    "pipeline_truncation_stats": 8,
}



def _ordered(mapping: dict) -> dict:
    """Iteration order = driver sampling priority: never-sampled
    entries first, then ascending round of most recent driver
    correctness row (r1-sampled before r4-sampled). Pure ordering —
    no renames."""
    return dict(
        sorted(
            mapping.items(),
            key=lambda kv: _DRIVER_LAST_SAMPLED.get(kv[0], 0),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from wagtail_vector_index_spark.queries import QUERY_FNS

    return _ordered(dict(QUERY_FNS))


def oracle_sql() -> dict[str, str]:
    from wagtail_vector_index_spark.queries import ORACLE

    return _ordered(dict(ORACLE))
