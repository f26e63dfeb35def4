"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one (spark, sf_dir) -> DataFrame per implemented
operator from SURVEY.md §2.
``oracle_sql()`` — matching ANSI SQL for DuckDB (same column names;
double aggregates rounded to 4 decimals on both sides; collected
arrays sorted on both sides).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_ext_spark.plans import evaluation_queries as eq
from spark_ext_spark.plans import feature_queries as fq
from spark_ext_spark.plans import gather_queries as gq
from spark_ext_spark.plans import llm_queries as lq
from spark_ext_spark.plans import ml_queries as mq
from spark_ext_spark.plans import relational as rel
from spark_ext_spark.plans import tpch

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Gather (long→wide reshape into array<struct>) on events."""
    return gq.gather_user_events(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Ordered so that EVERY operator family has ≥1 entry inside the
    driver's 50-query correctness window; always-green redundant OLAP
    variants sit past position 50 (they still run in the bench).

    Oracle output-type contract: every oracle_sql() result column must
    be BIGINT/DOUBLE/VARCHAR/BOOLEAN/DATE/TIMESTAMP (or lists/structs
    of those). Never HUGEINT or DECIMAL — DuckDB types a bare integer
    ``sum()`` as HUGEINT, which the driver's Arrow fetch turns into
    float64 (``7949.0`` vs Spark's int64 ``7949``) and the hash
    compare fails on equal values. Wrap integer aggregates in
    ``CAST(... AS BIGINT)``; enforced by tests/test_oracle_types.py."""
    return {
        # --- Round-13 window (entries 1-50 = driver hash-checked) ---
        # Rotation policy (from r10 on): re-check whatever has gone
        # longest without driver contact. History: r9 = completion
        # (cumulative 135/135), r10 = first freshness rotation,
        # r11 = 7 r7 + 29 r8 + 14 r9 core re-checks, r12 = the 35
        # remaining r9 rows + 15 r10 core re-checks (48 hash-green +
        # 2 rows-only, zero surprises).
        #
        # r13 = exactly the set pinned in round 12: the 35 remaining
        # rows whose last contact was the r10 window, plus 15 r11 core
        # re-checks to fill 50 (heavy/flagship rows incl. the
        # rows-only rotation sketch_user_rollup). After this window no
        # query's last driver contact is older than r11.
        #
        # ROUND-14 WINDOW (pinned now, same policy): the 35 remaining
        # rows whose last contact was the r11 window (text_stats,
        # source_capped_corpus, doc_sample_k, train_test_split,
        # embedding_quantize, media_sniff_formats, asof_join_orders,
        # range_join_windows, salted_user_totals, top_event_per_user,
        # props_variant_extract, zorder_events, ngram_containment,
        # repeated_ngrams, benchmark_contamination,
        # lineitem_expectations, hourly_zscores, dedup_reduction_report,
        # sql_grouping_sets, props_json_extract,
        # tpch_q21_waiting_suppliers, tpch_q2_min_cost_supplier,
        # tpch_q5_local_supplier, tpch_q7_volume_shipping,
        # tpch_q8_market_share, tpch_q13_order_histogram,
        # tpch_q17_small_qty, tpch_q18_large_orders,
        # tpch_q20_promo_suppliers, hourly_interpolate,
        # value_robust_stats, mixture_report, language_mix_report,
        # doc_gopher_rules, daily_active_users), plus these 15 r12 core
        # re-checks to fill 50 (heavy/flagship rows incl. BOTH
        # rows-only rotations local_lr_model/approx_user_stats):
        # pricing_summary, ngram_jaccard, cosine_topk, token_counts,
        # theta_user_rollup, local_lr_model, approx_user_stats,
        # roc_curve, embedding_near_dups, language_id,
        # cheapest_order_per_customer, tpch_q14_promo,
        # tpch_q10_returned_items, gather_flat, price_percentiles.
        # After that window no query's last contact is older than r12.
        # --- 1-35: last contact r10 ----------------------------------
        "global_agg": rel.global_agg,
        "topk_users": rel.top_users_by_value,
        "distinct_pairs": rel.distinct_user_event_pairs,
        "union_all_counts": rel.union_all_keys,
        "left_join_order_counts": rel.left_join_order_counts,
        "semi_join_urgent": rel.semi_join_active_customers,
        "anti_join_no_orders": rel.anti_join_inactive_customers,
        "hourly_rollup": rel.hourly_rollup,
        "shipping_priority": rel.shipping_priority,
        "intersect_buyers": rel.intersect_high_value_buyers,
        "except_non_urgent": rel.except_low_priority_only,
        "fingerprints": lq.doc_fingerprints,
        "media_byte_stats": lq.media_byte_stats,
        "collect_array_distinct": rel.user_distinct_event_types,
        "gather_encoder_distfit": fq.gather_encoder_distfit,
        "doc_chunks": lq.doc_chunks,
        "doc_lm_scores": lq.doc_lm_scores,
        "f_measure": eq.f_measure_by_threshold,
        "lift_curve": eq.lift_curve,
        "recall_by_threshold": eq.recall_by_threshold,
        "gather_encoder_top_allother": fq.gather_encoder_top_allother,
        "gather_encoder_index": fq.gather_encoder_index,
        "downsampling_hash": fq.downsampling_hash,
        "gains_curve": eq.gains_curve,
        "precision_by_threshold": eq.precision_by_threshold,
        "simhash_pairs": lq.simhash_pairs,
        "winnow_pairs": lq.winnow_pairs,
        "tfidf_top_terms": lq.tfidf_top_terms,
        "doc_quality": lq.doc_quality,
        "gather_encoder_top": fq.gather_encoder_top,
        "binning": fq.binning_quantity,
        "roc_curve_binned": eq.roc_curve_binned,
        "s2_cells": mq.s2_cells,
        "string_indexer": fq.string_indexer,
        "exact_dedup": lq.exact_dedup,
        # --- 36-50: 15 r11 core re-checks ------------------------------
        "collect_array": rel.user_event_types,
        "gather": gq.gather_user_events,
        "auc_metrics": eq.auc_metrics,
        "lr_newton_steps": mq.lr_newton_steps,
        "minhash_lsh": lq.minhash_lsh,
        "dup_clusters": lq.dup_clusters,
        "semantic_clusters": lq.semantic_clusters,
        "ann_lsh_topk": lq.ann_lsh_topk,
        "ann_ivf_topk": lq.ann_ivf_topk,
        "asof_join_orders_chunked": lq.asof_join_orders_chunked,
        "table_profile": rel.table_profile,
        "kmv_user_stats": rel.kmv_user_stats,
        "sketch_user_rollup": rel.sketch_user_rollup,  # rows-only (in-window this round)
        "media_pipeline": lq.media_pipeline,
        "tpch_q9_product_profit": tpch.product_type_profit,
        # --- 51+: bench/local-sweep coverage only (all green via
        # tests/test_oracle_parity.py at sf0.001 and prior rounds'
        # driver windows). tpch_q9_product_profit above is entry #50,
        # the last driver-checked position — count before moving this
        # boundary; test_driver_window_composition pins the exact set.
        "language_id": lq.doc_language_id,
        "sequence_packing": lq.sequence_packing,
        "embedding_near_dups": lq.embedding_near_dup_pairs,
        "pricing_summary": rel.pricing_summary,
        "tpch_q6_forecast": tpch.forecast_revenue_change,
        "moving_avg_7d": rel.moving_avg_7d,
        "event_sessions": rel.event_sessions,
        "hourly_gapfill": rel.hourly_gapfill,
        "source_temperature_mix": lq.source_temperature_mix,
        "pii_redaction": lq.pii_redaction,
        "embedding_norms": lq.embedding_norms,
        "score_thresholds": eq.score_thresholds,
        "doc_repetition": lq.doc_repetition,
        "top_orders_per_customer": rel.top_orders_per_customer,
        "user_value_deltas": rel.user_value_deltas,
        "acctbal_deciles": rel.acctbal_deciles,
        "above_class_avg": rel.above_class_average_orders,
        "tpch_q4_late_priority": tpch.late_order_priority,
        "tpch_q10_returned_items": tpch.returned_item_customers,
        "tpch_q11_important_parts": tpch.important_parts,
        "tpch_q12_priority_counts": tpch.linestatus_priority_counts,
        "tpch_q14_promo": tpch.promo_revenue_share,
        "tpch_q15_top_supplier": tpch.top_supplier,
        "tpch_q16_parts_suppliers": tpch.parts_supplier_counts,
        "tpch_q19_discounted": tpch.discounted_revenue,
        "tpch_q22_idle_rich": tpch.idle_rich_customers,
        "cheapest_order_per_customer": rel.cheapest_order_per_customer,
        "doc_sentences": rel.doc_sentences,
        "stratified_sample_events": rel.stratified_sample_events,
        "value_statistics": rel.value_statistics,
        "corpus_dedup_stats": lq.corpus_dedup_stats,
        "length_batches": lq.length_batches,
        "lineitem_measure_stats": rel.lineitem_measure_stats,
        "hilbert_event_keys": rel.hilbert_event_keys,
        "quality_top_fraction": lq.quality_top_fraction,
        "join_revenue_by_nation": rel.revenue_by_nation,
        "window_cumsum": rel.cumulative_user_value,
        "rollup_revenue": rel.rollup_order_revenue,
        "cube_order_stats": rel.cube_order_stats,
        "price_percentiles": rel.price_percentiles,
        "priority_pivot": rel.priority_pivot,
        "gather_flat": gq.gather_user_events_flat,
        "gather_count": gq.gather_user_event_counts,
        "token_counts": lq.token_counts,
        "local_lr_model": mq.local_lr_model,  # rows-only
        "approx_user_stats": rel.approx_user_stats,  # rows-only
        "roc_curve": eq.roc_curve,
        "ngram_jaccard": lq.ngram_jaccard,
        "theta_user_rollup": rel.theta_user_rollup,
        "cosine_topk": lq.cosine_topk_bruteforce,
        "text_stats": lq.doc_text_stats,
        "source_capped_corpus": lq.source_capped_corpus,
        "doc_sample_k": lq.doc_sample_k,
        "train_test_split": lq.train_test_split,
        "embedding_quantize": lq.embedding_quantize,
        "media_sniff_formats": lq.media_sniff_formats,
        "asof_join_orders": lq.asof_join_orders,
        "range_join_windows": rel.events_in_order_windows,
        "salted_user_totals": rel.salted_user_totals,
        "top_event_per_user": rel.top_event_per_user,
        "props_variant_extract": rel.props_variant_extract,
        "zorder_events": rel.zorder_event_keys,
        "ngram_containment": lq.ngram_containment,
        "repeated_ngrams": lq.repeated_ngrams,
        "benchmark_contamination": lq.benchmark_contamination,
        "lineitem_expectations": rel.lineitem_expectations,
        "hourly_zscores": rel.hourly_zscores,
        "dedup_reduction_report": lq.dedup_reduction_report,
        "sql_grouping_sets": rel.sql_grouping_sets,
        "props_json_extract": rel.props_json_extract,
        "tpch_q21_waiting_suppliers": tpch.waiting_suppliers,
        "tpch_q2_min_cost_supplier": tpch.min_cost_supplier,
        "tpch_q5_local_supplier": tpch.local_supplier_volume,
        "tpch_q7_volume_shipping": tpch.volume_shipping,
        "tpch_q8_market_share": tpch.market_share,
        "tpch_q13_order_histogram": tpch.customer_order_histogram,
        "tpch_q17_small_qty": tpch.small_quantity_revenue,
        "tpch_q18_large_orders": tpch.large_volume_orders,
        "tpch_q20_promo_suppliers": tpch.promotion_suppliers,
        "hourly_interpolate": rel.hourly_interpolate,
        "value_robust_stats": rel.value_robust_stats,
        "mixture_report": lq.mixture_report,
        "language_mix_report": lq.language_mix_report,
        "doc_gopher_rules": lq.doc_gopher_rules,
        "daily_active_users": rel.daily_active_users,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "collect_array": rel.USER_EVENT_TYPES_SQL,
        "collect_array_distinct": rel.USER_DISTINCT_EVENT_TYPES_SQL,
        "gather": gq.GATHER_USER_EVENTS_SQL,
        "gather_flat": gq.GATHER_USER_EVENTS_FLAT_SQL,
        "gather_count": gq.GATHER_USER_EVENT_COUNTS_SQL,
        "gather_encoder_top": fq.GATHER_ENCODER_TOP_SQL,
        "gather_encoder_top_allother": fq.GATHER_ENCODER_TOP_ALLOTHER_SQL,
        "gather_encoder_index": fq.GATHER_ENCODER_INDEX_SQL,
        "gather_encoder_distfit": fq.GATHER_ENCODER_TOP_SQL,
        "string_indexer": fq.STRING_INDEXER_SQL,
        "downsampling_hash": fq.DOWNSAMPLING_HASH_SQL,
        "binning": fq.BINNING_QUANTITY_SQL,
        "gains_curve": eq.GAINS_CURVE_SQL,
        "roc_curve": eq.ROC_CURVE_SQL,
        "roc_curve_binned": eq.ROC_CURVE_BINNED_SQL,
        "lift_curve": eq.LIFT_CURVE_SQL,
        "auc_metrics": eq.AUC_METRICS_SQL,
        "precision_by_threshold": eq.PRECISION_BY_THRESHOLD_SQL,
        "recall_by_threshold": eq.RECALL_BY_THRESHOLD_SQL,
        "f_measure": eq.F_MEASURE_BY_THRESHOLD_SQL,
        "score_thresholds": eq.SCORE_THRESHOLDS_SQL,
        "exact_dedup": lq.EXACT_DEDUP_SQL,
        "ngram_jaccard": lq.NGRAM_JACCARD_SQL,
        "minhash_lsh": lq.MINHASH_LSH_SQL,
        "simhash_pairs": lq.SIMHASH_PAIRS_SQL,
        "text_stats": lq.DOC_TEXT_STATS_SQL,
        "fingerprints": lq.DOC_FINGERPRINTS_SQL,
        "language_id": lq.DOC_LANGUAGE_ID_SQL,
        "cosine_topk": lq.COSINE_TOPK_SQL,
        "ann_lsh_topk": lq.ANN_LSH_TOPK_SQL,
        "ann_ivf_topk": lq.ANN_IVF_TOPK_SQL,
        "s2_cells": mq.S2_CELLS_SQL,
        "embedding_near_dups": lq.EMBEDDING_NEAR_DUPS_SQL,
        "token_counts": lq.TOKEN_COUNTS_SQL,
        "source_capped_corpus": lq.SOURCE_CAPPED_CORPUS_SQL,
        "doc_sample_k": lq.DOC_SAMPLE_K_SQL,
        "source_temperature_mix": lq.SOURCE_TEMPERATURE_MIX_SQL,
        "embedding_quantize": lq.EMBEDDING_QUANTIZE_SQL,
        "zorder_events": rel.ZORDER_EVENT_KEYS_SQL,
        "train_test_split": lq.TRAIN_TEST_SPLIT_SQL,
        "sequence_packing": lq.SEQUENCE_PACKING_SQL,
        "asof_join_orders": lq.ASOF_JOIN_ORDERS_SQL,
        # the two strategies are output-identical by contract — the
        # chunked scale path answers to the SAME oracle text verbatim
        "asof_join_orders_chunked": lq.ASOF_JOIN_ORDERS_SQL,
        "media_byte_stats": lq.MEDIA_BYTE_STATS_SQL,
        "media_sniff_formats": lq.MEDIA_SNIFF_FORMATS_SQL,
        "media_pipeline": lq.MEDIA_PIPELINE_SQL,
        "pricing_summary": rel.PRICING_SUMMARY_SQL,
        "global_agg": rel.GLOBAL_AGG_SQL,
        "join_revenue_by_nation": rel.REVENUE_BY_NATION_SQL,
        "topk_users": rel.TOP_USERS_BY_VALUE_SQL,
        "window_cumsum": rel.CUMULATIVE_USER_VALUE_SQL,
        "distinct_pairs": rel.DISTINCT_USER_EVENT_PAIRS_SQL,
        "union_all_counts": rel.UNION_ALL_KEYS_SQL,
        "left_join_order_counts": rel.LEFT_JOIN_ORDER_COUNTS_SQL,
        "semi_join_urgent": rel.SEMI_JOIN_ACTIVE_CUSTOMERS_SQL,
        "anti_join_no_orders": rel.ANTI_JOIN_INACTIVE_CUSTOMERS_SQL,
        "rollup_revenue": rel.ROLLUP_ORDER_REVENUE_SQL,
        "cube_order_stats": rel.CUBE_ORDER_STATS_SQL,
        "price_percentiles": rel.PRICE_PERCENTILES_SQL,
        "hourly_rollup": rel.HOURLY_ROLLUP_SQL,
        "hourly_gapfill": rel.HOURLY_GAPFILL_SQL,
        "hourly_interpolate": rel.HOURLY_INTERPOLATE_SQL,
        "hourly_zscores": rel.HOURLY_ZSCORES_SQL,
        "shipping_priority": rel.SHIPPING_PRIORITY_SQL,
        "range_join_windows": rel.EVENTS_IN_ORDER_WINDOWS_SQL,
        "intersect_buyers": rel.INTERSECT_HIGH_VALUE_BUYERS_SQL,
        "except_non_urgent": rel.EXCEPT_LOW_PRIORITY_ONLY_SQL,
        "priority_pivot": rel.PRIORITY_PIVOT_SQL,
        "top_orders_per_customer": rel.TOP_ORDERS_PER_CUSTOMER_SQL,
        "user_value_deltas": rel.USER_VALUE_DELTAS_SQL,
        "acctbal_deciles": rel.ACCTBAL_DECILES_SQL,
        "above_class_avg": rel.ABOVE_CLASS_AVERAGE_ORDERS_SQL,
        "salted_user_totals": rel.SALTED_USER_TOTALS_SQL,
        "tpch_q5_local_supplier": tpch.LOCAL_SUPPLIER_VOLUME_SQL,
        "tpch_q6_forecast": tpch.FORECAST_REVENUE_CHANGE_SQL,
        "tpch_q14_promo": tpch.PROMO_REVENUE_SHARE_SQL,
        "tpch_q18_large_orders": tpch.LARGE_VOLUME_ORDERS_SQL,
        "tpch_q13_order_histogram": tpch.CUSTOMER_ORDER_HISTOGRAM_SQL,
        "tpch_q22_idle_rich": tpch.IDLE_RICH_CUSTOMERS_SQL,
        "tpch_q4_late_priority": tpch.LATE_ORDER_PRIORITY_SQL,
        "tpch_q7_volume_shipping": tpch.VOLUME_SHIPPING_SQL,
        "tpch_q8_market_share": tpch.MARKET_SHARE_SQL,
        "tpch_q9_product_profit": tpch.PRODUCT_TYPE_PROFIT_SQL,
        "tpch_q10_returned_items": tpch.RETURNED_ITEM_CUSTOMERS_SQL,
        "tpch_q12_priority_counts": tpch.LINESTATUS_PRIORITY_COUNTS_SQL,
        "tpch_q15_top_supplier": tpch.TOP_SUPPLIER_SQL,
        "tpch_q17_small_qty": tpch.SMALL_QUANTITY_REVENUE_SQL,
        "tpch_q19_discounted": tpch.DISCOUNTED_REVENUE_SQL,
        "tpch_q20_promo_suppliers": tpch.PROMOTION_SUPPLIERS_SQL,
        "tpch_q21_waiting_suppliers": tpch.WAITING_SUPPLIERS_SQL,
        "tpch_q11_important_parts": tpch.IMPORTANT_PARTS_SQL,
        "tpch_q2_min_cost_supplier": tpch.MIN_COST_SUPPLIER_SQL,
        "tpch_q16_parts_suppliers": tpch.PARTS_SUPPLIER_COUNTS_SQL,
        "event_sessions": rel.EVENT_SESSIONS_SQL,
        "daily_active_users": rel.DAILY_ACTIVE_USERS_SQL,
        "cheapest_order_per_customer": rel.CHEAPEST_ORDER_PER_CUSTOMER_SQL,
        "dup_clusters": lq.DUP_CLUSTERS_SQL,
        "tfidf_top_terms": lq.TFIDF_TOP_TERMS_SQL,
        "props_json_extract": rel.PROPS_JSON_EXTRACT_SQL,
        "sql_grouping_sets": rel.SQL_GROUPING_SETS_SQL,
        "embedding_norms": lq.EMBEDDING_NORMS_SQL,
        "doc_sentences": rel.DOC_SENTENCES_SQL,
        "stratified_sample_events": rel.STRATIFIED_SAMPLE_EVENTS_SQL,
        "top_event_per_user": rel.TOP_EVENT_PER_USER_SQL,
        "props_variant_extract": rel.PROPS_VARIANT_EXTRACT_SQL,
        "lineitem_measure_stats": rel.LINEITEM_MEASURE_STATS_SQL,
        "doc_gopher_rules": lq.GOPHER_RULES_SQL,
        "lr_newton_steps": mq.LR_NEWTON_SQL,
        "hilbert_event_keys": rel.HILBERT_EVENT_KEYS_SQL,
        "quality_top_fraction": lq.QUALITY_TOP_FRACTION_SQL,
        "ngram_containment": lq.NGRAM_CONTAINMENT_SQL,
        "dedup_reduction_report": lq.DEDUP_REDUCTION_REPORT_SQL,
        "winnow_pairs": lq.WINNOW_PAIRS_SQL,
        "language_mix_report": lq.LANGUAGE_MIX_REPORT_SQL,
        "kmv_user_stats": rel.KMV_USER_STATS_SQL,
        "theta_user_rollup": rel.THETA_USER_ROLLUP_SQL,
        "doc_chunks": lq.DOC_CHUNKS_SQL,
        "pii_redaction": lq.PII_REDACTION_SQL,
        "doc_repetition": lq.DOC_REPETITION_SQL,
        "repeated_ngrams": lq.REPEATED_NGRAMS_SQL,
        "doc_quality": lq.DOC_QUALITY_SQL,
        "doc_lm_scores": lq.DOC_LM_SCORES_SQL,
        "benchmark_contamination": lq.BENCHMARK_CONTAMINATION_SQL,
        "moving_avg_7d": rel.MOVING_AVG_7D_SQL,
        "value_statistics": rel.VALUE_STATISTICS_SQL,
        "value_robust_stats": rel.VALUE_ROBUST_STATS_SQL,
        "corpus_dedup_stats": lq.CORPUS_DEDUP_STATS_SQL,
        "table_profile": rel.TABLE_PROFILE_SQL,
        "lineitem_expectations": rel.LINEITEM_EXPECTATIONS_SQL,
        "mixture_report": lq.MIXTURE_REPORT_SQL,
        "semantic_clusters": lq.SEMANTIC_CLUSTERS_SQL,
        "length_batches": lq.LENGTH_BATCHES_SQL,
    }
