"""Emit PLANS.md: for each headline query, the scale-relevant plan facts
(pushed filters, read schemas, join strategies, exchange count, Python
nodes). Run after plan-affecting changes:

    python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

AUDITED = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q9_product_profit", "q10_returned_items",
    "q18_large_orders", "point_lookup", "key_range_scan", "topk_orders",
    "agg_having", "count_distinct", "window_row_number",
    "events_sessionize", "events_asof_join", "events_range_join",
    "doc_minhash_pairs", "doc_dedup_exact_text", "doc_lang_id",
    "embedding_knn_brute", "multimodal_decode",
    "doc_corpus_mix", "doc_pack_sequences", "doc_term_frequencies",
    "doc_corpus_pipeline", "skew_salted_distinct",
    "doc_decontaminate", "embedding_quantize", "embedding_quantized_knn",
    "set_except_all", "window_range_frame",
    "doc_top_tfidf_term", "doc_global_shuffle", "lateral_topn_per_nation",
    "customer_index_range", "orders_zorder_lookup",
    "events_funnel", "events_cohort_retention", "events_asof_forward",
    "doc_dedup_keep_best", "orders_bucketed_join",
    # round-4 additions
    "lineitem_skew_join", "doc_ngram_jaccard", "doc_quality_filter",
    "doc_simhash_groups", "embedding_near_dup_exact", "embedding_near_dup",
    "doc_lm_score", "multimodal_ppm_decode", "multimodal_mulaw_decode",
    # round-5 additions
    "doc_simhash_hamming",
    # round-6 additions (streaming queries are excluded: their plans
    # are streaming executions, not auditable batch explains)
    "doc_duplicate_spans", "doc_weighted_sample", "doc_source_cap",
    "doc_substring_dedup", "doc_span_corruption", "events_session_overlap",
    "doc_length_histogram", "multimodal_qoi_decode",
    "doc_tokenize_ids", "lineitem_bloom_filter_join",
    "orders_partition_pruned_join",
    "events_kmv_users", "doc_bm25_ranking", "doc_bm25_indexed",
    "events_rolling_dau", "events_asof_nearest", "events_variant_extract",
    "doc_winnowing_pairs", "events_value_outliers",
    # round-7 additions
    "embedding_ann_ivf_partial", "embedding_ann_ivf_stored",
    "doc_dsir_topk", "pivot_returnflag_status", "unpivot_order_measures",
    "doc_bpe_pair_stats", "lineitem_quantile_disc",
    "embedding_covariance", "nation_trade_pagerank",
    "events_decayed_engagement", "cube_status_priority",
    "embedding_anomaly_topk", "doc_quality_quantiles",
    # late round-7
    "doc_training_manifest", "doc_line_dedup", "doc_gopher_rules",
    "doc_temperature_mix", "events_markov_transitions",
    "part_affinity_lift", "events_rfm_scores",
    "part_abc_classification", "events_value_gini", "doc_vocab_growth",
    "doc_ccnet_buckets", "events_value_mad", "orders_lead_time_stats",
    "doc_fim_transform", "lineitem_return_rate_ci",
    "doc_source_divergence", "doc_unimax_budget",
    "events_cusum_changepoint", "doc_ngram_containment",
    "doc_zipf_slope", "events_value_percentile_sketch",
    "embedding_label_balance", "orders_open_backlog",
    "doc_dup_cluster_spectrum", "orders_priority_chi2",
    "doc_bloom_prefilter", "embedding_matryoshka_fidelity",
    "supplier_concentration_hhi", "events_dow_adjusted_outliers",
    "part_fuzzy_name_pairs", "part_skyline", "events_cms_heavy_hitters",
    "events_time_weighted_value",
    "supplier_triangle_count", "part_entity_resolution",
    "events_stratified_sample", "doc_quality_lr_score",
    "orders_benford_digits",
    "events_value_trend", "doc_bigram_lift", "doc_source_token_jaccard",
    "doc_rank_fusion", "doc_readability", "events_linear_attribution",
    "doc_length_emd", "doc_ngram_novelty",
    "events_seasonal_naive_mae", "supplier_shared_part_similarity",
    "events_burstiness", "doc_split_join_pairs",
    "multimodal_png_decode", "embedding_dbscan_2d",
    "embedding_fisher_scores", "embedding_knn_confusion",
    "customer_k_anonymity", "lineitem_weighted_median",
    "doc_distinctive_terms", "multimodal_gif_decode",
    "nation_trade_reciprocity", "events_type_overlap",
    # round-8 additions
    "lineitem_percentile_cont", "lineitem_equidepth_hist",
    "embedding_random_projection", "events_ewma_anomaly",
    "doc_kn_bigram_lm", "events_theil_sen_trend", "orders_qualify_topn",
    "orders_stats_broadcast_join", "doc_kn_trigram_lm", "events_asof_sql",
    "doc_kn_score_rank",
    # round-9 additions
    "orders_stats_sql_join", "events_asof_sql_tolerance",
    "embedding_kmeans_step", "orders_explain_chain",
    "orders_routed_sql_lookup", "orders_layout_advisor",
    # round-10 additions
    "orders_routed_sql_or", "embedding_ann_sql_routed",
    "orders_join_reorder", "catalog_multiwriter_appends",
    # round-11 additions
    "embedding_ann_sql_filtered", "embedding_ann_clustered_default",
    "embedding_ann_sql_scored", "customer_indexed_residual_sql",
    "lineitem_routed_agg_sql", "embedding_ann_lateral_sql",
    # round-12 additions
    "lineitem_star_join_pruned_sql", "orders_range_metadata_count",
    "embedding_ann_lateral_filtered",
]


# Queries whose plans INTENTIONALLY carry an Arrow/pandas stage: dense
# vector math (block-pair GEMM, LSH candidate verification) and media
# decode, where numpy/binary work beats expression trees by 10-50x.
ARROW_PATH = {"multimodal_decode", "multimodal_wav_decode",
              "multimodal_ppm_decode", "multimodal_mulaw_decode",
              "multimodal_qoi_decode",
              "embedding_near_dup_exact", "embedding_near_dup",
              # per-partition numpy X^T X panels (the big-n/small-d
              # reduction) — deliberately Arrow-batched
              "embedding_covariance",
              # real PNG inflate+unfilter / GIF LZW run in the batch
              "multimodal_png_decode", "multimodal_gif_decode",
              # two-phase Arrow mapInPandas divide-and-conquer with a
              # worst-case guard (operators/frontier.py) — round-12
              # label fix: the operator was always a deliberate Arrow
              # path, only this annotation set had missed it
              "part_skyline"}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from heracles_spark.session import get_session
    from heracles_spark.queries import all_queries
    from heracles_spark.plans import (executed_plan_string, pushed_filters,
                                      read_schema_columns)

    spark = get_session("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    lines = ["# PLANS — physical-plan audit of headline queries",
             "",
             f"Generated by tools/audit_plans.py over {sf_dir}. "
             "Facts the 100 TB argument rests on (see SCALE.md).",
             ""]
    for name in AUDITED:
        df = qs[name](spark, sf_dir)
        simple = executed_plan_string(df, "simple")
        pf = pushed_filters(df)
        cols = read_schema_columns(df)
        joins = sorted(set(re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)", simple)))
        nexch = len(re.findall(r"Exchange (?:hash|range)partitioning", simple))
        python = bool(re.search(r"(BatchEvalPython|ArrowEvalPython|"
                                r"MapInPandas|FlatMapGroupsInPandas)", simple))
        lines.append(f"## {name}")
        lines.append(f"- joins: {', '.join(joins) if joins else 'none'}"
                     f" | shuffle exchanges (pre-AQE): {nexch}"
                     f" | python nodes: "
                     f"{'YES (deliberate Arrow path)' if python and name in ARROW_PATH else 'YES' if python else 'no'}")
        if pf:
            lines.append(f"- pushed filters: {len(pf)} "
                         f"(e.g. {'; '.join(pf[:3])})")
        if cols:
            widths = ", ".join(str(len(c)) for c in cols)
            lines.append(f"- scan column counts: {widths}")
        lines.append("")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(lines))
    print(f"PLANS.md written ({len(AUDITED)} queries)")


if __name__ == "__main__":
    main()
