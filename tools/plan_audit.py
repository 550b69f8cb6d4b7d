"""Physical-plan audit: prints one row per headline registry query with
the markers that matter at 100 TB — shuffle count, top-k operator,
pushed/partition filters, join strategies, Python boundaries — and writes
the table to PLANS.md.

Run: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from javascript_vector_database_spark import get_spark, registry  # noqa: E402

#: queries whose executed plan we audit (materializing side effects like
#: the reactive/dml roundtrips are skipped — their value is semantics,
#: not a single static plan)
AUDITED = [
    "knn_exact",
    "knn_batch_exact",
    "knn_ann_range",
    "knn_ann_similarity",
    "flagship_search",
    "knn_cosine",
    "ann_ivf_search",
    "ann_ivf_search_partitioned",
    "ann_ivf_batch_search",
    "ann_lsh_search",
    "ann_lsh_search_precomputed",
    "dedup_exact_groups",
    "dedup_minhash_signatures",
    "dedup_lsh_pairs",
    "dedup_simhash",
    "dedup_cosine_pairs",
    "events_sessionize",
    "events_asof_join",
    "events_range_join",
    "events_rollup_multires",
    "events_session_window_agg",
    "join_salted_skew",
    "sketch_kmv_distinct_users",
    "state_fold_last_per_user",
    "changefeed_page",
    "curation_pipeline",
    "curation_chunk_documents",
    "curation_split_assign",
    "text_bm25_search",
    "dedup_batch_vs_corpus",
    "ann_sq8_codes",
    "ann_sq8_search",
    "ann_sq8_search_precomputed",
    "ann_pq_codes",
    "ann_pq_search",
    "ann_pq_search_precomputed",
    "ann_ivfpq_search",
    "ann_ivfpq_search_partitioned",
    "curation_pii_scrub",
    "curation_repetition_stats",
    "curation_contamination",
    "curation_mixture_sample",
    "curation_pack_sequences",
    "curation_chunk_dedup",
    "dedup_duplicate_clusters_star",
    "profile_cube_source_lang",
    "profile_pivot_lang_counts",
    "text_bm25_batch_search",
    "curation_split_stratified",
    "curation_normalize_dedup",
    "profile_top_tokens",
    "multimodal_byte_stats",
    "mango_range",
    "agg_pricing_summary",
    "window_top_customers_per_nation",
    "knn_exact_384",
    "knn_ann_similarity_384",
    "knn_ann_range_compat_384",
    "compat_index_string_384",
    "sketch_hll_distinct_users",
    "sketch_hll_users_by_type",
    "join_bucketed_colocated",
    "curation_lm_quality",
    "ann_ivf_384",
    "text_winnow_fingerprints",
    "text_winnow_overlap_pairs",
    "events_funnel_counts",
    "events_retention_cohorts",
    "events_hopping_window_agg",
    "agg_regional_revenue",
    "text_keywords",
    "agg_q17_small_quantity_revenue",
    "agg_q18_large_orders",
    "profile_unpivot_lang_stats",
    "curation_domain_cap",
    "events_scd2_state_intervals",
    "events_gapfill_hourly",
    "sketch_cms_token_freq",
    "curation_contamination_bloom",
    "graph_pagerank_copurchase",
    "sketch_histogram_quantiles",
    "dedup_jaccard_prefix",
    "text_bpe_pair_counts",
    "curation_remove_boilerplate",
    "text_phrase_search",
    "events_hourly_trend",
    "events_corr_pairs",
    "events_dwell_stats",
    "profile_ntile_deciles",
    "orders_price_outliers",
    "division_suppliers_full_brand",
    "text_phrase_postings_join",
    "events_funnel_latency",
    "events_asof_join_forward",
    "orders_winsorized_mean",
    "curation_luhn_cc_detect",
    "events_markov_transitions",
    "events_cusum_alarms",
    "profile_benford_digits",
    "orders_mad_outliers",
    "basket_association_rules",
    "customer_rfm_segments",
    "events_session_funnel",
    "graph_degree_histogram",
    "dedup_simhash_hamming",
    "profile_split_drift",
    "knn_mmr_rerank",
    "customer_pareto_share",
    "text_lang_confusion",
    "curation_universe_sample",
    "sketch_comparison_report",
    "quality_checks_report",
    "orders_wow_growth",
    "agg_q10_returned_items",
    "agg_q4_late_orders",
    "lineitem_ship_latency",
    "events_props_json_stats",
    "events_cohort_ltv",
    "embedding_norm_profile",
    "events_top_journeys",
    "text_collocations_lift",
    "sketch_grouped_quantiles",
    "orders_trailing_week_revenue",
    "orders_percent_rank_top",
    "mango_all",
    "supplier_fill_rate",
    "text_zipf_profile",
    "sketch_kmv_set_ops",
    "sketch_hll_rolling_distinct",
    "dedup_jaccard_clusters",
    "events_retention_rate",
    "orders_basket_size_hist",
    "events_stickiness",
    "curation_weighted_sample",
    "dedup_multipass_pairs",
    # r6 additions + previously-unaudited static-plan rows (the skip set
    # is now ONLY the side-effecting roundtrips/reactive/streaming rows)
    "ann_sq8_384",
    "ann_pq_384",
    "agg_top_revenue_orders",
    "ann_doc_reads",
    "ann_ivf_cells",
    "ann_lsh_buckets",
    "compat_index_string",
    "dedup_duplicate_clusters",
    "dedup_ngram_jaccard",
    "events_anomaly_hours",
    "events_windowed_agg",
    "join_anti_missing_vectors",
    "join_zip_documents_embeddings",
    "knn_ann_range_compat",
    "mango_bool_combinators",
    "mango_count",
    "mango_elemmatch_size",
    "mango_eq_ne",
    "mango_exists",
    "mango_in_nin",
    "mango_mod",
    "mango_regex",
    "mango_sort_skip_limit",
    "multimodal_decode_fake",
    "multimodal_frame_sample",
    "multimodal_resize_fake",
    "point_lookup",
    "profile_length_histogram",
    "profile_length_quantiles",
    "profile_sample_per_source",
    "rollup_orders_by_status_priority",
    "scan_documents",
    "set_ops_intersect_except",
    "text_bpe_token_count",
    "text_fingerprint",
    "text_lang_id",
    "text_quality_score",
    "text_title_content_parse",
    "text_token_count",
    "union_dedup",
    "supplier_sole_late_q21",
    "graph_triangle_count",
    "events_attribution_last_touch",
    "agg_q6_forecast_revenue",
    "agg_q7_nation_volume",
    "agg_q2_min_cost_supplier",
    "agg_q11_important_shares",
    "agg_q13_customer_distribution",
    "agg_q15_top_supplier",
    "agg_q22_dormant_customers",
    "graph_clustering_coefficient",
    "graph_common_neighbors",
    "text_tfidf_similar_pairs",
    "ann_ivfpq_384",
    "parts_price_size_skyline",
    "graph_personalized_pagerank",
    "brand_price_size_skyline",
    "dedup_cosine_pairs_384",
    "events_attribution_linear",
    "text_editdistance_pairs",
    "agg_q3_shipping_priority",
    "agg_q5_local_supplier_volume",
    "agg_q8_market_share",
    "agg_q14_promo_effect",
    "agg_q19_disjunctive_revenue",
    "agg_grouping_sets_revenue",
    "graph_harmonic_hubs",
    # r7 additions
    "graph_clustering_coefficient_hubs",
    "ann_pq_batch_search",
    "dedup_containment_pairs",
    "orders_weekly_trend_ols",
    "graph_kcore_peel",
    "graph_label_propagation",
    "graph_bfs_reach",
    "dedup_semantic_medoids",
    "dedup_semantic_prune",
    "events_ewma_hourly",
    "events_attribution_time_decay",
    "events_activity_streaks",
    "profile_key_skew",
    "events_revenue_milestones",
    "lineitem_weighted_median",
    # r8 additions
    "ann_lsh_probe_stats",
    "ann_ivfpq_residual_384",
    "graph_resource_allocation",
    "dedup_minhash_calibration",
    # r8 late wave (stream_spend_burst_live is excluded like the other
    # stream_* live rows — semantics, not a single static plan)
    "graph_hits_authorities",
    "dedup_substring_profile",
    "events_spend_burst",
    "profile_chi_square",
    "orders_theil_sen_trend",
    "ann_bq_search",
    "ann_bq_384",
    "ann_filtered_exact",
    "ann_ivf_filtered",
    "orders_mann_kendall",
    "curation_k_anonymity",
    "events_conversion_propensity",
    "customer_gini_revenue",
    "ann_bq_search_precomputed",
    "profile_equidepth_bins",
    "multimodal_audio_windows",
    "graph_jaccard_neighbors",
    "dedup_top_passages",
]


def audit_one(df) -> dict[str, object]:
    df.collect()  # drive to completion so AQE's FINAL plan is audited
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = bool(
        re.search(r"PushedFilters: \[[^\]]+\]", plan)
        and re.search(r"PushedFilters: \[\s*[^\]\s]", plan)
    )
    part = ""
    # a plan can hold several scans; report yes if ANY carries a filter
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            part = "yes"
            break
    joins = sorted(
        {
            j
            for j in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if j in plan
        }
    )
    return {
        "exchanges": plan.count("Exchange "),
        "topk": "TakeOrderedAndProject" in plan,
        "pushed": pushed,
        "partition_filters": part or "-",
        "joins": "+".join(j.replace("Join", "").replace("Broadcast", "B")
                          for j in joins) or "-",
        "python": plan.count("ArrowEvalPython") + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
        # final plans render codegen spans as `*(n)` node prefixes
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan)))
        or len(re.findall(r"WholeStageCodegen \(\d+\)", plan)),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan_audit", cpus=8, shuffle_partitions=8)
    qs = registry.queries()
    rows = []
    for name in AUDITED:
        try:
            info = audit_one(qs[name](spark, sf_dir))
        except Exception as exc:  # pragma: no cover - audit robustness
            rows.append((name, f"ERROR: {exc}"))
            continue
        rows.append((name, info))

    lines = [
        "# PLANS — physical-plan audit of the headline queries",
        "",
        f"Generated by `python tools/plan_audit.py {sf_dir}` over the",
        "EXECUTED plan of each registry query.  Columns: `xchg` = number of",
        "Exchange (shuffle/broadcast) operators; `topk` = compiles to",
        "TakeOrderedAndProject (partial per-partition top-k, no global",
        "sort); `pushed` = non-empty PushedFilters reached the parquet",
        "scan; `part` = PartitionFilters prune the read; `joins` = join",
        "strategies in the plan (B=Broadcast); `py` = Python/Arrow",
        "boundaries (0 = whole plan JVM-side); `wscg` = WholeStageCodegen",
        "spans.",
        "",
        "| query | xchg | topk | pushed | part | joins | py | wscg |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, info in rows:
        if isinstance(info, str):
            lines.append(f"| {name} | {info} |" + " - |" * 6)
            continue
        lines.append(
            f"| {name} | {info['exchanges']} | "
            f"{'yes' if info['topk'] else '-'} | "
            f"{'yes' if info['pushed'] else '-'} | "
            f"{info['partition_filters']} | {info['joins']} | "
            f"{info['python']} | {info['codegen_spans']} |"
        )
    out = "\n".join(lines) + "\n"
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write(out)
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
