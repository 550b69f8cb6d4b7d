"""The operator/query registry behind ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 (plus the SURVEY §7.7
training-data-pipeline extensions) registers here:

* a Spark callable ``(spark, sf_dir) -> DataFrame``
* (when SQL-expressible) an equivalent DuckDB oracle SQL string.

Column names are aliased identically on both sides — the driver sorts
columns by name before hashing values.  Submodules:

* ``vector_search``  — §2.8 kNN/ANN strategies + flagship path
* ``mango_queries``  — §2.2 predicate language surface
* ``text_queries``   — §2.11 scalar fns + text-analysis extensions
* ``dedup_queries``  — dedup extension surface
* ``relational``     — §2.3/2.4/2.6 joins, aggregation, sort/limit, window
* ``feed_state``     — §2.1 change feed, §2.9 state fold
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from javascript_vector_database_spark.pivots import N_PIVOTS_USED, make_pivots
from javascript_vector_database_spark.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

#: query-vector source row (see oracle.QVEC_CTE)
QVEC_ID = 7


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def get_query_vec(spark: SparkSession, sf_dir: str, vec_id: int = QVEC_ID) -> list[float]:
    """The search parameter: one embedding row, read once driver-side (the
    reference embeds the user's search string; we use a stored vector so
    tests are model-free, FIXTURES.md `queries` rationale)."""
    row = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row[0]]


def used_pivots(dim: int) -> list[list[float]]:
    return make_pivots(dim)[:N_PIVOTS_USED]


# --- submodules register on import (register() must exist first) ----------
from javascript_vector_database_spark.registry import (  # noqa: E402,F401
    vector_search,
    text_queries,
    ann_scale_queries,
    dedup_queries,
    feed_state,
    dml_queries,
    curation_queries,
    profiling_queries,
    multimodal_queries,
    relational,
    mango_queries,
    ref_geometry,
    decorrelated,
)
from javascript_vector_database_spark.registry.vector_search import (  # noqa: E402,F401
    flagship_search,
    knn_ann_range,
    knn_ann_similarity,
    knn_exact,
)

# --- driver-window priority order -----------------------------------------
#
# ORDER MATTERS: the driver's correctness harness checks the first 50
# registered queries per round.  Every query NEW or whose implementation
# CHANGED this round is listed here explicitly so it gets a fresh driver
# row; rows that are unchanged-and-green from earlier rounds rotate to the
# back (they stay value-verified by the local DuckDB harness on every
# pytest run — tests/oracle_harness.py applies the identical contract).
_PRIORITY = [
    # DRIVER WINDOW (first 50), round 8.  Composition (exact):
    #   27 r8-NEW rows (ann_lsh_probe_stats, ann_ivfpq_residual_384,
    #      stream_reactive_topk_384, stream_cusum_live,
    #      graph_resource_allocation, graph_ktruss_strong_ties,
    #      dedup_minhash_calibration, and the late-r8 wave:
    #      graph_hits_authorities, dedup_substring_profile,
    #      events_spend_burst, profile_chi_square,
    #      orders_theil_sen_trend, ann_bq_search, ann_bq_384,
    #      ann_filtered_exact, ann_ivf_filtered,
    #      stream_spend_burst_live, orders_mann_kendall,
    #      curation_k_anonymity, events_conversion_propensity,
    #      customer_gini_revenue, stream_late_drop_live,
    #      ann_bq_search_precomputed, profile_equidepth_bins,
    #      multimodal_audio_windows, graph_jaccard_neighbors,
    #      dedup_top_passages);
    #    4 r8-CHANGED-result rows (ann_ivf_384 -> trained-centroid
    #      parquet fixture; ann_ivfpq_384 -> trained coarse cells +
    #      nprobe=6, recall 0.26 -> 0.88; ann_lsh_search +
    #      ann_lsh_search_precomputed -> query-directed multi-probe);
    #   19 oldest-stamp refreshers: ALL 7 remaining r2 stamps + 12 of
    #      the 36 remaining r3 stamps (deferred to the next rotation,
    #      displaced by the late-r8 wave — all keep green r3 stamps:
    #      ann_ivf_search_partitioned — its oracle twin ann_ivf_search
    #      IS in the window — dedup_cosine_pairs, join_salted_skew,
    #      knn_ann_range, knn_ann_range_compat,
    #      knn_ann_similarity,
    #      knn_batch_exact,
    #      knn_cosine, knn_exact,
    #      multimodal_byte_stats,
    #      multimodal_decode_fake, text_token_count,
    #      text_title_content_parse, text_quality_score,
    #      multimodal_resize_fake, profile_length_quantiles,
    #      reactive_count_ivm, reactive_query_ivm, reactive_topk_ivm,
    #      set_ops_intersect_except, text_bm25_search,
    #      text_bpe_token_count, text_fingerprint, text_lang_id).
    # Rotation-exempt by policy (outputs unchanged, locally
    # sweep-verified every pytest run): eager-checkpoint-only and
    # docstring-only r8 edits (dedup_semantic_prune materialize-once,
    # events_cusum_alarms skew-routing note, ivf_search centroid
    # guidance) — the same deliberate exemption r7 applied to
    # decorrelated.py's checkpoint flips.
    # -- r8 new/changed (31)
    "ann_ivf_384", "ann_ivfpq_384",
    "ann_lsh_search", "ann_lsh_search_precomputed",
    "ann_lsh_probe_stats", "ann_ivfpq_residual_384",
    "stream_reactive_topk_384", "stream_cusum_live",
    "graph_resource_allocation", "graph_ktruss_strong_ties",
    "dedup_minhash_calibration",
    "graph_hits_authorities", "dedup_substring_profile",
    "events_spend_burst", "profile_chi_square",
    "orders_theil_sen_trend", "ann_bq_search", "ann_bq_384",
    "ann_filtered_exact", "ann_ivf_filtered",
    "stream_spend_burst_live", "orders_mann_kendall",
    "curation_k_anonymity", "events_conversion_propensity",
    "customer_gini_revenue", "stream_late_drop_live",
    "ann_bq_search_precomputed", "profile_equidepth_bins",
    "multimodal_audio_windows",
    "graph_jaccard_neighbors", "dedup_top_passages",
    # -- oldest-stamp refreshers (19): 7 x r2, then 12 x r3
    "join_anti_missing_vectors", "join_zip_documents_embeddings",
    "mango_count", "mango_sort_skip_limit", "point_lookup",
    "scan_documents", "union_dedup",
    "ann_doc_reads", "ann_ivf_batch_search", "ann_ivf_cells",
    "ann_ivf_search", "ann_lsh_buckets",
    "ann_sq8_codes", "ann_sq8_search", "ann_sq8_search_precomputed",
    "compat_index_string", "curation_chunk_documents",
    "curation_split_assign", "dedup_batch_vs_corpus",
    # ---- window boundary (50) ----
    "dedup_cosine_pairs",
    "join_salted_skew",
    "knn_ann_range", "knn_ann_range_compat",
    "knn_ann_similarity", "knn_batch_exact",
    "knn_cosine", "knn_exact",
    "multimodal_byte_stats",
    "multimodal_decode_fake",
    "multimodal_resize_fake", "profile_length_quantiles",
    "reactive_count_ivm", "reactive_query_ivm", "reactive_topk_ivm",
    "set_ops_intersect_except", "text_bm25_search",
    "text_bpe_token_count", "text_fingerprint", "text_lang_id",
    "text_quality_score",
    "text_title_content_parse", "text_token_count",
    # everything below carries a green r4-r7 stamp and is unchanged;
    # the local sf0.001 sweep re-verifies all of it on every pytest run
    "parts_price_size_skyline", "brand_price_size_skyline",
    "graph_personalized_pagerank", "graph_harmonic_hubs",
    "dedup_cosine_pairs_384", "events_attribution_linear",
    "text_editdistance_pairs", "agg_q3_shipping_priority",
    "agg_q5_local_supplier_volume", "agg_q8_market_share",
    "agg_q14_promo_effect", "agg_q19_disjunctive_revenue",
    "agg_grouping_sets_revenue", "stream_interval_join_live",
    "stream_dedup_live",
    "customer_rfm_segments", "profile_ntile_deciles",
    "sketch_histogram_quantiles", "sketch_grouped_quantiles",
    "ann_pq_384",
    "stream_hll_live_users", "stream_live_count_by_type",
    "stream_cms_live_tokens",
    "dedup_jaccard_prefix", "dedup_multipass_pairs",
    "ann_pq_search", "ann_pq_search_precomputed",
    "ann_ivfpq_search", "ann_ivfpq_search_partitioned",
    "graph_clustering_coefficient_hubs", "ann_pq_batch_search",
    "dedup_containment_pairs", "orders_weekly_trend_ols",
    "graph_kcore_peel", "stream_sessionize_live",
    "graph_label_propagation", "graph_bfs_reach",
    "dedup_semantic_medoids", "dedup_semantic_prune",
    "events_ewma_hourly",
    "events_attribution_time_decay", "events_activity_streaks",
    "profile_key_skew",
    "events_revenue_milestones", "lineitem_weighted_median",
    "flagship_search",
    "dml_roundtrip", "pipeline_roundtrip",
    "ann_ivf_search_partitioned",
    "events_session_funnel", "graph_degree_histogram",
    "profile_split_drift", "customer_pareto_share",
    "text_lang_confusion", "curation_universe_sample",
    "sketch_comparison_report", "quality_checks_report",
    "orders_wow_growth", "agg_q10_returned_items", "agg_q4_late_orders",
    "lineitem_ship_latency", "events_props_json_stats",
    "events_cohort_ltv", "embedding_norm_profile",
    "events_top_journeys", "text_collocations_lift",
    "orders_trailing_week_revenue", "orders_percent_rank_top",
    "mango_all",
    "supplier_fill_rate", "text_zipf_profile",
    "sketch_kmv_set_ops",
    "sketch_hll_rolling_distinct",
    "dedup_jaccard_clusters",
    "events_retention_rate", "orders_basket_size_hist",
    "events_stickiness",
    "curation_weighted_sample",
    "ann_sq8_384",
    "supplier_sole_late_q21", "graph_triangle_count",
    "events_attribution_last_touch", "agg_q6_forecast_revenue",
    "agg_q7_nation_volume",
    "agg_q2_min_cost_supplier", "agg_q11_important_shares",
    "agg_q13_customer_distribution", "agg_q15_top_supplier",
    "agg_q22_dormant_customers", "graph_clustering_coefficient",
    "graph_common_neighbors", "text_tfidf_similar_pairs",
]


def _reorder() -> None:
    global _QUERIES, _ORACLES
    missing = [n for n in _PRIORITY if n not in _QUERIES]
    assert not missing, f"_PRIORITY names not registered: {missing}"
    rest = [n for n in _QUERIES if n not in set(_PRIORITY)]
    order = _PRIORITY + rest
    _QUERIES = {n: _QUERIES[n] for n in order}
    _ORACLES = {n: _ORACLES[n] for n in order if n in _ORACLES}


_reorder()
