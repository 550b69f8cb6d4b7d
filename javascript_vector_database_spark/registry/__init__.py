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
    # DRIVER WINDOW (first 50), round 6.  The r5 verdict's top item: 31
    # r5 registry queries had never been inside a 50-slot window — they
    # lead this rotation (all sweep-green locally since r5), followed by
    # the 19 r6-new rows: never-stamped queries fill the window EXACTLY
    # (31 + 19 = 50).  The two r6-changed rows sit first past the
    # boundary — they carry older green stamps and the local sweep
    # re-verifies them on every pytest run.
    # -- never-stamped r5 queries (31)
    "events_session_funnel", "graph_degree_histogram",
    "profile_split_drift", "customer_pareto_share",
    "text_lang_confusion", "curation_universe_sample",
    "sketch_comparison_report", "quality_checks_report",
    "orders_wow_growth", "agg_q10_returned_items", "agg_q4_late_orders",
    "lineitem_ship_latency", "events_props_json_stats",
    "events_cohort_ltv", "embedding_norm_profile",
    "events_top_journeys", "text_collocations_lift",
    "sketch_grouped_quantiles",
    "orders_trailing_week_revenue", "orders_percent_rank_top",
    "mango_all",
    "supplier_fill_rate", "text_zipf_profile",
    "sketch_kmv_set_ops",
    "sketch_hll_rolling_distinct",
    "dedup_jaccard_clusters",
    "events_retention_rate", "orders_basket_size_hist",
    "events_stickiness",
    "curation_weighted_sample", "dedup_multipass_pairs",
    # -- r6-new (19): streaming==batch equivalence, 384-dim quantizers
    #    (incl. IVF-PQ), Q2/Q6/Q7/Q11/Q13/Q15/Q21/Q22 shapes, triangle
    #    count + clustering coefficient + link prediction, last-touch
    #    attribution, fixed-point TF-IDF pair similarity
    "stream_hll_live_users", "stream_live_count_by_type",
    "stream_cms_live_tokens", "ann_sq8_384", "ann_pq_384",
    "supplier_sole_late_q21", "graph_triangle_count",
    "events_attribution_last_touch", "agg_q6_forecast_revenue",
    "agg_q7_nation_volume",
    "agg_q2_min_cost_supplier", "agg_q11_important_shares",
    "agg_q13_customer_distribution", "agg_q15_top_supplier",
    "agg_q22_dormant_customers", "graph_clustering_coefficient",
    "graph_common_neighbors", "text_tfidf_similar_pairs",
    "ann_ivfpq_384",
    # ---- window boundary (50) ----
    # -- r6-new past the window (15): sweep-verified, stamps next round
    "parts_price_size_skyline", "graph_personalized_pagerank",
    "brand_price_size_skyline", "dedup_cosine_pairs_384",
    "events_attribution_linear", "text_editdistance_pairs",
    "agg_q3_shipping_priority", "agg_q5_local_supplier_volume",
    "agg_q8_market_share", "agg_q14_promo_effect",
    "agg_q19_disjunctive_revenue", "agg_grouping_sets_revenue",
    "stream_interval_join_live", "stream_dedup_live",
    "graph_harmonic_hubs",
    # -- r6-changed after their last stamp (2): older stamps green,
    #    sweep-verified locally every pytest run
    "dedup_jaccard_prefix", "sketch_histogram_quantiles",
    # displaced refreshers + recent green stamps (r2-r5), unchanged
    "scan_documents", "point_lookup", "mango_count",
    "mango_sort_skip_limit", "union_dedup",
    "join_anti_missing_vectors", "join_zip_documents_embeddings",
    "flagship_search", "knn_exact", "knn_ann_range",
    "dml_roundtrip", "pipeline_roundtrip",
    "agg_q17_small_quantity_revenue", "agg_q18_large_orders",
    "profile_unpivot_lang_stats", "curation_domain_cap",
    "events_scd2_state_intervals", "events_gapfill_hourly",
    "sketch_cms_token_freq", "curation_contamination_bloom",
    "graph_pagerank_copurchase",
    "text_bpe_pair_counts",
    "curation_remove_boilerplate", "text_phrase_search",
    "events_hourly_trend", "events_corr_pairs",
    "knn_exact_384", "knn_ann_similarity_384",
    "knn_ann_range_compat_384", "compat_index_string_384", "ann_ivf_384",
    "sketch_hll_distinct_users", "sketch_hll_users_by_type",
    "join_bucketed_colocated", "curation_lm_quality",
    "text_winnow_fingerprints", "text_winnow_overlap_pairs",
    "events_funnel_counts", "events_retention_cohorts",
    "events_hopping_window_agg", "agg_regional_revenue",
    "text_keywords", "events_anomaly_hours",
    "knn_mmr_rerank", "dedup_simhash_hamming",
    "events_funnel_latency", "events_asof_join_forward",
    "orders_winsorized_mean", "curation_luhn_cc_detect",
    "events_markov_transitions", "events_cusum_alarms",
    "division_suppliers_full_brand", "text_phrase_postings_join",
    "events_dwell_stats", "profile_ntile_deciles",
    "orders_price_outliers", "profile_benford_digits",
    "orders_mad_outliers", "basket_association_rules",
    "customer_rfm_segments",
    "dedup_lsh_pairs", "dedup_duplicate_clusters",
    "dedup_duplicate_clusters_star", "curation_pipeline",
    "curation_contamination", "knn_batch_exact",
    "state_fold_last_per_user",
    "knn_ann_similarity",
    "knn_ann_range_compat", "compat_index_string",
    "ann_doc_reads", "ann_ivf_batch_search", "ann_ivf_cells",
    "ann_ivf_search", "ann_ivf_search_partitioned", "ann_lsh_buckets",
    "ann_lsh_search", "ann_lsh_search_precomputed", "ann_sq8_codes",
    "ann_sq8_search", "ann_sq8_search_precomputed",
    "curation_chunk_documents", "curation_split_assign",
    "dedup_batch_vs_corpus", "dedup_cosine_pairs",
    "join_salted_skew", "knn_cosine", "multimodal_byte_stats",
    "multimodal_decode_fake", "multimodal_resize_fake",
    "profile_length_quantiles", "reactive_count_ivm",
    "reactive_query_ivm", "reactive_topk_ivm",
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
