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
    # DRIVER WINDOW (first 50), round 7.  Composition:
    #   15 never-stamped late-r6 rows (the r6 verdict's top item — they
    #      outgrew the r6 window; all sweep-green locally since r6);
    #   11 r7-changed rows (RFM/ntile de-windowing, integer histogram
    #      bins, PQ-384 M=96 + rerank=32 reconfig, null-safe stream
    #      split, shared shuffle-partitions guard);
    #    4 PQ-family rows whose ORACLES moved to the ordered-sum ADC;
    #   11 r7-new rows (seeded clustering coefficient, batch PQ ADC,
    #      containment pairs, OLS trend, k-core peel, order-confluent
    #      live sessionization, LPA communities, bounded BFS reach,
    #      semantic-dedup medoids + prune, exact hourly EWMA);
    #    9 oldest-stamp refreshers (r2/r3 stamps, unchanged).
    # -- never-stamped late-r6 (15)
    "parts_price_size_skyline", "brand_price_size_skyline",
    "graph_personalized_pagerank", "graph_harmonic_hubs",
    "dedup_cosine_pairs_384", "events_attribution_linear",
    "text_editdistance_pairs", "agg_q3_shipping_priority",
    "agg_q5_local_supplier_volume", "agg_q8_market_share",
    "agg_q14_promo_effect", "agg_q19_disjunctive_revenue",
    "agg_grouping_sets_revenue", "stream_interval_join_live",
    "stream_dedup_live",
    # -- r7-changed (11)
    "customer_rfm_segments", "profile_ntile_deciles",
    "sketch_histogram_quantiles", "sketch_grouped_quantiles",
    "ann_pq_384", "ann_ivfpq_384",
    "stream_hll_live_users", "stream_live_count_by_type",
    "stream_cms_live_tokens",
    "dedup_jaccard_prefix", "dedup_multipass_pairs",
    # -- r7 oracle-changed PQ family (4)
    "ann_pq_search", "ann_pq_search_precomputed",
    "ann_ivfpq_search", "ann_ivfpq_search_partitioned",
    # -- r7-new (14)
    "graph_clustering_coefficient_hubs", "ann_pq_batch_search",
    "dedup_containment_pairs", "orders_weekly_trend_ols",
    "graph_kcore_peel", "stream_sessionize_live",
    "graph_label_propagation", "graph_bfs_reach",
    "dedup_semantic_medoids", "dedup_semantic_prune",
    "events_ewma_hourly",
    # third wave: time-decay attribution (completes the family),
    # gaps-and-islands streaks, join-key skew diagnosis
    "events_attribution_time_decay", "events_activity_streaks",
    "profile_key_skew",
    # fourth wave: the distributed prefix-scan pair (operators/prefix.py)
    "events_revenue_milestones", "lineitem_weighted_median",
    # ann_ivf_384 re-enters: nprobe 2 -> 4 changes its RESULT (recall
    # 0.58 -> 0.88 at reference geometry), so it needs a fresh stamp
    "ann_ivf_384",
    # -- oldest-stamp refreshers (3): r2/r3 driver stamps, unchanged
    # (6 more — join_anti/join_zip/knn_ann_range/knn_exact/reactive
    # pair — displaced by the r7 third+fourth waves; their stamps stay
    # green and the local sweep still value-checks them every pytest
    # run)
    "flagship_search",
    "dml_roundtrip", "pipeline_roundtrip",
    # ---- window boundary (50) ----
    "knn_exact", "reactive_count_ivm", "reactive_query_ivm",
    "join_anti_missing_vectors", "join_zip_documents_embeddings",
    "knn_ann_range",
    "scan_documents", "point_lookup", "mango_count",
    "mango_sort_skip_limit", "union_dedup",
    # displaced refreshers (r3 stamps; the knn rows' 384 siblings carry
    # r5 stamps and the reactive family keeps two fresher slots above,
    # so these five were the lowest-value refresh slots)
    "reactive_topk_ivm",
    "knn_ann_similarity", "knn_ann_range_compat", "compat_index_string",
    "knn_cosine",
    # everything below carries a green r4-r6 stamp and is unchanged;
    # the local sf0.001 sweep re-verifies all of it on every pytest run
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
