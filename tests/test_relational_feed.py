from __future__ import annotations

import pytest

from javascript_vector_database_spark import registry
from tests.oracle_harness import compare

NAMES = [
    "join_anti_missing_vectors",
    "join_zip_documents_embeddings",
    "union_dedup",
    "agg_pricing_summary",
    "agg_top_revenue_orders",
    "window_top_customers_per_nation",
    "rollup_orders_by_status_priority",
    "events_windowed_agg",
    "changefeed_page",
    "state_fold_last_per_user",
    "knn_ann_similarity",
    "ann_doc_reads",
    "compat_index_string",
]


@pytest.mark.parametrize("name", NAMES)
def test_oracle(spark, sf_oracle, name):
    compare(spark, sf_oracle, registry.queries()[name], registry.oracle_sql()[name])
