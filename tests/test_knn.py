from __future__ import annotations

from pyspark.sql import functions as F

from javascript_vector_database_spark import registry
from javascript_vector_database_spark.operators import knn
from javascript_vector_database_spark.pivots import make_pivots
from javascript_vector_database_spark.tables import load_table
from tests.oracle_harness import compare


def test_knn_exact_oracle(spark, sf_oracle):
    compare(spark, sf_oracle, registry.knn_exact, registry.oracle_sql()["knn_exact"])


def test_knn_exact_self_is_nearest(spark, sf_smoke):
    qv = registry.get_query_vec(spark, sf_smoke)
    top = registry.knn_exact(spark, sf_smoke).collect()
    assert top[0]["vec_id"] == registry.QVEC_ID
    assert top[0]["distance"] == 0.0
    dists = [r["distance"] for r in top]
    assert dists == sorted(dists)
    assert len(top) == 10


def test_ann_range_oracle(spark, sf_oracle):
    compare(
        spark, sf_oracle, registry.knn_ann_range, registry.oracle_sql()["knn_ann_range"]
    )


def test_ann_range_subset_of_table_and_ranked(spark, sf_smoke):
    """Index-path ⊆ scan-path metamorphic check (the reference author's own
    oracle, SURVEY.md §5.2)."""
    qv = registry.get_query_vec(spark, sf_smoke)
    pivots = make_pivots(len(qv))[:5]
    emb = load_table(spark, sf_smoke, "embeddings")
    exact = {r["vec_id"]: r["distance"] for r in knn.exact_knn(emb, qv, k=50).collect()}
    ann = knn.ann_index_range(emb, qv, pivots).collect()
    for r in ann:
        if r["vec_id"] in exact:
            assert abs(exact[r["vec_id"]] - r["distance"]) < 1e-9


def test_ann_similarity_recall(spark, sf_smoke):
    qv = registry.get_query_vec(spark, sf_smoke)
    pivots = make_pivots(len(qv))[:5]
    emb = load_table(spark, sf_smoke, "embeddings")
    exact_ids = {r["vec_id"] for r in knn.exact_knn(emb, qv).collect()}
    ann_ids = {
        r["vec_id"] for r in knn.ann_index_similarity(emb, qv, pivots).collect()
    }
    # 100 docs/side/pivot on a 500-row table covers nearly everything
    recall = len(exact_ids & ann_ids) / len(exact_ids)
    assert recall >= 0.8, recall


def test_flagship_oracle(spark, sf_oracle):
    compare(
        spark,
        sf_oracle,
        registry.flagship_search,
        registry.oracle_sql()["flagship_search"],
    )


def test_scan_and_point_lookup_oracles(spark, sf_oracle):
    qs, osql = registry.queries(), registry.oracle_sql()
    compare(spark, sf_oracle, qs["scan_documents"], osql["scan_documents"])
    compare(spark, sf_oracle, qs["point_lookup"], osql["point_lookup"])


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert rows[0]["distance"] == 0.0
