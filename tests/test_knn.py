from __future__ import annotations

from pyspark.sql import functions as F

from javascript_vector_database_spark import registry
from javascript_vector_database_spark.operators import knn
from javascript_vector_database_spark.pivots import make_pivots
from javascript_vector_database_spark.tables import load_table
from tests.oracle_harness import compare


def test_knn_batch_oracle(spark, sf_oracle):
    compare(
        spark,
        sf_oracle,
        registry.queries()["knn_batch_exact"],
        registry.oracle_sql()["knn_batch_exact"],
    )


def test_knn_batch_each_query_matches_single(spark, sf_oracle):
    """Per-query slices of the batch result equal the single-query path."""
    from javascript_vector_database_spark.operators import knn as K
    from javascript_vector_database_spark.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_oracle, "embeddings")
    batch = registry.queries()["knn_batch_exact"](spark, sf_oracle).collect()
    for qid in (1, 3, 5):
        got = [
            (r["vec_id"], r["distance"]) for r in batch if r["query_id"] == qid
        ]
        qv = registry.get_query_vec(spark, sf_oracle, vec_id=qid)
        want = [
            (r["vec_id"], r["distance"])
            for r in K.exact_knn(emb, qv).collect()
        ]
        assert got == want


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


def test_compat_range_oracle(spark, sf_oracle):
    compare(
        spark,
        sf_oracle,
        registry.queries()["knn_ann_range_compat"],
        registry.oracle_sql()["knn_ann_range_compat"],
    )


def test_compat_string_range_divergence(spark):
    """Documents the §1.3 quirk: the lexicographic string index mis-orders
    across integer-digit-count regimes.  With a pivot window whose key
    bounds straddle the 1-digit/2-digit boundary (lo key '7.35...', hi key
    '13.65...'), string comparison excludes EVERYTHING: any key > '7.35'
    starts with '7'..'9' and therefore also sorts above '13.65'
    ('9' > '1'), while keys in the '10.x'-'13.x' regime sort below '7.35'
    ('1' < '7').  Double mode (the consciously-fixed scale path) returns
    the true candidates."""
    rows = [
        (1, [2.05, 0.0]),  # dist to pivot = 1.05 -> key '10.5000000'
        (2, [1.9, 0.0]),   # dist 0.9  -> key '9.00000000' (numeric window IN)
        (3, [2.6, 0.0]),   # dist 1.6  -> key '16.0000000' (numeric OUT)
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )
    pivots = [[1.0, 0.0]]
    qv = [2.05, 0.0]  # d_pivot = 1.05; window +-0.3 -> (0.735, 1.365)
    wide = 0.3
    dbl = {
        r["vec_id"]
        for r in knn.ann_index_range(df, qv, pivots, index_distance=wide).collect()
    }
    compat = {
        r["vec_id"]
        for r in knn.ann_index_range_compat(
            df, qv, pivots, index_distance=wide
        ).collect()
    }
    assert dbl == {1, 2}
    # the quirk: the string window across the digit-count boundary is
    # lexicographically empty — the reference would MISS both candidates
    assert compat == set()


def test_mmr_skips_near_copies(spark):
    """MMR must pass over a near-copy of an already-selected item in
    favor of a diverse one, where plain top-k would take the copy."""
    from javascript_vector_database_spark.operators.knn import mmr_rerank

    rows = [
        (1, [0.9, 0.43, 0.0], "a"),    # best match to q
        (2, [0.9, 0.44, 0.0], "b"),    # near-copy of 1 (sim ~1)
        (3, [0.9, -0.43, 0.0], "c"),   # equally relevant, diverse
        (4, [0.7, 0.0, 0.7], "d"),     # diverse
        (5, [-1.0, 0.0, 0.0], "e"),    # anti-relevant
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = [r["vec_id"] for r in mmr_rerank(emb, [1.0, 0.0, 0.0], k=3)
           .orderBy("rank").collect()]
    assert out[0] == 1
    assert 2 not in out[1:]  # the near-copy is passed over
    assert set(out[1:]) <= {3, 4}


def test_mmr_oracle(spark, sf_oracle):
    compare(
        spark,
        sf_oracle,
        registry.queries()["knn_mmr_rerank"],
        registry.oracle_sql()["knn_mmr_rerank"],
    )


def test_lit_double_array_bit_identical(spark):
    """The one-parse literal path must produce bit-identical doubles to
    the per-element F.lit path — incl. subnormals, huge magnitudes,
    negative zero, and non-terminating binary fractions."""
    import struct

    from pyspark.sql import functions as F

    from javascript_vector_database_spark.functions.vector import (
        lit_double_array,
    )

    vals = [
        0.1 + 0.2, -0.0, 5e-324, 1e300, -1.7976931348623157e308,
        123456789.123456789, 2.0 ** -1022, 1 / 3,
        float("nan"), float("inf"), float("-inf"),
    ]
    old = spark.range(1).select(
        F.array(*[F.lit(float(x)) for x in vals]).alias("a")
    ).first()["a"]
    new = spark.range(1).select(lit_double_array(vals).alias("a")).first()["a"]
    assert all(
        struct.pack("d", a) == struct.pack("d", b) for a, b in zip(old, new)
    )
    assert len(old) == len(new) == len(vals)
