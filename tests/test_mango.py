from __future__ import annotations

import pytest

from javascript_vector_database_spark import registry
from javascript_vector_database_spark.operators.mango import MangoError, mango_to_column
from tests.oracle_harness import compare

MANGO_QUERIES = [
    "mango_eq_ne",
    "mango_range",
    "mango_in_nin",
    "mango_bool_combinators",
    "mango_mod",
    "mango_regex",
    "mango_exists",
    "mango_elemmatch_size",
    "mango_sort_skip_limit",
    "mango_count",
    "mango_all",
]


@pytest.mark.parametrize("name", MANGO_QUERIES)
def test_mango_oracle(spark, sf_oracle, name):
    compare(spark, sf_oracle, registry.queries()[name], registry.oracle_sql()[name])


def test_unsupported_operator_raises():
    with pytest.raises(MangoError):
        mango_to_column({"$where": "this.x > 1"})
    with pytest.raises(MangoError):
        mango_to_column({"x": {"$type": "string"}})


def test_deleted_filter_applied(spark):
    from javascript_vector_database_spark.operators.mango import find
    from javascript_vector_database_spark.tables import with_meta

    df = spark.createDataFrame(
        [(1, "a", False), (2, "b", True), (3, "c", False)], "id int, v string, _deleted boolean"
    )
    got = {r["id"] for r in find(df).collect()}
    assert got == {1, 3}
    # with_meta adds the column when absent
    df2 = spark.createDataFrame([(1, "a")], "id int, v string")
    assert "_deleted" in with_meta(df2).columns


def test_mango_nested_struct_and_elemmatch(spark):
    """Nested dot-path predicates + $elemMatch over array<struct> — the
    engine's Mango layer supports nested docs even though the demo schema
    is flat (SURVEY §1.2; utils-object-dot-prop whole-file)."""
    from javascript_vector_database_spark.operators.mango import mango_to_column

    df = spark.createDataFrame(
        [
            (1, {"city": "berlin", "geo": {"lat": 52.5}}, [{"k": "a", "v": 1}]),
            (2, {"city": "paris", "geo": {"lat": 48.9}}, [{"k": "b", "v": 9}]),
            (3, {"city": "berlin", "geo": {"lat": 52.5}}, [{"k": "a", "v": 9}]),
        ],
        "id long, addr struct<city:string, geo:struct<lat:double>>, "
        "tags array<struct<k:string, v:long>>",
    )
    got = {
        r["id"]
        for r in df.where(
            mango_to_column(
                {
                    "addr.city": {"$eq": "berlin"},
                    "addr.geo.lat": {"$gt": 50.0},
                    "tags": {"$elemMatch": {"k": {"$eq": "a"}, "v": {"$gte": 5}}},
                }
            )
        ).collect()
    }
    assert got == {3}


def test_all_operator_semantics(spark):
    """$all: every listed value must be in the array; an empty $all list
    matches nothing (Mongo semantics)."""
    from javascript_vector_database_spark.operators.mango import find

    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["a"]), (3, ["b", "a"])], ["id", "xs"]
    )
    got = sorted(r["id"] for r in find(df, {"xs": {"$all": ["a", "b"]}}).collect())
    assert got == [1, 3]  # order inside the array is irrelevant
    assert find(df, {"xs": {"$all": []}}).count() == 0


def test_all_operator_on_scalar_field(spark):
    """mingo $all:[v] on a SCALAR field matches when the scalar equals v
    (and a two-distinct-value list can never match a scalar) — the
    translator dispatches on the schema type instead of failing analysis
    with array_contains on a non-array column."""
    from javascript_vector_database_spark.operators.mango import find

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "s"])
    got = sorted(r["id"] for r in find(df, {"s": {"$all": ["a"]}}).collect())
    assert got == [1]
    assert find(df, {"s": {"$all": ["a", "b"]}}).count() == 0
    # nested struct path resolves through the schema walk too
    df2 = spark.createDataFrame([(1, {"k": "x"})], ["id", "st"])
    assert find(df2, {"st.k": {"$all": ["x"]}}).count() == 1
