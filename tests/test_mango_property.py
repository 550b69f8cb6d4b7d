"""Property-based check of the Mango->Column translator: random selectors
evaluated by Spark must agree with a pure-Python three-valued-logic (SQL
Kleene) reference evaluator on a fixed mixed-null dataset.

The reference evaluator mirrors the translator's DOCUMENTED null
semantics (operators/mango.py): comparisons on NULL yield UNKNOWN (row
dropped), $ne is null-safe-not-equal (NULL != v is TRUE), $nin matches
missing, $exists is a null check, and combinators follow Kleene AND/OR
with filter keeping only TRUE rows.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from javascript_vector_database_spark.operators.mango import mango_to_column

# -- fixed dataset (mixed nulls, small value domain to force collisions) ----

ROWS = [
    {"id": i, "a": a, "b": b, "tags": tags}
    for i, (a, b, tags) in enumerate(
        [
            (0, "x", [0]),
            (1, "y", [1, 2]),
            (2, "z", [2, 2, 2]),
            (3, "x", []),
            (4, "y", [4, 0]),
            (5, "z", [5]),
            (None, "x", [1]),
            (7, None, [7, 1]),
            (None, None, [0, 1, 2]),
            (9, "w", [3, 9]),
        ]
    )
]

SCHEMA = "id long, a long, b string, tags array<long>"


# -- three-valued reference evaluator ---------------------------------------


def _k_not(v):
    return None if v is None else (not v)


def _k_and(vals):
    if any(v is False for v in vals):
        return False
    if any(v is None for v in vals):
        return None
    return True


def _k_or(vals):
    if any(v is True for v in vals):
        return True
    if any(v is None for v in vals):
        return None
    return False


def _eval_field_op(x, op, arg):
    if op == "$eq":
        return None if x is None else x == arg
    if op == "$ne":
        return not (x == arg)  # null-safe: NULL != v is TRUE
    if op == "$gt":
        return None if x is None else x > arg
    if op == "$gte":
        return None if x is None else x >= arg
    if op == "$lt":
        return None if x is None else x < arg
    if op == "$lte":
        return None if x is None else x <= arg
    if op == "$in":
        return None if x is None else x in arg
    if op == "$nin":
        return True if x is None else x not in arg
    if op == "$mod":
        d, r = arg
        return None if x is None else x % d == r
    if op == "$exists":
        return (x is not None) if arg else (x is None)
    if op == "$size":
        return None if x is None else len(x) == arg
    if op == "$elemMatch":
        if x is None:
            return None
        return any(
            _k_and([_eval_field_op(e, o, a) for o, a in arg.items()]) is True
            for e in x
        )
    if op == "$not":
        return _k_not(_k_and([_eval_field_op(x, o, a) for o, a in arg.items()]))
    raise AssertionError(op)


def _eval_selector(row, sel):
    if not sel:
        return True
    parts = []
    for key, val in sel.items():
        if key == "$and":
            parts.append(_k_and([_eval_selector(row, s) for s in val]))
        elif key == "$or":
            parts.append(_k_or([_eval_selector(row, s) for s in val]))
        elif key == "$nor":
            parts.append(_k_not(_k_or([_eval_selector(row, s) for s in val])))
        else:
            x = row[key]
            parts.append(
                _k_and([_eval_field_op(x, o, a) for o, a in val.items()])
            )
    return _k_and(parts)


# -- selector strategy -------------------------------------------------------

_int_val = st.integers(min_value=0, max_value=9)
_str_val = st.sampled_from(["w", "x", "y", "z"])

_a_ops = st.fixed_dictionaries(
    {},
    optional={
        "$eq": _int_val,
        "$ne": _int_val,
        "$gt": _int_val,
        "$gte": _int_val,
        "$lt": _int_val,
        "$lte": _int_val,
        "$in": st.lists(_int_val, min_size=1, max_size=4),
        "$nin": st.lists(_int_val, min_size=1, max_size=4),
        "$mod": st.tuples(
            st.integers(min_value=1, max_value=5),
            st.integers(min_value=0, max_value=4),
        ).map(list),
        "$exists": st.booleans(),
    },
).filter(bool)

_b_ops = st.fixed_dictionaries(
    {},
    optional={
        "$eq": _str_val,
        "$ne": _str_val,
        "$in": st.lists(_str_val, min_size=1, max_size=3),
        "$exists": st.booleans(),
    },
).filter(bool)

_tags_ops = st.one_of(
    st.fixed_dictionaries({"$size": st.integers(min_value=0, max_value=3)}),
    st.fixed_dictionaries(
        {"$elemMatch": st.fixed_dictionaries({"$gte": _int_val})}
    ),
    st.fixed_dictionaries(
        {"$elemMatch": st.fixed_dictionaries({"$eq": _int_val})}
    ),
)

_field_sel = st.one_of(
    st.fixed_dictionaries({"a": _a_ops}),
    st.fixed_dictionaries({"b": _b_ops}),
    st.fixed_dictionaries({"tags": _tags_ops}),
    st.fixed_dictionaries({"a": _a_ops, "b": _b_ops}),
)

_selector = st.recursive(
    _field_sel,
    lambda children: st.one_of(
        st.fixed_dictionaries({"$and": st.lists(children, min_size=1, max_size=3)}),
        st.fixed_dictionaries({"$or": st.lists(children, min_size=1, max_size=3)}),
        st.fixed_dictionaries({"$nor": st.lists(children, min_size=1, max_size=2)}),
    ),
    max_leaves=6,
)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sel=_selector)
def test_mango_translator_matches_reference_semantics(spark, cached_df, sel):
    expected = {r["id"] for r in ROWS if _eval_selector(r, sel) is True}
    got = {
        r["id"] for r in cached_df.where(mango_to_column(sel)).select("id").collect()
    }
    assert got == expected, f"selector={sel!r}"


import pytest  # noqa: E402


@pytest.fixture(scope="module")
def cached_df(spark):
    df = spark.createDataFrame(
        [(r["id"], r["a"], r["b"], r["tags"]) for r in ROWS], SCHEMA
    ).cache()
    df.count()
    yield df
    df.unpersist()
