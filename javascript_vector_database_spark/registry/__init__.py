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
#
# ORDER MATTERS: the driver's correctness harness checks the first 50
# registered queries per round.  Modules whose rows were missing from
# CORRECTNESS_r02 (vector_search, text_queries — incl. the never-driver-
# checked knn_ann_range_compat and the entry-point flagship_search) go
# first, followed by modules whose implementation changed this round;
# mango/relational (unchanged, all r2-green) rotate to the back.
from javascript_vector_database_spark.registry import (  # noqa: E402,F401
    vector_search,
    text_queries,
    ann_scale_queries,
    dedup_queries,
    feed_state,
    dml_queries,
    profiling_queries,
    multimodal_queries,
    relational,
    mango_queries,
)
from javascript_vector_database_spark.registry.vector_search import (  # noqa: E402,F401
    flagship_search,
    knn_ann_range,
    knn_ann_similarity,
    knn_exact,
)
