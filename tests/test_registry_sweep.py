"""Every registered query compared against its oracle at the smallest SF.

The per-module suites check their own query families at sf0.01; this
sweep guarantees NO registry entry — present or future — ships without a
local value-level oracle check (the same count/schema/value contract the
driver's CORRECTNESS file grades).  sf0.001 keeps the whole sweep cheap;
a query that is correct here and in its module's sf0.01 check has two
independent data points before the driver ever sees it.
"""

from __future__ import annotations

import pytest

from javascript_vector_database_spark import registry
from tests.oracle_harness import compare

SF_SMOKE = "/root/testdata/sf0.001"

ALL_NAMES = sorted(registry.queries())

#: queries whose plan INTENTIONALLY contains a BroadcastNestedLoopJoin:
#: a broadcast crossJoin against a tiny literal/query-vector side is the
#: right fan-out shape (the small side is bounded by construction).  Any
#: OTHER query acquiring a BNLJ — or ANY query acquiring a non-broadcast
#: CartesianProduct — is a 100 TB regression and fails the sweep.
BNLJ_ALLOWED = {
    "knn_batch_exact",  # 5-row query table broadcast against the corpus
    # decorrelated scalar subqueries: a ONE-row global aggregate
    # (total / max / (count, sum) pair) broadcast-crossJoined against
    # the grouped relation — the side is 1 row by construction
    "agg_q11_important_shares",
    "agg_q15_top_supplier",
    "agg_q22_dormant_customers",
    # the PassJoin both-short pool: strings shorter than k+1 chars have
    # ED <= k to EACH OTHER unconditionally, so every joined row is a
    # true output pair — the tiny constant-key join is 1:1 with the
    # output, not a blocking failure
    "text_editdistance_pairs",
}


@pytest.mark.parametrize("name", ALL_NAMES)
def test_registry_sweep(spark, name):
    compare(spark, SF_SMOKE, registry.queries()[name], registry.oracle_sql()[name])
    plan = (
        registry.queries()[name](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .sparkPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, f"{name} went cartesian:\n{plan}"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} acquired a nested-loop join:\n{plan}"
        )
