"""Skew mitigation: salted equi-join.

AQE's skew-join handling (enabled in session.py) splits oversized
sort-merge partitions automatically; salting is the EXPLICIT fallback
that also works for shuffled hash joins and for pre-aggregations — the
standard remedy when one hot key (a viral document, a bot user) would
otherwise pin a single reducer at 100 TB.

``salted_join(left, right, key, n_salt)``: every left row gets a salt in
[0, n_salt) that varies WITHIN a key (per-row, not per-key — a per-key
salt would keep the hot key on one reducer); the right side is exploded
to all n_salt values so every (key, salt) pair still matches.  The join
result is salt-independent, so the per-row salt source does not need to
be reproducible across runs.  Cost: the right side is replicated
n_salt×, so use it for large-left / moderate-right joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    l = left.withColumn(
        "__salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)).cast("int"),
    )
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return l.join(r, [key, "__salt"], how).drop("__salt")
