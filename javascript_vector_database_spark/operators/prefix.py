"""Distributed exact prefix sums (parallel scan) — no single-partition window.

A bare ``sum(v) OVER (ORDER BY ...)`` compiles to WindowExec fed by ONE
partition: the whole table sorts and scans through a single task, which
is the one plan shape the rest of the repo refuses at 100 TB.  These
helpers produce the SAME exact running totals with the classic two-phase
parallel-scan construction (the prefix-sum sibling of
``operators/rank.py``'s prefix-rank):

1. ``repartitionByRange`` on the order key — partition *i* holds a
   contiguous, disjoint slice of the global order;
2. a cumulative-sum window partitioned by ``spark_partition_id()`` —
   P parallel local scans instead of one global one;
3. per-partition value totals (P rows, or P x |groups| for the grouped
   form) folded into running-sum offsets — the only ``__pid``-ordered
   window in the plan runs over those bounded rows — broadcast-joined
   back, so ``global = local + offset``.

The input is ``localCheckpoint``-pinned before step 2 for the same
reason as rank.py: the offsets job and the final join must observe the
SAME partition assignment.  Eager, for rank.py's deadlock reason (a
lazy checkpoint first materialized on a broadcast-exchange thread can
deadlock against the DAG scheduler — see rank.py's module docstring).

``order_cols`` must define a TOTAL order (include a unique tiebreak):
with ties, each tied row's running total would depend on partition-
internal order.  (Outputs that only *read* the total at a tie-invariant
point — e.g. the weighted-median crossing row — tolerate tied keys, but
the per-row column itself is only deterministic under a total order.)

No reference analog — the reference scans in-process (single node);
this is the scale-out form of the same semantics.  Blelloch's two-phase
scan (CACM 1989, public) is the textbook source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from javascript_vector_database_spark.operators.rank import _num_partitions


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    *,
    out: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """``sum(value_col) OVER (ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING)`` as P parallel local scans plus a broadcast offset per
    partition.  The value column should already be integer (the repo's
    cents/micro discipline) so the running total is BIGINT-exact."""
    n = _num_partitions(df, num_partitions)
    part = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sums = part.groupBy("__pid").agg(
        F.sum(value_col).cast("long").alias("__psum")
    )
    # running sum over <= P partition-total rows: bounded input, ordered
    # by the synthetic partition id, never the data grain
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.select(
        "__pid",
        F.coalesce(F.sum("__psum").over(woff), F.lit(0))
        .cast("long")
        .alias("__off"),
    )
    wloc = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        part.join(F.broadcast(offsets), "__pid")
        .withColumn(
            out,
            (F.sum(value_col).over(wloc) + F.col("__off")).cast("long"),
        )
        .drop("__pid", "__off")
    )


def grouped_prefix_min(
    df: DataFrame,
    group_col: str,
    order_cols: list[Column],
    value_col: str,
    *,
    out: str = "cummin",
    num_partitions: int | None = None,
) -> DataFrame:
    """``min(value_col) OVER (PARTITION BY group_col ORDER BY order_cols
    ROWS UNBOUNDED PRECEDING)`` via the same two-phase construction as
    :func:`grouped_prefix_sum` — min is associative, so the offset is the
    min of the group's per-partition minima in EARLIER partitions and
    ``global = least(local running min, offset)`` (``least`` skips the
    NULL offset the group's first partition sees).

    This is the primitive the CUSUM recursion needs at scale: the
    prefix-min identity s_t = P_t - min_{j<=t} P_j turns the nonlinear
    fold into one prefix sum + one prefix min, and the grouped two-phase
    forms keep BOTH scans P-parallel when one group dominates the corpus
    (pinned on a single-group corpus in tests/test_relational_feed.py)."""
    n = _num_partitions(df, num_partitions)
    ordered = [F.col(group_col).asc()] + [c for c in order_cols]
    part = (
        df.repartitionByRange(n, *ordered)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    mins = part.groupBy("__pid", group_col).agg(
        F.min(value_col).cast("long").alias("__pmin")
    )
    woff = (
        Window.partitionBy(group_col)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = mins.select(
        "__pid",
        group_col,
        F.min("__pmin").over(woff).cast("long").alias("__moff"),
    )
    wloc = (
        Window.partitionBy("__pid", group_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        part.join(F.broadcast(offsets), ["__pid", group_col])
        .withColumn(
            out,
            F.least(
                F.min(value_col).over(wloc).cast("long"), F.col("__moff")
            ),
        )
        .drop("__pid", "__moff")
    )


def grouped_prefix_sum(
    df: DataFrame,
    group_col: str,
    order_cols: list[Column],
    value_col: str,
    *,
    out: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """``sum(value_col) OVER (PARTITION BY group_col ORDER BY order_cols
    ROWS UNBOUNDED PRECEDING)`` without a per-group monolithic scan —
    for LOW-cardinality groups (where each group's window partition
    would otherwise hold n/groups rows).

    Range-partitions on (group, order): each (pid, group) slice is a
    contiguous run of the group's order, so the local cumulative sum
    plus the group's total in earlier partitions IS the global running
    total.  Offsets table is P x |groups| rows — bounded."""
    n = _num_partitions(df, num_partitions)
    ordered = [F.col(group_col).asc()] + [c for c in order_cols]
    part = (
        df.repartitionByRange(n, *ordered)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sums = part.groupBy("__pid", group_col).agg(
        F.sum(value_col).cast("long").alias("__psum")
    )
    woff = (
        Window.partitionBy(group_col)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sums.select(
        "__pid",
        group_col,
        F.coalesce(F.sum("__psum").over(woff), F.lit(0))
        .cast("long")
        .alias("__off"),
    )
    wloc = (
        Window.partitionBy("__pid", group_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        part.join(F.broadcast(offsets), ["__pid", group_col])
        .withColumn(
            out,
            (F.sum(value_col).over(wloc) + F.col("__off")).cast("long"),
        )
        .drop("__pid", "__off")
    )
