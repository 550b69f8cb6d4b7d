"""Distributed exact global ranking — no single-partition window.

A bare ``row_number() OVER (ORDER BY ...)`` (or ``rank()`` partitioned by
a low-cardinality key) compiles to WindowExec fed by a single partition:
every row sorts through one task, which is the one shape the rest of the
repo refuses at 100 TB.  These helpers produce the SAME exact ranks with
the classic distributed prefix-rank construction (the TeraSort trick):

1. ``repartitionByRange`` on the sort key — partition *i* holds a
   contiguous, disjoint slice of the global order, and rows with EQUAL
   keys are never split across partitions (RangePartitioner boundaries
   are key values);
2. a window partitioned by ``spark_partition_id()`` — P parallel local
   sorts instead of one global one;
3. per-partition row counts (P rows) folded into running-sum offsets —
   the only global window in the plan runs over those P bounded rows —
   broadcast-joined back, so ``global = local + offset``.

The input is ``localCheckpoint``-pinned before step 2: the offsets job
and the final join must observe the SAME partition assignment, and the
checkpoint both guarantees that and avoids recomputing the (usually
aggregated) input twice.  The checkpoint is EAGER on purpose: with
``eager=False`` the first materialization can land on a
broadcast-exchange thread (the offsets subtree is broadcast) racing the
DAG scheduler's stage submission over the same RDD — observed as a
Java-level deadlock (RDDCheckpointData$ lock vs the RDD monitor,
confirmed by jstack) that froze a bench run mid-pass.  Eager
materialization completes on the driver thread at build time, closing
the window; the job itself runs exactly once either way.

No reference analog — the reference ranks in-process (single node); this
is the scale-out form its semantics need on a cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _num_partitions(df: DataFrame, num_partitions: int | None) -> int:
    if num_partitions is not None:
        return num_partitions
    from javascript_vector_database_spark.session import (
        shuffle_partitions_or_default,
    )

    return shuffle_partitions_or_default(df.sparkSession)


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    *,
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """``row_number() OVER (ORDER BY order_cols)`` as P parallel sorts.

    ``order_cols`` must define a TOTAL order (add a unique tiebreak
    column) — with ties, which equal row gets which number would depend
    on partition-internal order."""
    n = _num_partitions(df, num_partitions)
    part = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    # running sum over <= P partition-count rows: bounded input, the
    # global ordering here is over the partition ids, not the data
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(woff), F.lit(0))
        .cast("long")
        .alias("__off"),
    )
    wloc = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        part.join(F.broadcast(offsets), "__pid")
        .withColumn(
            out, (F.row_number().over(wloc) + F.col("__off")).cast("long")
        )
        .drop("__pid", "__off")
    )


def grouped_global_rank(
    df: DataFrame,
    group_col: str,
    order_col: Column,
    *,
    out: str = "rk",
    num_partitions: int | None = None,
) -> DataFrame:
    """``rank() OVER (PARTITION BY group_col ORDER BY order_col ASC)``
    without a per-group monolithic sort — for LOW-cardinality groups
    (where each group's partition would otherwise hold n/groups rows).

    Range-partitions on (group, key): ties in (group, key) land in one
    partition, so the local ``rank()`` within (pid, group) plus the
    count of same-group rows in earlier partitions IS the global rank
    (every earlier-partition row of the group is strictly smaller).
    Offsets table is P x |groups| rows — bounded."""
    n = _num_partitions(df, num_partitions)
    part = (
        df.repartitionByRange(n, F.col(group_col).asc(), order_col.asc())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = part.groupBy("__pid", group_col).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    woff = (
        Window.partitionBy(group_col)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__pid",
        group_col,
        F.coalesce(F.sum("__cnt").over(woff), F.lit(0))
        .cast("long")
        .alias("__off"),
    )
    wloc = Window.partitionBy("__pid", group_col).orderBy(order_col.asc())
    return (
        part.join(F.broadcast(offsets), ["__pid", group_col])
        .withColumn(out, (F.rank().over(wloc) + F.col("__off")).cast("long"))
        .drop("__pid", "__off")
    )
