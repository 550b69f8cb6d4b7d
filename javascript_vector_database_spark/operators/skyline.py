"""Distributed 2D skyline (Pareto frontier) — dominance without a
quadratic join and without a single-partition sort.

A point p is ON the skyline (minimizing both axes) iff no q exists with
``q.x <= p.x AND q.y <= p.y`` and strictly smaller in at least one axis.
The textbook form is a NOT EXISTS self-join — O(n^2) and the form the
DuckDB oracle runs verbatim.  At scale this runs as the sort-based
sweep, distributed with the same prefix construction as
``operators/rank.py`` (TeraSort trick):

1. per-x reduction: ``groupBy(x).min(y)`` — any point above its x's
   minimum y is dominated by that minimum (one shuffle, map-side
   partials, and x values are now UNIQUE, which makes the sweep's
   "strictly preceding x" exactly "preceding row");
2. ``repartitionByRange`` on x — partition *i* holds a contiguous
   slice of the x order (checkpoint-pinned so every consumer observes
   the same assignment);
3. survivor test ``y < prefix_min(y)`` where the prefix min composes a
   LOCAL running min (window over ``spark_partition_id()``, P parallel
   sweeps) with the broadcast running min of the PRECEDING partitions'
   per-partition minima (a window over <= P bounded rows — the only
   global window, same discipline as rank.py);
4. an equi-join back on (x, y) resurfaces duplicate copies of frontier
   points (equal points do not strictly dominate each other).

Everything is comparison-only (no arithmetic on the values), so the
result is exact for any numeric/orderable column type on any engine.
No reference analog (SURVEY §7.7 extension class — multi-objective
filtering for curation: "cheapest AND shortest", "newest AND highest
quality").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(
    df: DataFrame,
    x: str,
    y: str,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows of ``df`` on the minimizing skyline of ``(x, y)``.

    Returns the input rows (all columns, duplicates preserved) that no
    other row strictly dominates.  NULLs in either axis are dropped —
    dominance is undefined against missing coordinates."""
    pts = df.where(F.col(x).isNotNull() & F.col(y).isNotNull())
    if num_partitions is None:
        from javascript_vector_database_spark.session import (
            shuffle_partitions_or_default,
        )

        num_partitions = shuffle_partitions_or_default(df.sparkSession)
    # step 1: one candidate per x — the per-x minimum y
    cand = pts.groupBy(x).agg(F.min(y).alias("__y"))
    part = (
        cand.repartitionByRange(num_partitions, F.col(x).asc())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # step 3a: broadcast prefix min over the P per-partition minima
    pmins = part.groupBy("__pid").agg(F.min("__y").alias("__pmin"))
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    prefixes = pmins.select(
        "__pid", F.min("__pmin").over(woff).alias("__prev_min")
    )
    # step 3b: local strict-prefix running min (x unique => preceding
    # rows are exactly x' < x), composed with the preceding partitions'
    wloc = (
        Window.partitionBy("__pid")
        .orderBy(F.col(x).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        part.join(F.broadcast(prefixes), "__pid")
        .withColumn(
            "__prefix", F.least(F.min("__y").over(wloc), F.col("__prev_min"))
        )
        .where(F.col("__prefix").isNull() | (F.col("__y") < F.col("__prefix")))
        # fresh aliases: the grouped x keeps its upstream expression id,
        # so joining back against pts would be an ambiguous self-join
        .select(F.col(x).alias("__fx"), F.col("__y").alias("__fy"))
    )
    # step 4: resurface every copy of each frontier point.  The frontier
    # is usually tiny (O(log n) for independent dims) and AQE will pick
    # a broadcast semi-join on its own; no hint, so a pathological
    # all-frontier input degrades to a shuffle join instead of an OOM.
    return pts.join(
        frontier,
        (pts[x] == frontier["__fx"]) & (pts[y] == frontier["__fy"]),
        "left_semi",
    )


def skyline_2d_grouped(
    df: DataFrame,
    group: str,
    x: str,
    y: str,
) -> DataFrame:
    """Per-group 2D skyline: the rows of ``df`` on their OWN group's
    minimizing (x, y) frontier.

    Unlike the global form, the sweep here needs no range-partition
    machinery: the per-x reduction leaves x unique within each group, so
    one window PARTITIONED BY the group key (ordered by x, strict-prefix
    running min) is both exact and naturally distributed — the shuffle
    key is the group, and WindowExec sorts each group independently.
    Correct at scale when groups are plentiful; a single giant group
    degrades to that group's local sort (for that shape use the
    range-partitioned :func:`skyline_2d` per group instead)."""
    pts = df.where(F.col(x).isNotNull() & F.col(y).isNotNull())
    cand = pts.groupBy(group, x).agg(F.min(y).alias("__y"))
    wloc = (
        Window.partitionBy(group)
        .orderBy(F.col(x).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        cand.withColumn("__prefix", F.min("__y").over(wloc))
        .where(F.col("__prefix").isNull() | (F.col("__y") < F.col("__prefix")))
        .select(
            F.col(group).alias("__fg"),
            F.col(x).alias("__fx"),
            F.col("__y").alias("__fy"),
        )
    )
    return pts.join(
        frontier,
        (pts[group] == frontier["__fg"])
        & (pts[x] == frontier["__fx"])
        & (pts[y] == frontier["__fy"]),
        "left_semi",
    )
