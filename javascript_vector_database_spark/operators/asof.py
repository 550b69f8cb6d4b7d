"""As-of (backward) join and gap sessionization — event-pipeline
operators Spark lacks as built-ins, expressed as single-shuffle
DataFrame plans (no reference analog; SURVEY §7.7 extension surface).

* ``asof_join``: for each left row, the latest right row with
  ``right_ts <= left_ts`` per key.  Implemented as the union-merge plan:
  tag both sides, ONE shuffle on the key, one window sort, carry the
  right-side values forward with ``last(ignorenulls)`` — O(n log n/part)
  and no range-join blowup.  (A join + row_number plan shuffles twice and
  materializes every candidate pair; this shape is what Flink/kdb-style
  asof joins compile to.)
* ``sessionize``: split each key's event stream into sessions at
  inactivity gaps > ``gap``; session id = running count of gap breaks —
  one shuffle on the key, two window passes over the same sort (Spark
  reuses the exchange+sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    right_key: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join.  ``direction="backward"`` (default): latest right row
    with right_ts <= left_ts per key; ``"forward"``: earliest right row
    with right_ts >= left_ts (same union-merge single-shuffle plan, the
    sort simply runs descending so the carried value is the nearest
    FOLLOWING row).  Ties on right_ts resolve to the greatest of the
    first ``right_vals`` column (deterministic).  Left rows with no
    matching-side row keep NULLs.

    The right-side values are carried forward as ONE struct, so every
    output column comes from the SAME as-of row even when some of its
    value columns are NULL (carrying each column independently with
    ``last(ignorenulls)`` would splice stale values from older rows).
    """
    right_key = right_key or key
    clash = set(right_vals) & set(left.columns)
    if clash:
        raise ValueError(
            f"right_vals {sorted(clash)} collide with left columns; "
            "alias them on the right side before the as-of join"
        )
    r = right.select(
        F.col(right_key).alias(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in right_vals]).alias("__rv"),
    )
    l = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    )
    u = l.unionByName(r, allowMissingColumns=True)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    ts_ord = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy(key)
        .orderBy(
            ts_ord,
            F.col("__side").asc(),  # right rows first at equal ts (inclusive)
            # struct order = field order, so this is right_vals[0] asc first
            F.col("__rv").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u.withColumn("__rv", F.last(F.col("__rv"), ignorenulls=True).over(w))
    out = out.where(F.col("__side") == 1)
    for c in right_vals:
        out = out.withColumn(c, F.col("__rv").getField(c))
    return out.drop("__ts", "__side", "__rv")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Range join (point ∈ [lo, hi)) per key, as an EQUI-join: bucket the
    time axis, explode each interval to the buckets it spans, hash-join on
    (key, bucket), then apply the exact range filter.  Without this, Spark
    plans a non-equi join as BroadcastNestedLoopJoin — quadratic per key.
    ``bucket_seconds`` should be on the order of the typical interval
    length so each interval explodes to O(1) buckets."""
    bucket_us = bucket_seconds * 1_000_000

    def b(c):
        return F.floor(F.unix_micros(F.col(c)) / F.lit(bucket_us))

    pts = points.withColumn("__b", b(ts_col))
    ivs = intervals.withColumn(
        "__b", F.explode(F.sequence(b(lo_col), b(hi_col)))
    )
    return (
        pts.join(ivs, [key, "__b"])
        .where((F.col(ts_col) >= F.col(lo_col)) & (F.col(ts_col) < F.col(hi_col)))
        .drop("__b")
    )


def multires_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    fine: str = "minute",
    coarse: str = "hour",
) -> tuple[DataFrame, DataFrame]:
    """Hypertable-style continuous aggregate: aggregate the raw events ONCE
    at the fine grain, then derive every coarser resolution by
    re-aggregating the fine table — the raw table is scanned exactly once
    no matter how many resolutions are served (the TimescaleDB
    continuous-aggregate / OLAP rollup-cascade shape).  Values are summed
    as DECIMAL so re-aggregation is associative — coarse-from-fine is
    bit-equal to coarse-from-raw (the metamorphic oracle pins this).
    Returns (fine_df, coarse_df)."""
    val = F.col(value_col).cast("decimal(18,2)")
    fine_df = (
        events.groupBy(F.date_trunc(fine, F.col(ts_col)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(val).alias("total_value"),
        )
    )
    coarse_df = (
        fine_df.groupBy(F.date_trunc(coarse, F.col("bucket")).alias("bucket"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").alias("total_value"),
        )
    )
    return fine_df, coarse_df


def with_session_ids(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-EVENT session ids (the building block under :func:`sessionize`
    and the within-session analytics): the input plus a ``session_id``
    column — running count of >gap breaks over one (key)-sorted pass."""
    order = [F.col(ts_col).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    is_new = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col(ts_col)) - prev) > gap_seconds * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_id",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    key's previous event exceeds ``gap_seconds``.  Output: one row per
    session (key, session_id, n_events, session_start, session_end)."""
    with_sess = with_session_ids(events, key, ts_col, id_col, gap_seconds)
    return with_sess.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )
