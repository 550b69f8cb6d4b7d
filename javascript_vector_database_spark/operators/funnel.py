"""Ordered-funnel analysis over the events table (beyond-reference
analytics surface, the Amplitude/Mixpanel-style report).

``funnel_counts`` answers: how many users performed step 1, then step 2
STRICTLY AFTER their first step 1, then step 3 strictly after that —
the classic conversion funnel.  The earliest-completion cascade is used
(first s1, then first s2 after it, ...), which is complete: if ANY
strictly-ordered occurrence chain exists for a user, the greedy
earliest chain exists too (each greedy timestamp is <= the witness's,
so the next witness event still qualifies).

Scale shape: one filtered scan per step (same source, Catalyst reuses
the scan), each step a groupBy(user) min — map-side combined, shuffle
carries one row per user per step, joins are user-key equi-joins the
planner sizes (broadcast once the funnel narrows).  No window over the
full event stream, no per-user event-list materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step int, event_type string, n_users bigint): users whose
    earliest-completion chain reaches each step, strictly ordered."""
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(
        F.col(user_col).alias("u"), F.col(ts_col).alias("ts"),
        F.col(type_col).alias("t"),
    )
    reached: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, s in enumerate(steps):
        step_ev = ev.where(F.col("t") == s)
        if prev is None:
            cur = step_ev.groupBy("u").agg(F.min("ts").alias(f"t{i}"))
        else:
            cur = (
                step_ev.join(prev, "u")
                .where(F.col("ts") > F.col(f"t{i - 1}"))
                .groupBy("u")
                .agg(F.min("ts").alias(f"t{i}"))
            )
        reached.append(cur)
        prev = cur
    rows = None
    for i, (s, r) in enumerate(zip(steps, reached)):
        one = r.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit(i + 1).alias("step"), F.lit(s).alias("event_type"), "n_users"
        )
        rows = one if rows is None else rows.unionByName(one)
    return rows


def sql_funnel_counts(
    table: str,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB oracle: the same earliest-completion cascade."""
    ctes = []
    for i, s in enumerate(steps):
        if i == 0:
            ctes.append(
                f"u0 AS (SELECT {user_col} AS u, min({ts_col}) AS t0 "
                f"FROM {table} WHERE {type_col} = '{s}' GROUP BY 1)"
            )
        else:
            ctes.append(
                f"u{i} AS (SELECT e.{user_col} AS u, min(e.{ts_col}) AS t{i} "
                f"FROM {table} e JOIN u{i - 1} p ON p.u = e.{user_col} "
                f"WHERE e.{type_col} = '{s}' AND e.{ts_col} > p.t{i - 1} "
                f"GROUP BY 1)"
            )
    arms = [
        f"SELECT {i + 1} AS step, '{s}' AS event_type, "
        f"CAST(count(*) AS BIGINT) AS n_users FROM u{i}"
        for i, s in enumerate(steps)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(arms)


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: cohort = ISO week of the user's first
    event; for each (cohort_week, week_offset) the count of cohort users
    active in that week.  Output: (cohort_week date, week_offset int,
    n_users bigint).

    Scale shape: first-seen is one min groupBy(user) (map-side
    combined); per-user-week activity is a distinct over (user, week) —
    the shuffle carries one row per user-week, never raw events; the
    cohort join is user-key equi (broadcast once cohorts narrow).  All
    outputs are dates and integers — oracle-exact by construction."""
    first = events.groupBy(F.col(user_col).alias("u")).agg(
        F.date_trunc("week", F.min(ts_col)).cast("date").alias("cohort_week")
    )
    active = (
        events.select(
            F.col(user_col).alias("u"),
            F.date_trunc("week", F.col(ts_col)).cast("date").alias("w"),
        )
        .distinct()
    )
    return (
        active.join(first, "u")
        .select(
            "cohort_week",
            (F.datediff(F.col("w"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
            "u",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


def sql_retention_cohorts(
    table: str, user_col: str = "user_id", ts_col: str = "ts"
) -> str:
    """DuckDB oracle: same first-seen week, same distinct user-weeks,
    same integer offsets."""
    return f"""
WITH first AS (
  SELECT {user_col} AS u,
         CAST(date_trunc('week', min({ts_col})) AS DATE) AS cohort_week
  FROM {table} GROUP BY 1
),
active AS (
  SELECT DISTINCT {user_col} AS u,
         CAST(date_trunc('week', {ts_col}) AS DATE) AS w
  FROM {table}
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.w) / 7 AS INT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM active a JOIN first f USING (u)
GROUP BY 1, 2
"""


def funnel_latency(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step, from_type, to_type, n_users, avg_gap_s, max_gap_s): how
    long converting users take between consecutive funnel steps, from
    the same earliest-completion cascade as :func:`funnel_counts` (the
    greedy chain's timestamps are each user's EARLIEST legal chain, so
    the gaps are the canonical time-to-convert).  Gaps are exact integer
    seconds; only the avg division is float.  Same scale shape as the
    counts: one min-groupBy per step, user-key joins."""
    ev = events.select(
        F.col(user_col).alias("u"), F.col(ts_col).alias("ts"),
        F.col(type_col).alias("t"),
    )
    prev: DataFrame | None = None
    chain: list[DataFrame] = []
    for i, s in enumerate(steps):
        step_ev = ev.where(F.col("t") == s)
        if prev is None:
            cur = step_ev.groupBy("u").agg(F.min("ts").alias(f"t{i}"))
        else:
            cur = (
                step_ev.join(prev, "u")
                .where(F.col("ts") > F.col(f"t{i - 1}"))
                .groupBy("u")
                .agg(F.min("ts").alias(f"t{i}"))
            )
        if prev is not None:
            cur = cur.join(prev.select("u", f"t{i - 1}"), "u")
        chain.append(cur)
        prev = cur
    out = None
    for i in range(1, len(steps)):
        gap = F.col(f"t{i}").cast("long") - F.col(f"t{i - 1}").cast("long")
        one = chain[i].agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.round(F.sum(gap).cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_gap_s"
            ),
            F.max(gap).cast("bigint").alias("max_gap_s"),
        ).select(
            F.lit(i).alias("step"),
            F.lit(steps[i - 1]).alias("from_type"),
            F.lit(steps[i]).alias("to_type"),
            "n_users",
            "avg_gap_s",
            "max_gap_s",
        )
        out = one if out is None else out.unionByName(one)
    return out


def sql_funnel_latency(
    table: str,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB oracle for :func:`funnel_latency` (same cascade, same
    integer-second gaps)."""
    ctes = []
    for i, s in enumerate(steps):
        if i == 0:
            ctes.append(
                f"u0 AS (SELECT {user_col} AS u, min({ts_col}) AS t0 "
                f"FROM {table} WHERE {type_col} = '{s}' GROUP BY 1)"
            )
        else:
            ctes.append(
                f"u{i} AS (SELECT e.{user_col} AS u, p.t{i - 1}, "
                f"min(e.{ts_col}) AS t{i} "
                f"FROM {table} e JOIN u{i - 1} p ON p.u = e.{user_col} "
                f"WHERE e.{type_col} = '{s}' AND e.{ts_col} > p.t{i - 1} "
                f"GROUP BY 1, 2)"
            )
    arms = []
    for i in range(1, len(steps)):
        gap = (
            f"(CAST(floor(epoch(t{i})) AS BIGINT)"
            f" - CAST(floor(epoch(t{i - 1})) AS BIGINT))"
        )
        arms.append(
            f"SELECT {i} AS step, '{steps[i - 1]}' AS from_type, "
            f"'{steps[i]}' AS to_type, "
            f"CAST(count(*) AS BIGINT) AS n_users, "
            f"round(CAST(sum({gap}) AS DOUBLE) / count(*), 6) AS avg_gap_s, "
            f"CAST(max({gap}) AS BIGINT) AS max_gap_s FROM u{i}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(arms)
