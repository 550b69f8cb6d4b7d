"""§2.1 change-feed source + §2.9 state fold, batch-queryable shapes.

The reference's change feed is keyset pagination ordered by
``(_meta.lwt, id)`` with selector ``lwt > cp.lwt OR (lwt = cp.lwt AND
id > cp.id)`` (MAP#rxdb/dist/esm/rx-storage-helper.js:581-640).  The
events table's ``(ts, event_id)`` plays the (lwt, id) role here.  The same
predicate drives streaming/pipeline.py's checkpoint loop.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from javascript_vector_database_spark.registry import register
from javascript_vector_database_spark.tables import load_table

#: a mid-stream checkpoint for the oracle query (driver data starts
#: 2024-01-01; sf-independent)
_CP_TS = "2024-01-02 00:00:00"
_CP_ID = 0


def changed_since(
    df: DataFrame,
    lwt_col: str,
    id_col: str,
    cp_lwt,
    cp_id,
    limit: int | None = None,
) -> DataFrame:
    """getChangedDocumentsSince: keyset page after checkpoint (cp_lwt,
    cp_id), ordered by (lwt, id).  The predicate is sargable -> parquet
    min-max skipping prunes whole files below the checkpoint; at scale,
    partitioning the table by a time bucket of ``lwt_col`` makes this a
    partition-pruned incremental read (Delta CDF analog)."""
    after: Column = (F.col(lwt_col) > F.lit(cp_lwt)) | (
        (F.col(lwt_col) == F.lit(cp_lwt)) & (F.col(id_col) > F.lit(cp_id))
    )
    out = df.where(after).orderBy(F.col(lwt_col).asc(), F.col(id_col).asc())
    if limit is not None:
        out = out.limit(limit)
    return out


@register(
    "changefeed_page",
    oracle=f"""
SELECT event_id, ts, user_id, event_type
FROM events
WHERE ts > TIMESTAMP '{_CP_TS}' OR (ts = TIMESTAMP '{_CP_TS}' AND event_id > {_CP_ID})
ORDER BY ts ASC, event_id ASC
LIMIT 100
""",
)
def changefeed_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One change-feed page: 100 docs changed since the checkpoint."""
    ev = load_table(spark, sf_dir, "events")
    return changed_since(
        ev, "ts", "event_id", _CP_TS, _CP_ID, limit=100
    ).select("event_id", "ts", "user_id", "event_type")


@register(
    "state_fold_last_per_user",
    oracle="""
SELECT user_id,
       value AS last_value,
       event_type AS last_type,
       n_ops
FROM (
    SELECT user_id, value, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n_ops
    FROM events
)
WHERE rn = 1
""",
)
def state_fold_last_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RxState semantics: state = fold of the op-log in (id) order, i.e.
    last write wins per key (MAP#rxdb/dist/esm/plugins/state/rx-state.js:
    46-116).  Expressed as max_by over the (lwt, id) ordering struct —
    one shuffle, map-side combine."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.max_by("value", key).alias("last_value"),
        F.max_by("event_type", key).alias("last_type"),
        F.count(F.lit(1)).alias("n_ops"),
    )


# ---------------------------------------------------------------------------
# event-pipeline extensions: sessionization + as-of join
# ---------------------------------------------------------------------------

_SESSION_GAP = 1800  # 30 min

_SESSIONIZE_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > {_SESSION_GAP} * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sess AS (
  SELECT user_id, ts,
         -- DuckDB windowed sum() yields HUGEINT (float64 via pandas); the
         -- Spark plan's session_id is BIGINT — cast so the canonical hash
         -- compares 3 vs 3, not 3.0 vs 3.
         CAST(sum(is_new) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM marked
)
SELECT user_id, session_id,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end
FROM sess GROUP BY user_id, session_id
"""


@register("events_sessionize", oracle=_SESSIONIZE_ORACLE)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): one shuffle on
    user_id, two window passes over one sort (exchange reuse)."""
    from javascript_vector_database_spark.operators.asof import sessionize

    return sessionize(load_table(spark, sf_dir, "events"))


_ASOF_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
  FROM (
    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey, o_orderdate
                              ORDER BY o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
)
SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice
FROM events e
ASOF LEFT JOIN o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


@register("events_asof_join", oracle=_ASOF_ORACLE)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each event matched with the user's latest
    order at-or-before the event time — the union-merge single-shuffle
    plan (operators/asof.py), checked against DuckDB's native ASOF JOIN."""
    from javascript_vector_database_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    # one row per (custkey, orderdate): max orderkey wins, like the plan's
    # deterministic tie-break.  max_by hash-aggregates with map-side
    # partials — no per-partition sort like the row_number window needs,
    # and orderkey is the table's unique pk so the argmax is well-defined
    orders = load_table(spark, sf_dir, "orders")
    o = (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
    )
    return asof_join(
        ev, o,
        key="user_id", left_ts="ts", right_ts="o_orderdate",
        right_vals=["o_orderkey", "o_totalprice"], right_key="o_custkey",
    ).select("event_id", "user_id", "ts", "o_orderkey", "o_totalprice")


_RANGE_JOIN_ORACLE = """
SELECT i.event_id AS incident_id, e.event_id, e.user_id
FROM events e
JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') i
  ON e.user_id = i.user_id
 AND e.ts >= i.ts AND e.ts < i.ts + INTERVAL 1 HOUR
"""


@register("events_range_join", oracle=_RANGE_JOIN_ORACLE)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: every event falling inside the 1-hour
    incident window opened by each error event of the same user.  Bucketed
    equi-join plan (operators/asof.py::point_in_interval_join) — a plain
    non-equi join here would be a nested-loop blowup."""
    from javascript_vector_database_spark.operators.asof import (
        point_in_interval_join,
    )

    ev = load_table(spark, sf_dir, "events")
    points = ev.select("event_id", "user_id", "ts")
    incidents = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("user_id"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("win_end"),
    )
    return point_in_interval_join(
        points, incidents, key="user_id",
        ts_col="ts", lo_col="win_start", hi_col="win_end",
    ).select("incident_id", "event_id", "user_id")


_SESSION_WINDOW_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > {_SESSION_GAP} * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sess AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM marked
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL {_SESSION_GAP} SECOND AS session_end,
       count(*) AS n_events
FROM sess GROUP BY user_id, session_id
"""


@register("events_session_window_agg", oracle=_SESSION_WINDOW_ORACLE)
def events_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUILT-IN sessionization: ``F.session_window`` merges events
    within the 30-min gap — same sessions as the two-window-pass
    operators/asof.py::sessionize plan (the oracle is that plan's CTE
    with the session-window end convention ``last_event + gap``).  In
    streaming mode the identical expression runs over the state store
    with watermark-based eviction; in batch it is one shuffle on
    (user_id)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window(F.col("ts"), f"{_SESSION_GAP} seconds"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


_ROLLUP_MULTIRES_ORACLE = """
SELECT date_trunc('hour', ts) AS bucket,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS total_value
FROM events
GROUP BY 1
"""


@register("events_rollup_multires", oracle=_ROLLUP_MULTIRES_ORACLE)
def events_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the hour level is derived by
    RE-AGGREGATING the minute-level rollup, never by re-scanning raw
    events — the oracle aggregates raw→hour directly, so a green row
    proves the rollup cascade is lossless (decimal sums keep
    re-aggregation associative)."""
    from javascript_vector_database_spark.operators.asof import multires_rollup

    _minute, hour = multires_rollup(load_table(spark, sf_dir, "events"))
    return hour.select(
        "bucket",
        "n_events",
        F.round(F.col("total_value").cast("double"), 2).alias("total_value"),
    )


def _kmv_oracle() -> str:
    from javascript_vector_database_spark.operators.sketch import (
        sql_kmv_distinct_estimate,
    )

    return sql_kmv_distinct_estimate("events", "user_id")


@register("sketch_kmv_distinct_users", oracle=_kmv_oracle())
def sketch_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch over event users — deterministic (md5
    K-minimum-values), so unlike HLL the estimate itself is
    oracle-checked.  Scan-side hashing, map-side-combined distinct,
    TakeOrdered K-min merge."""
    from javascript_vector_database_spark.operators.sketch import (
        kmv_distinct_estimate,
    )

    return kmv_distinct_estimate(
        load_table(spark, sf_dir, "events"), "user_id"
    )


def _hll_oracle() -> str:
    from javascript_vector_database_spark.operators.sketch import (
        sql_hll_distinct_estimate,
    )

    return sql_hll_distinct_estimate("events", "user_id")


@register("sketch_hll_distinct_users", oracle=_hll_oracle())
def sketch_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog with deterministic md5 registers — the mergeable
    fixed-size counterpart to KMV: the shuffle carries at most 256
    (bucket, max-rank) rows per partition regardless of cardinality,
    where KMV's distinct-by-hash carries one row per distinct value.
    Both engines derive identical registers, so even this HLL estimate
    is value-hash oracle-checked (impossible with the engine-private
    approx_count_distinct layout)."""
    from javascript_vector_database_spark.operators.sketch import (
        hll_distinct_estimate,
    )

    return hll_distinct_estimate(
        load_table(spark, sf_dir, "events"), "user_id"
    )


def _hll_grouped_oracle() -> str:
    from javascript_vector_database_spark.operators.sketch import (
        sql_hll_grouped_estimate,
    )

    return sql_hll_grouped_estimate("events", "user_id", "event_type")


@register("sketch_hll_users_by_type", oracle=_hll_grouped_oracle())
def sketch_hll_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user estimates from persistable register
    tables — the mergeable-sketch deployment shape: materialize
    (group, b, M) registers once at ingest (≤256 rows per group), answer
    any later distinct-count by folding registers, never rescanning the
    events.  Register derivation and fold are the deterministic HLL of
    sketch_hll_distinct_users, so every per-group estimate is
    value-hash oracle-checked."""
    from javascript_vector_database_spark.operators.sketch import (
        hll_estimate_from_registers,
        hll_registers,
    )

    ev = load_table(spark, sf_dir, "events")
    regs = hll_registers(ev, "user_id", ["event_type"])
    return hll_estimate_from_registers(regs, ["event_type"])


# ---------------------------------------------------------------------------
# §2.9 reactive query (event-reduce IVM) + §2.4 incremental count
# ---------------------------------------------------------------------------
#
# Scripted change-bulk sequence, derived from the documents table so both
# engines reproduce it:
#   bulk 1 (lwt=1): insert every document
#   bulk 2 (lwt=2): update docs with doc_id%5==0 — lang becomes 'en' when
#                   doc_id%10==0 else 'xx', n_chars += 1000 (drives both
#                   enter-result and leave-result transitions)
#   bulk 3 (lwt=3): soft-delete docs with doc_id%13==0
# Live query: selector {lang: {$eq: 'en'}} — the maintained result set and
# the ±1-per-transition count are folded bulk-by-bulk by ReactiveQuery,
# never by re-scanning the collection.

_REACTIVE_FINAL_CTE = """
final AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN (CASE WHEN doc_id % 10 = 0 THEN 'en' ELSE 'xx' END)
              ELSE lang END AS lang,
         CASE WHEN doc_id % 5 = 0 THEN n_chars + 1000 ELSE n_chars END
           AS n_chars,
         (doc_id % 13 = 0) AS deleted
  FROM documents
)"""


def _run_reactive_script(
    spark: SparkSession,
    sf_dir: str,
    sort: list[tuple[str, str]] | None = None,
    limit: int | None = None,
):
    from javascript_vector_database_spark.streaming.reactive import ReactiveQuery

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    workdir = tempfile.mkdtemp(prefix="reactive_ivm_")
    rq = ReactiveQuery(
        spark, {"lang": {"$eq": "en"}}, workdir, id_col="doc_id",
        sort=sort, limit=limit,
    )
    bulk1 = docs.withColumn("_deleted", F.lit(False)).withColumn(
        "_lwt", F.lit(1.0)
    )
    rq.apply_changes(bulk1)
    bulk2 = (
        docs.where(F.col("doc_id") % 5 == 0)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 10 == 0, F.lit("en"))
            .otherwise(F.lit("xx"))
            .alias("lang"),
            (F.col("n_chars") + 1000).alias("n_chars"),
        )
        .withColumn("_deleted", F.lit(False))
        .withColumn("_lwt", F.lit(2.0))
    )
    rq.apply_changes(bulk2)
    bulk3 = (
        docs.where(F.col("doc_id") % 13 == 0)
        .withColumn("_deleted", F.lit(True))
        .withColumn("_lwt", F.lit(3.0))
    )
    rq.apply_changes(bulk3)
    return rq


@register(
    "reactive_query_ivm",
    oracle=f"""
WITH {_REACTIVE_FINAL_CTE}
SELECT doc_id, lang, n_chars FROM final WHERE NOT deleted AND lang = 'en'
""",
)
def reactive_query_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-reduce IVM (MAP#rxdb/dist/esm/rx-query.js:401-491): the live
    query's maintained result set after folding three change bulks —
    each fold touches only the bulk and the result table."""
    rq = _run_reactive_script(spark, sf_dir)
    return rq.results().select("doc_id", "lang", "n_chars")


@register(
    "reactive_topk_ivm",
    oracle=f"""
WITH {_REACTIVE_FINAL_CTE}
SELECT doc_id, lang, n_chars FROM final WHERE NOT deleted AND lang = 'en'
ORDER BY n_chars DESC, doc_id ASC LIMIT 20
""",
)
def reactive_topk_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted+limited live query (the runFullQueryAgain surface,
    MAP#rxdb/dist/esm/event-reduce.js:83-90): the maintained BOUNDED view
    after the same three change bulks — bulk 3's soft-deletes shrink the
    emission and trigger the bounded re-run over the maintained match set
    (never the base collection scan)."""
    rq = _run_reactive_script(
        spark, sf_dir, sort=[("n_chars", "desc")], limit=20
    )
    return rq.results().select("doc_id", "lang", "n_chars")


@register(
    "reactive_count_ivm",
    oracle=f"""
WITH {_REACTIVE_FINAL_CTE}
SELECT count(*) AS n_results FROM final WHERE NOT deleted AND lang = 'en'
""",
)
def reactive_count_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental count maintenance (MAP#rxdb/dist/esm/rx-query.js:
    432-449): the count is bumped ±1 per matching state transition per
    bulk, never recomputed — the returned value is the maintained
    counter, not an aggregate over the result."""
    rq = _run_reactive_script(spark, sf_dir)
    return spark.createDataFrame([(rq.count(),)], "n_results long")


FUNNEL_STEPS = ["view", "click", "purchase"]


def _funnel_oracle() -> str:
    from javascript_vector_database_spark.operators.funnel import (
        sql_funnel_counts,
    )

    return sql_funnel_counts("events", FUNNEL_STEPS)


@register("events_funnel_counts", oracle=_funnel_oracle())
def events_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase conversion funnel via the
    earliest-completion cascade: per step one min-ts groupBy(user)
    (map-side combined) joined against the previous step — no window
    over the raw stream, shuffle carries one row per user per step."""
    from javascript_vector_database_spark.operators.funnel import (
        funnel_counts,
    )

    return funnel_counts(load_table(spark, sf_dir, "events"), FUNNEL_STEPS)


def _retention_oracle() -> str:
    from javascript_vector_database_spark.operators.funnel import (
        sql_retention_cohorts,
    )

    return sql_retention_cohorts("events")


@register("events_retention_cohorts", oracle=_retention_oracle())
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle (cohort = first-event week): the other
    canonical event-analytics report beside the funnel.  One min-groupBy
    for first-seen, one distinct over (user, week) — the shuffle never
    carries raw events."""
    from javascript_vector_database_spark.operators.funnel import (
        retention_cohorts,
    )

    return retention_cohorts(load_table(spark, sf_dir, "events"))


_HOP_SLIDE = 900  # 15 min
_HOP_DURATION = 3600  # 1 hour -> each event lands in 4 overlapping windows

_HOPPING_ORACLE = f"""
WITH x AS (
  SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / {_HOP_SLIDE}) * {_HOP_SLIDE}
                                - k * {_HOP_SLIDE} AS BIGINT)) AS TIMESTAMP)
           AS win_start,
         user_id
  FROM events,
       LATERAL unnest(range(0, {_HOP_DURATION // _HOP_SLIDE})) AS t(k)
)
SELECT win_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM x GROUP BY 1
"""


@register("events_hopping_window_agg", oracle=_HOPPING_ORACLE)
def events_hopping_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows — the third window flavor beside
    tumbling (events_windowed_agg) and session
    (events_session_window_agg): 1-hour windows every 15 minutes, so
    each event contributes to duration/slide = 4 overlapping windows.
    Spark's window() explodes the assignment row-locally before the
    aggregation shuffle (map-side combine still applies); the same plan
    runs under readStream + watermark."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window(F.col("ts"), f"{_HOP_DURATION} seconds", f"{_HOP_SLIDE} seconds").alias("w")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .select(F.col("w.start").alias("win_start"), "n_events", "n_users")
    )


_ANOMALY_TRAIL = 24  # trailing hours in the baseline window
_ANOMALY_Z = 2.0

_ANOMALY_ORACLE = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, count(*) AS n
  FROM events GROUP BY 1
),
w AS (
  SELECT hour, n,
         count(*)      OVER t AS cnt,
         sum(n)        OVER t AS s,
         sum(n * n)    OVER t AS sq
  FROM hourly
  WINDOW t AS (ORDER BY hour ASC
               ROWS BETWEEN {_ANOMALY_TRAIL} PRECEDING AND 1 PRECEDING)
),
z AS (
  SELECT hour, CAST(n AS BIGINT) AS n_events,
         CAST(s AS DOUBLE) / cnt AS mean,
         sqrt((sq - CAST(s AS DOUBLE) * s / cnt) / (cnt - 1)) AS std
  FROM w WHERE cnt >= 2
)
SELECT hour, n_events,
       round(mean, 4) AS baseline_mean,
       round((n_events - mean) / std, 4) AS zscore
FROM z
WHERE std > 0 AND abs((n_events - mean) / std) >= {_ANOMALY_Z}
"""


@register("events_anomaly_hours", oracle=_ANOMALY_ORACLE)
def events_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours whose event volume deviates >= 2 sigma from the trailing
    24-hour baseline — windowed anomaly detection with DETERMINISTIC
    float math: the baseline mean/std derive from integer window sums
    (count, sum, sum of squares over hourly COUNTS), so every double op
    is an exact-input IEEE operation both engines reproduce — no
    order-dependent double accumulation anywhere.  One hourly pre-
    aggregation (map-side combined) then one ordered window over ~hours
    rows: the window input is already reduced, never raw events."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    t = (
        Window.orderBy(F.col("hour").asc())
        .rowsBetween(-_ANOMALY_TRAIL, -1)
    )
    w = hourly.select(
        "hour",
        "n",
        F.count(F.lit(1)).over(t).alias("cnt"),
        F.sum("n").over(t).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(t).alias("sq"),
    ).where(F.col("cnt") >= 2)
    mean = F.col("s").cast("double") / F.col("cnt")
    std = F.sqrt(
        (F.col("sq") - F.col("s").cast("double") * F.col("s") / F.col("cnt"))
        / (F.col("cnt") - 1)
    )
    z = (F.col("n") - mean) / std
    return (
        w.select(
            "hour",
            F.col("n").cast("bigint").alias("n_events"),
            F.round(mean, 4).alias("baseline_mean"),
            F.round(z, 4).alias("zscore"),
            std.alias("__std"),
            z.alias("__z"),
        )
        .where((F.col("__std") > 0) & (F.abs(F.col("__z")) >= _ANOMALY_Z))
        .drop("__std", "__z")
    )


# ---------------------------------------------------------------------------
# gaps-and-islands (SCD2-style state intervals) + gap-fill/forward-fill
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
runs AS (
  SELECT user_id, event_type, ts,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged
),
islands AS (
  SELECT user_id, event_type AS state, CAST(run_id AS BIGINT) AS run_id,
         min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
  FROM runs GROUP BY 1, 2, 3
)
SELECT user_id, state, run_id, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id ASC)
         AS valid_to,
       n_events
FROM islands
"""


@register("events_scd2_state_intervals", oracle=_SCD2_ORACLE)
def events_scd2_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands -> SCD2 history: collapse each user's event
    stream into runs of the same event_type and emit one validity
    interval per run (valid_from, valid_to = next run's start, NULL for
    the open current state) — the slowly-changing-dimension type-2 table
    a warehouse derives from a change stream.

    Plan: the lag-flag and the running change-count ride ONE
    (user_id)-partitioned sort (Spark reuses the exchange+sort between
    the two windows); the island groupBy and the lead() then operate on
    one row per RUN, not per event — so only the first window ever sees
    raw-event volume.  ``IS DISTINCT FROM`` semantics are mirrored via
    the null-safe equality in Spark."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    flagged = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("event_type").over(w).eqNullSafe(F.col("event_type")),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("chg"),
    )
    runs = flagged.select(
        "user_id",
        "event_type",
        "ts",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("run_id"),
    )
    islands = (
        runs.groupBy("user_id", F.col("event_type").alias("state"), "run_id")
        .agg(
            F.min("ts").alias("valid_from"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .withColumn("run_id", F.col("run_id").cast("bigint"))
    )
    wl = Window.partitionBy("user_id").orderBy(F.col("run_id").asc())
    return islands.select(
        "user_id",
        "state",
        "run_id",
        "valid_from",
        F.lead("valid_from").over(wl).alias("valid_to"),
        "n_events",
    )


_GAPFILL_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS n,
         round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS hr_value
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT event_type, min(hour) AS mn, max(hour) AS mx
           FROM hourly GROUP BY 1),
spine AS (
  SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour
  FROM bounds
)
SELECT s.event_type, s.hour,
       coalesce(h.n, 0) AS n_events,
       last_value(h.hr_value IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.hour ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM spine s
LEFT JOIN hourly h ON h.event_type = s.event_type AND h.hour = s.hour
"""


@register("events_gapfill_hourly", oracle=_GAPFILL_ORACLE)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill + forward-fill: a dense per-type hourly spine
    (``sequence``/``explode`` from each type's observed min/max hour —
    built from the AGGREGATE, so no join against raw events is ever
    needed for the spine), left-joined to the hourly rollup; missing
    hours get count 0 and carry the last observed hourly value forward
    via ``last(ignorenulls)``.

    Scale shape: raw events are touched exactly once (the hourly
    rollup's map-side-combined groupBy); everything after operates on
    O(types x hours) rows.  The fill value is rounded BEFORE the fill,
    so both engines forward identical doubles."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("hr_value"),
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hour").alias("mn"), F.max("hour").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("hour").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(hourly, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
        F.last("hr_value", ignorenulls=True).over(w).alias("filled_value"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch token frequencies
# ---------------------------------------------------------------------------

#: fixed probe set: frequent corpus tokens + one guaranteed-absent token
#: (pins the absent->0 estimate path)
CMS_PROBE_TOKENS = (
    "join",
    "hash",
    "row",
    "batch",
    "filter",
    "merge",
    "zz_absent_token",
)


def _cms_oracle() -> str:
    from javascript_vector_database_spark.functions.text import (
        sql_word_tokens,
    )
    from javascript_vector_database_spark.operators.sketch import (
        sql_cms_token_freq,
    )

    return sql_cms_token_freq(
        "documents", sql_word_tokens("text"), CMS_PROBE_TOKENS
    )


@register("sketch_cms_token_freq", oracle=_cms_oracle())
def sketch_cms_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point-frequency estimates vs exact counts for a fixed
    probe set: (tok, est_count, exact_count).  est >= exact always (CMS
    only overcounts); the deterministic md5 double-hashing makes the
    ESTIMATE itself oracle-checkable, like the KMV/HLL sketches above.
    The sketch build touches the token stream once (d-way row-local
    fan-out, one ≤ d*w-key shuffle with map-side partials); the probe
    and the exact comparison counts are broadcast-joined."""
    from javascript_vector_database_spark.functions.text import word_tokens
    from javascript_vector_database_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )
    from javascript_vector_database_spark.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(word_tokens("text")).alias("tok"))
    counters = cms_counters(toks, "tok")
    qdf = spark.createDataFrame([(t,) for t in CMS_PROBE_TOKENS], ["tok"])
    est = cms_estimate(counters, qdf, "tok")
    exact = (
        toks.where(F.col("tok").isin(*CMS_PROBE_TOKENS))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
    )
    return est.join(F.broadcast(exact), "tok", "left").select(
        "tok",
        "est_count",
        F.coalesce("exact_count", F.lit(0)).cast("long").alias("exact_count"),
    )


def _hist_q_oracle() -> str:
    from javascript_vector_database_spark.operators.sketch import (
        sql_histogram_quantiles,
    )

    return sql_histogram_quantiles("documents", "n_chars")


@register("sketch_histogram_quantiles", oracle=_hist_q_oracle())
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimates (p50/p90/p99 of document length) from a
    mergeable fixed-bin histogram sketch — the persistable counterpart
    of the exact profile_length_quantiles: bins merge across splits by
    integer addition, the estimate is located by an integer rank
    comparison and one deterministic interpolation (see
    operators/sketch.py)."""
    from javascript_vector_database_spark.operators.sketch import (
        histogram_quantiles,
    )

    return histogram_quantiles(
        load_table(spark, sf_dir, "documents"), "n_chars"
    )


# ---------------------------------------------------------------------------
# closed-form regression analytics over hourly event series
# ---------------------------------------------------------------------------

#: fixed epoch origin for hour indices (a query constant, not derived
#: from data — keeps x values small and identical on both engines)
_TREND_EPOCH = "2024-01-01 00:00:00"

_TREND_ORACLE = f"""
WITH hourly AS (
  SELECT event_type,
         CAST(floor((epoch(ts) - epoch(TIMESTAMP '{_TREND_EPOCH}')) / 3600)
              AS BIGINT) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM hourly GROUP BY 1
)
SELECT event_type, n AS n_hours,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (n * sxx - sx * sx), 6) AS slope,
       round((CAST(sy AS DOUBLE)
              - (CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)) * sx)
             / n, 6) AS intercept
FROM s
"""


@register("events_hourly_trend", oracle=_TREND_ORACLE)
def events_hourly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type least-squares trend of hourly event volume — closed-form
    regression from FOUR exact integer sums (n, Σx, Σy, Σxy, Σxx), so
    the only float ops are the final divisions (identical IEEE
    expressions on both engines; a streaming agg of the same five
    integers maintains the trend incrementally).  Two map-side-combined
    groupBys, key domains (type, hour) then (type)."""
    ev = load_table(spark, sf_dir, "events")
    x = F.floor(
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lit(_TREND_EPOCH).cast("timestamp"))
        )
        / 3600
    ).cast("long")
    hourly = ev.groupBy("event_type", x.alias("x")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    s = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return s.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n"), 6
        ).alias("intercept"),
    )


_CORR_ORACLE = f"""
WITH hourly AS (
  SELECT event_type,
         CAST(floor((epoch(ts) - epoch(TIMESTAMP '{_TREND_EPOCH}')) / 3600)
              AS BIGINT) AS h,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         CAST(sum(y) AS BIGINT) AS s1,
         CAST(sum(y * y) AS BIGINT) AS s2,
         min(h) AS mn, max(h) AS mx
  FROM hourly GROUP BY 1
),
sab AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(sum(a.y * b.y) AS BIGINT) AS sab
  FROM hourly a JOIN hourly b
    ON a.h = b.h AND a.event_type < b.event_type
  GROUP BY 1, 2
),
j AS (
  SELECT sab.type_a, sab.type_b, sab.sab,
         sa.s1 AS sa, sa.s2 AS saa, sb.s1 AS sb, sb.s2 AS sbb,
         min(least(sa.mn, sb.mn)) OVER () AS gmn,
         max(greatest(sa.mx, sb.mx)) OVER () AS gmx
  FROM sab
  JOIN stats sa ON sa.event_type = sab.type_a
  JOIN stats sb ON sb.event_type = sab.type_b
)
SELECT type_a, type_b,
       round(CAST(n * sab - sa * sb AS DOUBLE)
             / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
                * sqrt(CAST(n * sbb - sb * sb AS DOUBLE))), 6) AS pearson_r
FROM (SELECT *, gmx - gmn + 1 AS n FROM j)
"""


@register("events_corr_pairs", oracle=_CORR_ORACLE)
def events_corr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between event types' hourly series —
    SPARSE algebra: a missing hour is an exact 0, and 0 contributes
    nothing to any moment, so no dense spine is ever materialized.
    sum(ya*yb) comes from an equi-join of the sparse hourly tables on
    the hour; per-type sums from one groupBy; the global hour count n
    from a window over the (types^2/2)-row pair frame.  All moments are
    exact integers; the denominator is sqrt(a)*sqrt(b) — the same
    expression shape on both engines (IEEE-correctly-rounded sqrt), so
    the doubles agree bit-for-bit.  Pairs that never co-occur in any
    hour are absent by construction (mirrored in the oracle)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    h = F.floor(
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lit(_TREND_EPOCH).cast("timestamp"))
        )
        / 3600
    ).cast("long")
    hourly = ev.groupBy("event_type", h.alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    stats = hourly.groupBy("event_type").agg(
        F.sum("y").cast("long").alias("s1"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("s2"),
        F.min("h").alias("mn"),
        F.max("h").alias("mx"),
    )
    a = hourly.select(
        F.col("event_type").alias("type_a"), "h", F.col("y").alias("ya")
    )
    b = hourly.select(
        F.col("event_type").alias("type_b"), "h", F.col("y").alias("yb")
    )
    sab = (
        a.join(b, "h")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.sum(F.col("ya") * F.col("yb")).cast("long").alias("sab"))
    )
    sa = stats.select(
        F.col("event_type").alias("type_a"),
        F.col("s1").alias("sa"),
        F.col("s2").alias("saa"),
        F.col("mn").alias("mn_a"),
        F.col("mx").alias("mx_a"),
    )
    sb = stats.select(
        F.col("event_type").alias("type_b"),
        F.col("s1").alias("sb"),
        F.col("s2").alias("sbb"),
        F.col("mn").alias("mn_b"),
        F.col("mx").alias("mx_b"),
    )
    w = Window.partitionBy()
    j = (
        sab.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .withColumn(
            "n",
            F.max(F.greatest("mx_a", "mx_b")).over(w)
            - F.min(F.least("mn_a", "mn_b")).over(w)
            + 1,
        )
    )
    num = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
    ) * F.sqrt(
        (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")
    )
    return j.select(
        "type_a", "type_b", F.round(num / den, 6).alias("pearson_r")
    )


def _funnel_latency_oracle() -> str:
    from javascript_vector_database_spark.operators.funnel import (
        sql_funnel_latency,
    )

    return sql_funnel_latency("events", FUNNEL_STEPS)


@register("events_funnel_latency", oracle=_funnel_latency_oracle())
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert between consecutive funnel steps (the report
    beside events_funnel_counts): per transition, converting users'
    count, average and max gap in exact integer seconds from the same
    earliest-completion cascade."""
    from javascript_vector_database_spark.operators.funnel import (
        funnel_latency,
    )

    return funnel_latency(load_table(spark, sf_dir, "events"), FUNNEL_STEPS)


_ASOF_FWD_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
  FROM (
    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey, o_orderdate
                              ORDER BY o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
)
SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice
FROM events e
ASOF LEFT JOIN o
  ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
"""


@register("events_asof_join_forward", oracle=_ASOF_FWD_ORACLE)
def events_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — each event matched with the user's earliest
    order at-or-after the event time (the lead-time question backward
    as-of cannot answer; the pair completes the kdb aj/af surface).
    Identical union-merge single-shuffle plan, descending sort; checked
    against DuckDB's native forward ASOF JOIN."""
    from javascript_vector_database_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders")
    o = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("o_orderkey"),
        F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
    )
    return asof_join(
        ev, o,
        key="user_id", left_ts="ts", right_ts="o_orderdate",
        right_vals=["o_orderkey", "o_totalprice"], right_key="o_custkey",
        direction="forward",
    ).select("event_id", "user_id", "ts", "o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# Markov transition matrix + integer CUSUM changepoint alarms
# ---------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS from_type,
         event_type AS to_type
  FROM events
),
c AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2
),
t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
SELECT c.from_type, c.to_type, c.n,
       floor(CAST(c.n * 1000000 AS DOUBLE) / t.tot) / 1000000.0 AS p
FROM c JOIN t USING (from_type)
"""


@register("events_markov_transitions", oracle=_MARKOV_ORACLE)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types over each
    user's ordered stream: one (user)-sorted lag, one count groupBy over
    the types^2 key domain, probabilities floored at micro precision
    (the tie-free division discipline — n/tot can terminate exactly on
    a rounding boundary where the engines' round() modes disagree)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    c = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = c.groupBy("from_type").agg(F.sum("n").cast("long").alias("tot"))
    return c.join(F.broadcast(t), "from_type").select(
        "from_type",
        "to_type",
        "n",
        (
            F.floor((F.col("n") * 1000000).cast("double") / F.col("tot"))
            / F.lit(1000000.0)
        ).alias("p"),
    )


#: CUSUM alarm threshold in units of H (i.e., cumulative extra events
#: above the per-type mean before an alarm fires)
_CUSUM_K = 25

_CUSUM_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nh,
               CAST(sum(y) AS BIGINT) AS t
        FROM hourly GROUP BY 1),
p AS (
  SELECT h.event_type, h.h, t.nh,
         sum(t.nh * h.y - t.t) OVER (PARTITION BY h.event_type
                                     ORDER BY h.h ASC
                                     ROWS UNBOUNDED PRECEDING) AS pf
  FROM hourly h JOIN tot t USING (event_type)
),
c AS (
  -- least(0, ...) admits the EMPTY prefix P_0 = 0 (the CUSUM
  -- recursion starts at s_0 = 0), else early sustained shifts whose
  -- whole prefix drifts positive are understated
  SELECT event_type, h, nh,
         pf - least(0, min(pf) OVER (PARTITION BY event_type ORDER BY h ASC
                                     ROWS UNBOUNDED PRECEDING)) AS s
  FROM p
)
SELECT event_type, h AS hour, CAST(s AS BIGINT) AS cusum
FROM c WHERE s >= {_CUSUM_K} * nh
"""


@register("events_cusum_alarms", oracle=_CUSUM_ORACLE)
def events_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint alarms over hourly volume, fully
    integer: the drift term is nh*y - total (mean-zero without any
    division), and the nonlinear CUSUM recursion
    s_t = max(0, s_{t-1} + d_t) is rewritten via the prefix-min
    identity s_t = P_t - min_{0<=j<=t} P_j with P_0 = 0 (the empty
    prefix belongs in the min because the recursion starts at
    s_0 = 0) — two stacked windows on ONE sorted pass, no iterative
    fold.  Alarms fire when the statistic
    exceeds {_CUSUM_K} cumulative extra events (in nh units).  The
    sequential-detection complement of events_anomaly_hours'
    sliding z-score (CUSUM catches small SUSTAINED shifts).

    Skew routing (rank.py's note, applied here): the window input is the
    per-type HOURLY rollup, so a partition holds at most the calendar's
    hour count — bounded for any corpus size.  If the scan grain were
    unbounded per group (event-grain CUSUM, or one group dominating),
    route both stacked windows through the two-phase grouped scans
    instead: operators/prefix.grouped_prefix_sum for P_t and
    grouped_prefix_min for min_{{j<=t}} P_j — identical values, P
    parallel local scans per group (pinned equal on a single-group
    corpus in tests/test_relational_feed.py)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    tot = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nh"),
        F.sum("y").cast("long").alias("t"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("h").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = hourly.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "h",
        "nh",
        F.sum(F.col("nh") * F.col("y") - F.col("t")).over(w).alias("pf"),
    )
    c = p.select(
        "event_type",
        "h",
        "nh",
        (
            F.col("pf")
            - F.least(F.lit(0).cast("long"), F.min("pf").over(w))
        ).alias("s"),
    )
    return c.where(F.col("s") >= _CUSUM_K * F.col("nh")).select(
        "event_type", F.col("h").alias("hour"), F.col("s").cast("bigint").alias("cusum")
    )


_SESSION_FUNNEL_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > {_SESSION_GAP} * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sess AS (
  SELECT user_id, ts, event_type,
         CAST(sum(is_new) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM marked
),
u0 AS (SELECT user_id, session_id, min(ts) AS t0
       FROM sess WHERE event_type = 'view' GROUP BY 1, 2),
u1 AS (SELECT s.user_id, s.session_id, min(s.ts) AS t1
       FROM sess s JOIN u0 ON u0.user_id = s.user_id
                          AND u0.session_id = s.session_id
       WHERE s.event_type = 'click' AND s.ts > u0.t0 GROUP BY 1, 2),
u2 AS (SELECT s.user_id, s.session_id, min(s.ts) AS t2
       FROM sess s JOIN u1 ON u1.user_id = s.user_id
                          AND u1.session_id = s.session_id
       WHERE s.event_type = 'purchase' AND s.ts > u1.t1 GROUP BY 1, 2)
SELECT 1 AS step, 'view' AS event_type,
       CAST(count(*) AS BIGINT) AS n_sessions FROM u0
UNION ALL
SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM u1
UNION ALL
SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM u2
"""


@register("events_session_funnel", oracle=_SESSION_FUNNEL_ORACLE)
def events_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel at SESSION grain: view -> click -> purchase must all
    happen inside one 30-min session (user-grain funnels overstate
    conversion by crediting chains spread over weeks).  Per-event
    session ids come from the shared one-sorted-pass assignment
    (operators/asof.py::with_session_ids); the cascade then runs on the
    (user, session) composite key — same earliest-completion plan shape
    as events_funnel_counts, one min-groupBy per step."""
    from javascript_vector_database_spark.operators.asof import (
        with_session_ids,
    )

    ev = with_session_ids(load_table(spark, sf_dir, "events")).select(
        "user_id", "session_id", "ts", "event_type"
    )
    prev = None
    outs = []
    for i, s in enumerate(FUNNEL_STEPS):
        step_ev = ev.where(F.col("event_type") == s)
        if prev is None:
            cur = step_ev.groupBy("user_id", "session_id").agg(
                F.min("ts").alias(f"t{i}")
            )
        else:
            cur = (
                step_ev.join(prev, ["user_id", "session_id"])
                .where(F.col("ts") > F.col(f"t{i - 1}"))
                .groupBy("user_id", "session_id")
                .agg(F.min("ts").alias(f"t{i}"))
            )
        outs.append(
            cur.agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions")).select(
                F.lit(i + 1).alias("step"),
                F.lit(s).alias("event_type"),
                "n_sessions",
            )
        )
        prev = cur
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _sketch_report_oracle() -> str:
    from javascript_vector_database_spark.operators.sketch import (
        sql_kmv_distinct_estimate,
    )

    kmv = sql_kmv_distinct_estimate("events", "user_id").strip()
    hll = _hll_oracle().strip()
    return f"""
SELECT 'exact' AS method,
       CAST(count(DISTINCT user_id) AS DOUBLE) AS estimate
FROM events
UNION ALL
SELECT 'kmv', kmv_estimate FROM ({kmv})
UNION ALL
SELECT 'hll', hll_estimate FROM ({hll})
"""


@register("sketch_comparison_report", oracle=_sketch_report_oracle())
def sketch_comparison_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch family side by side on one question (distinct users):
    exact, KMV, and deterministic-register HLL in a single 3-row report
    — the calibration table a pipeline keeps so downstream consumers
    know each sketch's bias on THEIR key distribution.  Composes the
    registered operators; each arm keeps its own scale shape (exact
    pays a distinct shuffle, KMV a per-distinct-hash row, HLL a
    256-row bound)."""
    from javascript_vector_database_spark.operators.sketch import (
        hll_distinct_estimate,
        kmv_distinct_estimate,
    )

    ev = load_table(spark, sf_dir, "events")
    exact = ev.agg(
        F.count_distinct("user_id").cast("double").alias("estimate")
    ).select(F.lit("exact").alias("method"), "estimate")
    kmv = kmv_distinct_estimate(ev, "user_id").select(
        F.lit("kmv").alias("method"), F.col("kmv_estimate").alias("estimate")
    )
    hll = hll_distinct_estimate(ev, "user_id").select(
        F.lit("hll").alias("method"), F.col("hll_estimate").alias("estimate")
    )
    return exact.unionByName(kmv).unionByName(hll)


_PROPS_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS max_k
FROM events
GROUP BY 1
"""


@register("events_props_json_stats", oracle=_PROPS_ORACLE)
def events_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads: extract a typed field from the JSON
    ``props`` column (get_json_object — JVM-side JSON path, rides the
    scan) and aggregate it per type.  The schema-on-read pattern for
    event properties too sparse/variable to column-ize; at 100 TB the
    hot fields graduate to real columns and this query is the
    migration's before/after check."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.min(k).cast("bigint").alias("min_k"),
        F.max(k).cast("bigint").alias("max_k"),
    )


_COHORT_LTV_ORACLE = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY 1
),
wk AS (
  SELECT f.cohort_week,
         CAST(date_diff('day', f.cohort_week,
                        CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT)
           AS week_offset,
         sum(CAST(e.value AS DECIMAL(18,2))) AS rev
  FROM events e JOIN first f USING (user_id)
  GROUP BY 1, 2
)
SELECT cohort_week, week_offset,
       round(CAST(sum(rev) OVER (PARTITION BY cohort_week
                                 ORDER BY week_offset ASC
                                 ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2)
         AS cum_value
FROM wk
"""


@register("events_cohort_ltv", oracle=_COHORT_LTV_ORACLE)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: cumulative event value per signup-week
    cohort across week offsets — the monetary sibling of the retention
    triangle.  Exact decimal sums; the cumulative window runs over the
    tiny (cohort, offset) frame, raw events are touched once."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    wk = (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("rev"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy(F.col("week_offset").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return wk.select(
        "cohort_week",
        "week_offset",
        F.round(F.sum("rev").over(w).cast("double"), 2).alias("cum_value"),
    )


_JOURNEY_TOP = 15

_JOURNEY_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > {_SESSION_GAP} * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(sum(is_new) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM marked
),
paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts ASC, event_id ASC) AS journey
  FROM sess GROUP BY 1, 2
)
SELECT journey, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY 1
ORDER BY n_sessions DESC, journey ASC
LIMIT {_JOURNEY_TOP}
"""


@register("events_top_journeys", oracle=_JOURNEY_ORACLE)
def events_top_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session journeys (the ordered event-type path of each 30-min
    session, e.g. 'view>click>purchase') — path mining, the report
    behind every 'users who did X then Y' product question.  Session
    ids from the shared one-sorted-pass assignment; the path string is
    a row-local ordered aggregation per session (collect_list +
    sort_array on the unique (ts, event_id) key, mirrored by DuckDB's
    ORDER BY string_agg); journeys groupBy + TakeOrdered top-15."""
    from javascript_vector_database_spark.operators.asof import (
        with_session_ids,
    )

    ev = with_session_ids(load_table(spark, sf_dir, "events"))
    paths = (
        ev.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("journey")
        )
    )
    return (
        paths.groupBy("journey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("journey").asc())
        .limit(_JOURNEY_TOP)
    )


def _grouped_hist_q_oracle() -> str:
    from javascript_vector_database_spark.operators.sketch import (
        sql_grouped_histogram_quantiles,
    )

    return sql_grouped_histogram_quantiles("documents", "source", "n_chars")


@register("sketch_grouped_quantiles", oracle=_grouped_hist_q_oracle())
def sketch_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE p50/p90/p99 document length from the grouped histogram
    sketch — the partitioned form of sketch_histogram_quantiles whose
    windows never collapse to one partition (the shape a per-domain
    100 TB profile actually runs)."""
    from javascript_vector_database_spark.operators.sketch import (
        grouped_histogram_quantiles,
    )

    return grouped_histogram_quantiles(
        load_table(spark, sf_dir, "documents"), "source", "n_chars"
    )


def _kmv_setops_oracle() -> str:
    from javascript_vector_database_spark.operators.sketch import (
        sql_kmv_union_intersection,
    )

    # k=256: the intersection estimator samples ~k * (inter/union)
    # hashes, so the default k=64 leaves ~6 samples (40% RSE) on this
    # 10%-overlap pair; 256 brings it to ~20%
    return sql_kmv_union_intersection(
        "events", "user_id", "orders", "o_custkey", k=256
    )


@register("sketch_kmv_set_ops", oracle=_kmv_setops_oracle())
def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra over KMV: union cardinality from the
    merged k-minimum sketch, intersection from the common hashes below
    the union's theta — the estimate-without-materializing answer to
    'how many users both browse AND buy' (operators/sketch.py)."""
    from javascript_vector_database_spark.operators.sketch import (
        kmv_union_intersection,
    )

    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    return kmv_union_intersection(ev, "user_id", orders, "o_custkey", k=256)


def _hll_rolling_oracle() -> str:
    from javascript_vector_database_spark.operators.sketch import (
        HLL_ALPHA,
        HLL_M,
        HLL_W_BITS,
    )

    two53 = 2 ** (HLL_W_BITS + 1)
    h = "md5(CAST(user_id AS VARCHAR))"
    bucket = f"('0x' || substr({h}, 1, 2))::BIGINT"
    w = f"('0x' || substr({h}, 3, 13))::BIGINT"
    alpha_num = repr(HLL_ALPHA * HLL_M * HLL_M * float(two53))
    return f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
           AS day_idx,
         {bucket} AS b,
         max(CASE WHEN {w} = 0 THEN {HLL_W_BITS + 1}
             ELSE {HLL_W_BITS + 1} - length(bin({w})) END) AS M
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(day_idx) AS mn, max(day_idx) AS mx FROM daily),
spine AS (
  SELECT b, unnest(generate_series(bounds.mn, bounds.mx)) AS day_idx
  FROM (SELECT DISTINCT b FROM daily), bounds
),
dense AS (
  SELECT s.b, s.day_idx,
         max(d.M) OVER (PARTITION BY s.b ORDER BY s.day_idx ASC
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS M
  FROM spine s LEFT JOIN daily d ON d.b = s.b AND d.day_idx = s.day_idx
),
agg AS (
  SELECT day_idx,
         coalesce(CAST(sum(CAST(pow(2, {HLL_W_BITS + 1} - M) AS BIGINT))
                       AS BIGINT), 0) AS s,
         count(M) AS v
  FROM dense GROUP BY 1
),
tot AS (
  SELECT day_idx, s + ({HLL_M} - v) * {two53} AS total,
         CAST({HLL_M} - v AS BIGINT) AS zeros
  FROM agg
)
SELECT day_idx,
       round(CASE WHEN ({alpha_num} / total) <= {2.5 * HLL_M} AND zeros > 0
             THEN {float(HLL_M)} * ln({float(HLL_M)} / zeros)
             ELSE {alpha_num} / total END, 4) AS hll_estimate,
       zeros AS hll_zero_registers
FROM tot
"""


@register("sketch_hll_rolling_distinct", oracle=_hll_rolling_oracle())
def sketch_hll_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day from MERGEABLE daily HLL
    registers — the query exact distinct cannot answer cheaply (a
    sliding COUNT DISTINCT re-scans every window): daily (day, bucket,
    M) registers are built once, each day's trailing-week sketch is a
    window MAX over the densified (bucket x day) spine, and the
    estimate folds 256 registers per day.  The spine bounds are two
    bounded driver scalars (the division-query precedent); everything
    else is registers, never raw events."""
    from javascript_vector_database_spark.operators.sketch import (
        hll_estimate_from_registers,
        hll_registers,
    )

    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    ).cast("long")
    daily = hll_registers(ev.withColumn("day_idx", day), "user_id", ["day_idx"])
    b_row = daily.agg(F.min("day_idx"), F.max("day_idx")).first()
    mn, mx = int(b_row[0]), int(b_row[1])
    spine = (
        daily.select("b")
        .distinct()
        .select(
            "b",
            F.explode(F.sequence(F.lit(mn), F.lit(mx))).alias("day_idx"),
        )
    )
    w = (
        Window.partitionBy("b")
        .orderBy(F.col("day_idx").asc())
        .rowsBetween(-6, 0)
    )
    dense = (
        spine.join(daily, ["b", "day_idx"], "left")
        .select("b", "day_idx", F.max("M").over(w).alias("M"))
        .where(F.col("M").isNotNull())
    )
    return hll_estimate_from_registers(
        dense.select("day_idx", "b", "M"), ["day_idx"]
    )


def _retention_rate_oracle() -> str:
    from javascript_vector_database_spark.operators.funnel import (
        sql_retention_cohorts,
    )

    inner = sql_retention_cohorts("events").strip()
    return f"""
WITH r AS ({inner}),
base AS (SELECT cohort_week, n_users AS cohort_size FROM r WHERE week_offset = 0)
SELECT r.cohort_week, r.week_offset, r.n_users,
       floor(CAST(r.n_users * 1000000 AS DOUBLE) / base.cohort_size)
         / 1000000.0 AS retention_rate
FROM r JOIN base USING (cohort_week)
"""


@register("events_retention_rate", oracle=_retention_rate_oracle())
def events_retention_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retention triangle NORMALIZED by cohort size (offset-0 row =
    1.0 by construction) — the form the report is actually read in;
    tie-free floor-at-micro rates over the tiny cohort frame."""
    from javascript_vector_database_spark.operators.funnel import (
        retention_cohorts,
    )

    r = retention_cohorts(load_table(spark, sf_dir, "events"))
    base = r.where(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_users").alias("cohort_size")
    )
    return r.join(F.broadcast(base), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_users",
        (
            F.floor(
                (F.col("n_users") * 1000000).cast("double") / F.col("cohort_size")
            )
            / F.lit(1000000.0)
        ).alias("retention_rate"),
    )


def _stickiness_oracle() -> str:
    rolling = _hll_rolling_oracle().strip()
    return f"""
WITH wau AS ({rolling}),
dau AS (
  SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
           AS day_idx,
         CAST(count(DISTINCT user_id) AS BIGINT) AS dau
  FROM events GROUP BY 1
)
SELECT d.day_idx, d.dau,
       round(w.hll_estimate, 4) AS wau_est,
       floor(CAST(d.dau * 1000000 AS DOUBLE) / w.hll_estimate) / 1000000.0
         AS stickiness
FROM dau d JOIN wau w USING (day_idx)
"""


@register("events_stickiness", oracle=_stickiness_oracle())
def events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day: exact daily distinct (cheap at any
    scale — one day's keys) over the trailing-week HLL estimate (the
    expensive side, answered from registers by
    sketch_hll_rolling_distinct's machinery).  The canonical
    exact-where-cheap / sketch-where-expensive split of a product
    dashboard."""
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    ).cast("long")
    dau = ev.groupBy(day.alias("day_idx")).agg(
        F.count_distinct("user_id").cast("bigint").alias("dau")
    )
    wau = sketch_hll_rolling_distinct(spark, sf_dir).select(
        "day_idx", F.round("hll_estimate", 4).alias("wau_est")
    )
    return dau.join(wau, "day_idx").select(
        "day_idx",
        "dau",
        "wau_est",
        (
            F.floor((F.col("dau") * 1000000).cast("double") / F.col("wau_est"))
            / F.lit(1000000.0)
        ).alias("stickiness"),
    )


# ---------------------------------------------------------------------------
# streaming==batch equivalence rows (r5 verdict "Next round" #8): the
# mergeable-sketch property the streaming pytest suite pins — a live
# Structured Streaming state table equals the one-shot batch construction
# — promoted into the driver's DuckDB contract.  Each query actually RUNS
# a streaming job (file source fed in two appends, so real cross-micro-
# batch state folding happens) and returns the LIVE table's fold; the
# oracle is the same batch SQL the one-shot sketch rows use, so a green
# row certifies streaming == batch == oracle in one check.
# ---------------------------------------------------------------------------


def _stream_feed(spark, df, src: str, split_col: str):
    """Write ``df`` as two deterministic halves (split on the key's
    parity) so the streaming query folds state across >= 2 micro-batches
    — first half before the stream starts, second mid-flight.

    NULL keys coalesce to 0 so the two halves PARTITION the table by
    construction — a bare ``col % 2`` predicate pair silently drops
    NULL-key rows from both halves and would diverge from the batch
    oracle (r6 ADVICE)."""
    parity = F.coalesce(F.col(split_col), F.lit(0)) % 2
    df.where(parity == 0).write.mode("append").parquet(src)

    def second_half():
        df.where(parity != 0).write.mode("append").parquet(src)

    return second_half


@register("stream_hll_live_users", oracle=_hll_oracle())
def stream_hll_live_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live HLL distinct-users estimate from a RUNNING stream: the
    bounded (b, M) register state after two micro-batches, folded to the
    estimate.  max is batch-boundary invariant, so the live table equals
    the one-shot batch registers — certified against the SAME oracle as
    `sketch_hll_distinct_users` (streaming/reactive.py:301)."""
    import os
    import shutil
    import uuid

    from javascript_vector_database_spark.operators.sketch import (
        hll_estimate_from_registers,
    )
    from javascript_vector_database_spark.streaming.reactive import (
        streaming_hll_registers,
    )

    tmp = tempfile.mkdtemp(prefix="stream_hll_")
    src = os.path.join(tmp, "src")
    ev = load_table(spark, sf_dir, "events").select("user_id")
    feed_rest = _stream_feed(spark, ev, src, "user_id")
    name = f"hll_live_{uuid.uuid4().hex[:8]}"
    q = streaming_hll_registers(spark, src, "user_id long", query_name=name)
    try:
        q.processAllAvailable()
        feed_rest()
        q.processAllAvailable()
        # memory-sink rows survive stop(); fold the live registers
        out = hll_estimate_from_registers(spark.table(name))
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@register(
    "stream_live_count_by_type",
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY event_type
""",
)
def stream_live_count_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 incremental count at the ENGINE level, driver-certified: the
    update-from-state streaming aggregation's live per-type counts after
    two micro-batches equal the batch groupBy — Spark's state store
    merges each batch's partials, the exact semantics the reference
    maintains by ±1 count bumps (rx-query incremental count)."""
    import os
    import shutil
    import uuid

    from javascript_vector_database_spark.streaming.reactive import (
        streaming_live_count,
    )

    tmp = tempfile.mkdtemp(prefix="stream_cnt_")
    src = os.path.join(tmp, "src")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    feed_rest = _stream_feed(spark, ev, src, "event_id")
    name = f"live_count_{uuid.uuid4().hex[:8]}"
    q = streaming_live_count(
        spark, src, "event_id long, event_type string", "event_type",
        query_name=name,
    )
    try:
        q.processAllAvailable()
        feed_rest()
        q.processAllAvailable()
        live = spark.table(name).select(
            "event_type", F.col("n").cast("long").alias("n")
        )
        out = spark.createDataFrame(live.collect(), live.schema)
    finally:
        q.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@register("stream_cms_live_tokens", oracle=_cms_oracle())
def stream_cms_live_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live Count-Min token frequencies from a RUNNING stream: the
    bounded d*w counter state after two micro-batches, probed for the
    fixed token set and joined with exact counts — same oracle as the
    one-shot `sketch_cms_token_freq` (sums are additive across batch
    boundaries, so live == batch bit-for-bit)."""
    import os
    import shutil
    import uuid

    from javascript_vector_database_spark.functions.text import word_tokens
    from javascript_vector_database_spark.operators.sketch import cms_estimate
    from javascript_vector_database_spark.streaming.reactive import (
        streaming_cms_counters,
    )
    from javascript_vector_database_spark.tables import spread

    tmp = tempfile.mkdtemp(prefix="stream_cms_")
    src = os.path.join(tmp, "src")
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks_src = docs.select(
        "doc_id", F.explode(word_tokens("text")).alias("tok")
    )
    feed_rest = _stream_feed(spark, toks_src, src, "doc_id")
    name = f"cms_live_{uuid.uuid4().hex[:8]}"
    q = streaming_cms_counters(
        spark, src, "doc_id long, tok string", query_name=name
    )
    try:
        q.processAllAvailable()
        feed_rest()
        q.processAllAvailable()
        counters = spark.table(name)
        qdf = spark.createDataFrame([(t,) for t in CMS_PROBE_TOKENS], ["tok"])
        est = cms_estimate(counters, qdf, "tok")
        toks = docs.select(F.explode(word_tokens("text")).alias("tok"))
        exact = (
            toks.where(F.col("tok").isin(*CMS_PROBE_TOKENS))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
        )
        out = est.join(F.broadcast(exact), "tok", "left").select(
            "tok",
            "est_count",
            F.coalesce("exact_count", F.lit(0))
            .cast("long")
            .alias("exact_count"),
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    return out


_STREAM_SESSION_ORACLE = """
WITH pts AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
o AS (
  SELECT user_id, ms,
         lag(ms) OVER (PARTITION BY user_id ORDER BY ms) AS pms
  FROM pts
),
s AS (
  SELECT user_id, ms,
         sum(CASE WHEN pms IS NULL OR ms - pms > 1800000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ms
                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       CAST(min(ms) AS BIGINT) AS session_start_ms,
       CAST(max(ms) AS BIGINT) AS session_end_ms,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sid
"""


@register("stream_sessionize_live", oracle=_STREAM_SESSION_ORACLE)
def stream_sessionize_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-confluent LIVE sessionization (6th streaming==batch row):
    per-user gap-interval-merge state (streaming/stateful.py:
    streaming_session_intervals) fed the events table in two PARITY
    halves — each user's events arrive OUT OF ORDER across micro-batch
    boundaries, the case that breaks in-order session trackers — and the
    final state equals the batch lag/sum sessionization because gap-
    connected components are a property of the point set, not the
    arrival sequence.  Certifies the §2.12 custom-state operator against
    the same SQL oracle a batch sessionizer answers to."""
    import os
    import shutil
    import uuid

    from javascript_vector_database_spark.streaming.stateful import (
        streaming_session_intervals,
    )

    tmp = tempfile.mkdtemp(prefix="stream_sess_")
    src = os.path.join(tmp, "src")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("unix_micros(ts) DIV 1000").alias("ms"),
    )
    feed_rest = _stream_feed(spark, ev, src, "event_id")
    name = f"sess_live_{uuid.uuid4().hex[:8]}"
    q = streaming_session_intervals(
        spark, src, "event_id long, user_id long, ms long", query_name=name
    )
    try:
        q.processAllAvailable()
        feed_rest()
        q.processAllAvailable()
        live = spark.table(name)
        wv = Window.partitionBy("user_id").orderBy(
            F.col("version").desc()
        )
        latest = (
            live.withColumn("__rn", F.row_number().over(wv))
            .where(F.col("__rn") == 1)
            .select(
                "user_id",
                F.explode(
                    F.arrays_zip(
                        F.col("starts").alias("s"),
                        F.col("ends").alias("e"),
                        F.col("counts").alias("c"),
                    )
                ).alias("iv"),
            )
        )
        out = latest.select(
            "user_id",
            F.col("iv.s").cast("long").alias("session_start_ms"),
            F.col("iv.e").cast("long").alias("session_end_ms"),
            F.col("iv.c").cast("long").alias("n_events"),
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@register("stream_cusum_live", oracle=_CUSUM_ORACLE)
def stream_cusum_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE CUSUM changepoint alarms (8th streaming==batch row): the
    §2.12 custom-state operator (applyInPandasWithState) keeps each
    event_type's HOURLY COUNT VECTOR as state — a mergeable object, so
    the fold is order-confluent: events arrive in two parity halves
    (each hour's count split across micro-batches, the case that breaks
    sequential CUSUM trackers) and the re-derived alarm set still
    equals the one-shot batch `events_cusum_alarms` under the same
    DuckDB oracle.  State is bounded at the calendar-hour grain per
    type — the streaming face of the skew-routing note on the batch
    row (the statistic itself folds over the rollup, never the event
    grain)."""
    import os
    import shutil
    import uuid

    from javascript_vector_database_spark.streaming.stateful import (
        CUSUM_K,
        streaming_cusum,
    )

    assert CUSUM_K == _CUSUM_K, "streaming threshold must match batch"
    tmp = tempfile.mkdtemp(prefix="stream_cusum_")
    src = os.path.join(tmp, "src")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts"
    )
    feed_rest = _stream_feed(spark, ev, src, "event_id")
    name = f"cusum_live_{uuid.uuid4().hex[:8]}"
    q = streaming_cusum(
        spark, src, "event_id long, event_type string, ts timestamp",
        query_name=name,
    )
    try:
        q.processAllAvailable()
        feed_rest()
        q.processAllAvailable()
        live = spark.table(name)
        wv = Window.partitionBy("event_type").orderBy(F.col("version").desc())
        latest = (
            live.withColumn("__rn", F.row_number().over(wv))
            .where(F.col("__rn") == 1)
            .select(
                "event_type",
                F.explode(
                    F.arrays_zip(
                        F.col("alarm_hours").alias("h"),
                        F.col("alarm_cusum").alias("s"),
                    )
                ).alias("al"),
            )
        )
        out = latest.select(
            "event_type",
            F.timestamp_micros(F.col("al.h")).alias("hour"),
            F.col("al.s").cast("bigint").alias("cusum"),
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    return out


_SSJOIN_ORACLE = """
WITH v AS (
  SELECT user_id, ts AS vts FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase'
)
SELECT v.user_id, CAST(count(*) AS BIGINT) AS n_pairs
FROM v JOIN p ON p.user_id = v.user_id
  AND p.pts >= v.vts AND p.pts <= v.vts + INTERVAL 600 SECOND
GROUP BY 1
"""


@register("stream_interval_join_live", oracle=_SSJOIN_ORACLE)
def stream_interval_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join in the driver contract: TWO live
    feeds (views and purchases), each delivered across two micro-batches
    split on event-id parity — so matches must form ACROSS batch
    boundaries out of buffered join state — correlated within a 600s
    view->purchase window (streaming/joins.py:stream_interval_join) and
    certified against the one-shot batch interval join.  The test
    watermark is effectively unbounded so no row is late-dropped and
    live == batch exactly; production bounds it and the docstring there
    carries the state-size law (state ~ arrival rate x bound)."""
    import os
    import shutil
    import uuid

    from javascript_vector_database_spark.streaming.joins import (
        stream_interval_join,
    )

    tmp = tempfile.mkdtemp(prefix="stream_ssjoin_")
    vsrc = os.path.join(tmp, "views")
    psrc = os.path.join(tmp, "purchases")
    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", F.col("ts").alias("vts")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("pts")
    )
    feed_v = _stream_feed(spark, views, vsrc, "event_id")
    feed_p = _stream_feed(spark, purchases, psrc, "event_id")
    left = spark.readStream.schema(
        "event_id long, user_id long, vts timestamp"
    ).parquet(vsrc)
    right = spark.readStream.schema(
        "event_id long, user_id long, pts timestamp"
    ).parquet(psrc)
    joined = stream_interval_join(
        left.drop("event_id"),
        right.drop("event_id"),
        key="user_id",
        left_ts="vts",
        right_ts="pts",
        bound_secs=600,
        watermark_secs=10**9,
    )
    name = f"ssjoin_live_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        feed_v()
        feed_p()
        q.processAllAvailable()
        out = (
            spark.table(name)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    return out


_SDEDUP_ORACLE = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_first_seen
FROM events GROUP BY event_type
"""


@register("stream_dedup_live", oracle=_SDEDUP_ORACLE)
def stream_dedup_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EXACT dedup in the driver contract (the streaming face
    of the dedup family): a live feed deduplicated on (event_type,
    user_id) with ``dropDuplicates`` state held across micro-batches —
    each key's FIRST arrival survives, later copies (including copies
    arriving in later batches) are suppressed by state, and the
    surviving count per type equals the batch COUNT(DISTINCT).  The
    test holds dedup state unbounded so live == batch exactly; the
    production form is ``dropDuplicatesWithinWatermark`` (pinned in
    tests/test_reactive.py) where state is bounded by the lateness
    window."""
    import os
    import shutil
    import uuid

    tmp = tempfile.mkdtemp(prefix="stream_dedup_")
    src = os.path.join(tmp, "src")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    feed_rest = _stream_feed(spark, ev, src, "event_id")
    stream = spark.readStream.schema(
        "event_id long, event_type string, user_id long"
    ).parquet(src)
    deduped = stream.dropDuplicates(["event_type", "user_id"])
    name = f"dedup_live_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        feed_rest()
        q.processAllAvailable()
        out = (
            spark.table(name)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_first_seen"))
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# EWMA smoothing over the dense hourly spine
# ---------------------------------------------------------------------------

#: EWMA alpha = 1/2: every weight is a power of two, so the weighted sum
#: of BIGINT counts is itself an exact BIGINT on any engine — the same
#: "integer fixed-point beats float accumulation order" discipline as
#: PageRank.  Window = 20 trailing hours (2^-20 tail is below the
#: round-6 output precision anyway).
_EWMA_LAGS = 20
_EWMA_DEN = float(1 << _EWMA_LAGS)

_EWMA_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT event_type, min(hour) AS mn, max(hour) AS mx
           FROM hourly GROUP BY 1),
spine AS (
  SELECT s.event_type, s.hour,
         CAST((epoch(s.hour) - epoch(b.mn)) // 3600 AS BIGINT) AS idx,
         coalesce(h.n, 0) AS n
  FROM (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
               AS hour FROM bounds) s
  JOIN bounds b ON b.event_type = s.event_type
  LEFT JOIN hourly h ON h.event_type = s.event_type AND h.hour = s.hour
),
contrib AS (
  SELECT event_type, idx + i AS t,
         n * (CAST(1 AS BIGINT) << ({_EWMA_LAGS - 1} - i)) AS c
  FROM spine, LATERAL unnest(range(0, {_EWMA_LAGS})) AS u(i)
  WHERE n > 0
),
num AS (SELECT event_type, t, CAST(sum(c) AS BIGINT) AS num
        FROM contrib GROUP BY 1, 2)
SELECT s.event_type, s.hour, s.n AS n_events,
       coalesce(m.num, 0) / {_EWMA_DEN} AS ewma
FROM spine s LEFT JOIN num m ON m.event_type = s.event_type AND m.t = s.idx
"""


@register("events_ewma_hourly", oracle=_EWMA_ORACLE)
def events_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of hourly event counts
    (alpha = 1/2, 20-lag truncation) over the dense per-type spine —
    the smoothing baseline behind burst/anomaly detection.

    Exactness: with alpha = 1/2 every weight is 2^k, so the weighted
    numerator is a pure BIGINT sum (shuffle-order-proof on both
    engines); the single final division by 2^20 is exact in doubles.
    Missing hours contribute true zeros via the gap-filled spine (the
    events_gapfill_hourly idiom), so the decay stream is the calendar
    stream, not the observation stream.

    Scale shape: raw events are touched once (map-side-combined hourly
    rollup); the lag fan-out is a row-local explode of 20 weighted
    contributions regrouped on the high-cardinality (type, hour) key —
    no range join, no window over the data grain."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    bounds = hourly.groupBy("event_type").agg(
        F.min("hour").alias("mn"), F.max("hour").alias("mx")
    )
    spine = (
        bounds.select(
            "event_type",
            "mn",
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 hour"))
            ).alias("hour"),
        )
        .select(
            "event_type",
            "hour",
            ((F.unix_timestamp("hour") - F.unix_timestamp("mn")) / 3600)
            .cast("long")
            .alias("idx"),
        )
        .join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type", "hour", "idx",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
    )
    contrib = (
        spine.where(F.col("n") > 0)
        .select(
            "event_type",
            "idx",
            "n",
            F.explode(
                F.sequence(F.lit(0), F.lit(_EWMA_LAGS - 1))
            ).alias("i"),
        )
        .select(
            "event_type",
            (F.col("idx") + F.col("i")).alias("t"),
            F.expr(
                f"n * shiftleft(CAST(1 AS BIGINT), {_EWMA_LAGS - 1} - i)"
            ).alias("c"),
        )
    )
    num = contrib.groupBy(
        F.col("event_type").alias("m_type"), "t"
    ).agg(F.sum("c").cast("long").alias("num"))
    return spine.join(
        num,
        (F.col("event_type") == F.col("m_type")) & (F.col("idx") == F.col("t")),
        "left",
    ).select(
        "event_type",
        "hour",
        F.col("n").alias("n_events"),
        (F.coalesce("num", F.lit(0)) / F.lit(_EWMA_DEN)).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# per-user spend burst: Kadane's maximum subarray via the prefix-min identity
# ---------------------------------------------------------------------------

_BURST_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
tot AS (SELECT user_id, CAST(count(*) AS BIGINT) AS nd,
               CAST(sum(y) AS BIGINT) AS t
        FROM daily GROUP BY 1),
p AS (
  SELECT daily.user_id, d, nd,
         sum(nd * y - t) OVER (PARTITION BY daily.user_id
                               ORDER BY d ASC
                               ROWS UNBOUNDED PRECEDING) AS pf
  FROM daily JOIN tot USING (user_id)
),
s AS (
  -- least(0, ...) admits the EMPTY prefix P_0 = 0 so a maximum run
  -- starting on the user's first active day is not missed
  SELECT user_id, d, nd,
         pf - least(0, min(pf) OVER (PARTITION BY user_id ORDER BY d ASC
                                     ROWS UNBOUNDED PRECEDING)) AS s
  FROM p
),
best AS (
  SELECT user_id, d, nd, s,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY s DESC, d ASC) AS rn
  FROM s
)
SELECT user_id, CAST(nd AS BIGINT) AS n_days,
       CAST(s // nd AS BIGINT) AS burst_cents, d AS end_day
FROM best WHERE rn = 1
ORDER BY burst_cents DESC, user_id ASC LIMIT 20
"""


@register("events_spend_burst", oracle=_BURST_ORACLE)
def events_spend_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 users with the strongest spending BURST: the maximum-sum
    contiguous run of (daily spend - the user's own daily mean) over
    each user's purchase history — Kadane's maximum-subarray, solved
    per user without any iterative fold via the same prefix-min
    identity as events_cusum_alarms: best run ending at t is
    P_t - min_{0<=j<=t} P_j with P_0 = 0 (the empty prefix MUST be in
    the min, else a run starting on the user's first active day is
    missed), so two stacked per-user windows over the
    DAILY rollup do it in one sorted pass.  Fully integer: the
    mean-centered drift is nd*y - total (no division), the burst is
    floor-normalized back to cents only at output (s DIV nd,
    non-negative).  CUSUM answers "did the process shift, globally";
    this answers "which ENTITY had the hottest sustained stretch" — the
    per-account anomaly triage view.  Windows are user-partitioned over
    per-user day counts (calendar-bounded); the argmax day is extracted
    with a deterministic (s DESC, day ASC) row_number, and the global
    top-20 is one TakeOrdered."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(
            "user_id",
            F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("y")
        )
        # 2 consumers (per-user totals + the prefix join): pin the daily
        # rollup so the events scan runs once
        .localCheckpoint(eager=True)
    )
    tot = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("y").cast("long").alias("t"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("d").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = daily.join(tot, "user_id").select(
        "user_id",
        "d",
        "nd",
        F.sum(F.col("nd") * F.col("y") - F.col("t")).over(w).alias("pf"),
    )
    s = p.select(
        "user_id",
        "d",
        "nd",
        (
            F.col("pf")
            - F.least(F.lit(0).cast("long"), F.min("pf").over(w))
        ).alias("s"),
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.col("s").desc(), F.col("d").asc()
    )
    return (
        s.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("nd").alias("n_days"),
            F.expr("s DIV nd").cast("long").alias("burst_cents"),
            F.col("d").alias("end_day"),
        )
        .orderBy(F.col("burst_cents").desc(), F.col("user_id").asc())
        .limit(20)
    )


@register("stream_spend_burst_live", oracle=_BURST_ORACLE)
def stream_spend_burst_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE per-user spend burst (9th streaming==batch row): the
    purchase feed arrives in two parity micro-batches; each user's
    state is the DAILY CENTS VECTOR (mergeable — any interleaving folds
    to the same vector, calendar-bounded, never the event grain) and
    the Kadane burst re-derives per batch from it
    (streaming/stateful.py:streaming_burst).  Cents are converted by
    the SAME Spark decimal cast as the batch row BEFORE the feed is
    written, so the money arithmetic is engine-identical end to end;
    the live top-20 equals one-shot `events_spend_burst` under the same
    DuckDB oracle."""
    import os
    import shutil
    import uuid

    from javascript_vector_database_spark.streaming.stateful import (
        streaming_burst,
    )

    tmp = tempfile.mkdtemp(prefix="stream_burst_")
    src = os.path.join(tmp, "src")
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("v_cents"),
        )
    )
    feed_rest = _stream_feed(spark, ev, src, "event_id")
    name = f"burst_live_{uuid.uuid4().hex[:8]}"
    q = streaming_burst(
        spark,
        src,
        "event_id long, user_id long, ts timestamp, v_cents long",
        query_name=name,
    )
    try:
        q.processAllAvailable()
        feed_rest()
        q.processAllAvailable()
        live = spark.table(name)
        wv = Window.partitionBy("user_id").orderBy(F.col("version").desc())
        out = (
            live.withColumn("__rn", F.row_number().over(wv))
            .where(F.col("__rn") == 1)
            .select(
                "user_id",
                "n_days",
                "burst_cents",
                F.timestamp_micros(F.col("end_day_us"))
                .cast("date")
                .alias("end_day"),
            )
            .orderBy(F.col("burst_cents").desc(), F.col("user_id").asc())
            .limit(20)
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        q.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# conversion propensity: bounded-horizon value iteration over the
# event-type transition chain
# ---------------------------------------------------------------------------

PROPENSITY_SCALE = 1_000_000
PROPENSITY_ROUNDS = 3
_CONVERT_STATE = "purchase"


def _propensity_oracle() -> str:
    sql = [
        """WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS s,
         event_type AS t
  FROM events
),
c AS (
  SELECT s, t, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE s IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT s, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1),
states AS (SELECT DISTINCT event_type AS s FROM events),"""
    ]
    sql.append(
        f"p0 AS (SELECT s, CAST(CASE WHEN s = '{_CONVERT_STATE}' "
        f"THEN {PROPENSITY_SCALE} ELSE 0 END AS BIGINT) AS p FROM states),"
    )
    for i in range(PROPENSITY_ROUNDS):
        sql.append(
            f"""p{i + 1} AS (
  SELECT st.s,
         CAST(CASE WHEN st.s = '{_CONVERT_STATE}' THEN {PROPENSITY_SCALE}
              ELSE COALESCE(
                (SELECT sum(c.n * p.p) // max(tot.tot)
                 FROM c JOIN p{i} p ON p.s = c.t
                 JOIN tot ON tot.s = c.s
                 WHERE c.s = st.s), 0)
              END AS BIGINT) AS p
  FROM states st
),"""
        )
    body = "\n".join(sql).rstrip(",")
    return (
        f"{body}\n"
        f"SELECT p.s AS state, p.p AS propensity_micro,\n"
        f"       COALESCE(tot.tot, 0) AS n_transitions\n"
        f"FROM p{PROPENSITY_ROUNDS} p LEFT JOIN tot ON tot.s = p.s\n"
        f"ORDER BY propensity_micro DESC, state ASC"
    )


@register("events_conversion_propensity", oracle=_propensity_oracle())
def events_conversion_propensity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-horizon conversion propensity by event type: the
    probability (micro-scaled) of reaching 'purchase' within
    PROPENSITY_ROUNDS=3 transitions of the first-order event-type
    chain — value iteration p_k(s) = sum_t P(s->t) * p_(k-1)(t) with
    the absorbing convert state pinned at 1, unrolled 3 rounds with
    integer-floor division (sum(n*p) DIV tot — shuffle-order-proof,
    same fixed-point discipline as PageRank).  This is the
    attribution-adjacent DP the Markov removal-effect literature
    builds on, truncated to a bounded horizon so both engines can
    unroll it exactly.  The transition matrix lives on a types^2-row
    table: one lag + one groupBy touch the fact table, every
    iteration is broadcast-tiny."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = ev.select(
        F.lag("event_type").over(w).alias("s"),
        F.col("event_type").alias("t"),
    ).where(F.col("s").isNotNull())
    c = (
        seq.groupBy("s", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        # types^2-row table feeding every iteration round + tot
        .localCheckpoint(eager=True)
    )
    # tot feeds every round + the final join; states feeds p0 and every
    # round's left join — pin both (tiny) so the events scan runs once
    tot = (
        c.groupBy("s")
        .agg(F.sum("n").cast("long").alias("tot"))
        .localCheckpoint(eager=True)
    )
    states = (
        ev.select(F.col("event_type").alias("s"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    p = states.select(
        "s",
        F.when(F.col("s") == _CONVERT_STATE, PROPENSITY_SCALE)
        .otherwise(0)
        .cast("long")
        .alias("p"),
    )
    for _ in range(PROPENSITY_ROUNDS):
        contrib = (
            c.join(
                p.select(F.col("s").alias("t"), F.col("p").alias("pt")), "t"
            )
            .groupBy("s")
            .agg(F.sum(F.col("n") * F.col("pt")).cast("long").alias("np"))
            .join(tot, "s")
            .select("s", F.expr("np DIV tot").cast("long").alias("pnext"))
        )
        p = states.join(contrib, "s", "left").select(
            "s",
            F.when(F.col("s") == _CONVERT_STATE, PROPENSITY_SCALE)
            .otherwise(F.coalesce(F.col("pnext"), F.lit(0)))
            .cast("long")
            .alias("p"),
        )
    return (
        p.join(tot, "s", "left")
        .select(
            F.col("s").alias("state"),
            F.col("p").alias("propensity_micro"),
            F.coalesce(F.col("tot"), F.lit(0)).cast("long").alias(
                "n_transitions"
            ),
        )
        .orderBy(F.col("propensity_micro").desc(), F.col("state").asc())
    )


# ---------------------------------------------------------------------------
# watermarked late-data drop, driver-certified
# ---------------------------------------------------------------------------

_LATE_DROP_ORACLE = """
WITH v AS (
  SELECT ts, CASE WHEN coalesce(event_id, 0) % 2 = 0 THEN 0 ELSE 1 END AS half
  FROM events WHERE event_type = 'view'
),
wm1 AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM v WHERE half = 0),
wmf AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM v),
kept AS (
  SELECT date_trunc('hour', ts) AS win_start FROM v, wm1
  WHERE half = 0 OR date_trunc('hour', ts) + INTERVAL 1 HOUR > wm1.w
)
SELECT win_start, CAST(count(*) AS BIGINT) AS n
FROM kept, wmf
GROUP BY win_start, wmf.w
HAVING win_start + INTERVAL 1 HOUR <= wmf.w
"""


@register("stream_late_drop_live", oracle=_LATE_DROP_ORACLE)
def stream_late_drop_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-DATA semantics, driver-certified (10th
    streaming==batch row — unlike the other nine, here streaming must
    equal a batch oracle that MODELS THE DROP, not the full fold): the
    view stream arrives in two parity micro-batches through a 1-hour
    watermark feeding an hourly tumbling count in APPEND mode.  The
    oracle reproduces Spark's two watermark rules exactly — a batch-2
    row is DROPPED unless its window end exceeds the batch-1 watermark
    (max batch-1 event time - 1h), and a window is EMITTED only once
    the final watermark passes its end.  Both boundary predicates are
    Spark's documented strict/inclusive pair (keep iff end > wm; emit
    iff end <= wm); the parity split makes both watermarks
    deterministic functions of the corpus, which is what lets a DuckDB
    oracle certify a semantics that exists only in the engine's state
    manager.  The suite's crafted-timing pin for the same contract is
    tests/test_reactive.py:test_streaming_watermark_drops_late_events."""
    import os
    import shutil
    import uuid

    from javascript_vector_database_spark.streaming.reactive import (
        streaming_windowed_count,
    )

    tmp = tempfile.mkdtemp(prefix="stream_late_")
    src = os.path.join(tmp, "src")
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "view")
        .select("event_id", "ts")
    )
    feed_rest = _stream_feed(spark, ev, src, "event_id")
    name = f"late_drop_{uuid.uuid4().hex[:8]}"
    q = streaming_windowed_count(
        spark,
        src,
        "event_id long, ts timestamp",
        window_duration="1 hour",
        watermark="1 hour",
        query_name=name,
    )
    try:
        q.processAllAvailable()
        feed_rest()
        q.processAllAvailable()
        live = spark.table(name).select(
            "win_start", F.col("n").cast("long").alias("n")
        )
        out = spark.createDataFrame(live.collect(), live.schema)
    finally:
        q.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# autocorrelation of the hourly volume series (seasonality detector)
# ---------------------------------------------------------------------------

ACF_MAX_LAG = 24

_ACF_ORACLE = f"""
WITH cnt AS MATERIALIZED (
  SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS t,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
b AS (SELECT min(t) AS mn, max(t) AS mx FROM cnt),
s AS MATERIALIZED (
  SELECT g.t, coalesce(cnt.y, 0) AS y
  FROM (SELECT unnest(generate_series(mn, mx)) AS t FROM b) g
  LEFT JOIN cnt USING (t)
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS ty
        FROM s),
d AS MATERIALIZED (SELECT t, n * y - ty AS dd FROM s CROSS JOIN tot),
den AS (SELECT CAST(sum(dd * dd) AS BIGINT) AS dn FROM d)
SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
       round(CAST(sum(a.dd * f.dd) AS DOUBLE) / CAST(den.dn AS DOUBLE), 6)
         AS acf
FROM (SELECT unnest(generate_series(1, {ACF_MAX_LAG})) AS lag) l
JOIN d a ON true
JOIN d f ON f.t = a.t + l.lag
CROSS JOIN den
GROUP BY l.lag, den.dn
ORDER BY l.lag ASC
"""


@register("events_hourly_acf", oracle=_ACF_ORACLE)
def events_hourly_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..{L} autocorrelation of the GAP-FILLED hourly event-volume
    series — the seasonality detector behind "does traffic have a daily
    cycle" (peak at lag 24) and the residual-whiteness check after any
    trend fit.  Exact-integer core: drifts d_t = n*y_t - T (mean-zero
    without division, the CUSUM/burst discipline), numerator/denominator
    folded as BIGINTs, and only the FINAL ratio leaves integer space via
    the repo's proven round(x, 6) double division (the n^2 scale factors
    cancel, so r_k = N_k/D exactly).  Missing hours are true zeros on a
    dense epoch-hour spine (built from the AGGREGATE's min/max — raw
    events are scanned exactly once).  Lags materialize as a 24-way
    shifted EQUI-join on the hour index (t+k = t2) over the bounded
    calendar-grain series, never a window and never the event grain; the
    scalars (n, T, D) are bounded 1-row collects inlined as literals, so
    the Spark plan carries no 1-row broadcast join."""
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy(
        (F.unix_micros(F.date_trunc("hour", F.col("ts"))) / F.lit(3600000000))
        .cast("long")
        .alias("t")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    b = cnt.agg(F.min("t").alias("mn"), F.max("t").alias("mx")).first()
    mn, mx = int(b["mn"]), int(b["mx"])
    spine = spark.range(mn, mx + 1).select(F.col("id").alias("t"))
    s = spine.join(cnt, "t", "left").select(
        "t", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )
    n = mx - mn + 1
    tot = s.agg(F.sum("y").cast("long").alias("ty")).first()
    ty = int(tot["ty"])
    d = s.select(
        "t", (F.lit(n).cast("long") * F.col("y") - F.lit(ty)).alias("dd")
    ).localCheckpoint(eager=True)  # 3 consumers: denominator + both join sides
    dn = int(d.agg(F.sum(F.col("dd") * F.col("dd")).cast("long")).first()[0])
    lags = d.select(
        F.explode(
            F.sequence(F.lit(1), F.lit(ACF_MAX_LAG))
        ).alias("lag"),
        F.col("t"),
        F.col("dd"),
    ).withColumn("t2", F.col("t") + F.col("lag"))
    f2 = d.select(F.col("t").alias("t2"), F.col("dd").alias("dd2"))
    # a CONSTANT series has zero variance: DuckDB's x/0.0 is NULL while
    # Spark's is Infinity — pin the NULL contract on both sides (acf
    # undefined when the denominator is 0)
    acf = (
        F.lit(None).cast("double")
        if dn == 0
        else F.round(F.col("__num").cast("double") / F.lit(float(dn)), 6)
    )
    return (
        lags.join(f2, "t2")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("dd") * F.col("dd2")).cast("long").alias("__num"),
        )
        .select("lag", "n_pairs", acf.alias("acf"))
        .orderBy(F.col("lag").asc())
    )


events_hourly_acf.__doc__ = events_hourly_acf.__doc__.format(L=ACF_MAX_LAG)


# ---------------------------------------------------------------------------
# peak concurrency: the interval sweep-line as a distributed prefix sum
# ---------------------------------------------------------------------------

_PEAK_CONCURRENCY_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > {_SESSION_GAP} * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sess AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM marked
),
s AS MATERIALIZED (
  SELECT user_id, session_id, min(ts) AS st, max(ts) AS en
  FROM sess GROUP BY 1, 2
),
b AS (
  SELECT st AS ts, CAST(1 AS BIGINT) AS delta, CAST(-1 AS BIGINT) AS md,
         user_id, session_id
  FROM s
  UNION ALL
  SELECT en AS ts, CAST(-1 AS BIGINT) AS delta, CAST(1 AS BIGINT) AS md,
         user_id, session_id
  FROM s
),
c AS (
  SELECT ts,
         CAST(sum(delta) OVER (ORDER BY ts ASC, md ASC, user_id ASC,
                               session_id ASC
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM b
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions FROM s)
SELECT c.cum AS peak_concurrent, c.ts AS at_ts, n.n_sessions
FROM c CROSS JOIN n
ORDER BY c.cum DESC, c.ts ASC
LIMIT 1
"""


@register("events_peak_concurrency", oracle=_PEAK_CONCURRENCY_ORACLE)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic interval sweep-line, distributed: how many user
    sessions were EVER active at once (capacity planning's first
    question).  Sessions come from the registered 30-min-gap
    sessionization; each contributes a +1 boundary at its start and a
    -1 at its end, and the sweep is a GLOBAL ordered prefix sum over
    all boundaries — exactly what operators/prefix.global_prefix_sum
    distributes as P range-partitioned local scans plus broadcast
    offsets (no data-grain unpartitioned window; the offset window runs
    over <= P partition totals).  Boundary order is total and
    engine-identical: (ts, -delta, user, session) — starts sort before
    ends at the same instant, so a single-event session still counts as
    momentarily active.  The argmax row (first instant the maximum is
    reached) is one TakeOrdered; n_sessions is a bounded 1-row count
    inlined as a literal.  Integer end to end."""
    from javascript_vector_database_spark.operators.asof import sessionize
    from javascript_vector_database_spark.operators.prefix import (
        global_prefix_sum,
    )

    s = sessionize(load_table(spark, sf_dir, "events")).localCheckpoint(
        eager=True
    )  # 3 consumers: both boundary sides + the bounded count
    n_sessions = s.count()
    b = s.select(
        F.col("session_start").alias("ts"),
        F.lit(1).cast("long").alias("delta"),
        F.lit(-1).cast("long").alias("md"),
        "user_id",
        "session_id",
    ).unionByName(
        s.select(
            F.col("session_end").alias("ts"),
            F.lit(-1).cast("long").alias("delta"),
            F.lit(1).cast("long").alias("md"),
            "user_id",
            "session_id",
        )
    )
    c = global_prefix_sum(
        b,
        [F.col("ts").asc(), F.col("md").asc(), F.col("user_id").asc(),
         F.col("session_id").asc()],
        "delta",
        out="cum",
    )
    return (
        c.select(
            F.col("cum").alias("peak_concurrent"),
            F.col("ts").alias("at_ts"),
            F.lit(n_sessions).cast("long").alias("n_sessions"),
        )
        .orderBy(F.col("peak_concurrent").desc(), F.col("at_ts").asc())
        .limit(1)
    )
