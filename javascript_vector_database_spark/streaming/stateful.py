"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.12 doc-batch handler family; beyond-reference surface).

Spark's built-in streaming aggregations cover counts/sums; an arbitrary
per-key state machine (running aggregates with custom transition logic,
session scoring, anomaly flags) needs the state-store API directly.
``stateful_user_stats`` keeps (n_events, total_value, max_value) per user
across micro-batches: each batch touches only its keys' state — the
100 TB shape for per-entity accumulators (state lives partitioned in the
state store, co-located with the groupBy hash).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _update_user_stats(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total], "max_value": [mx]}
    )


def stateful_user_stats(
    spark: SparkSession,
    source_dir: str,
    schema,
    query_name: str = "user_stats",
):
    """readStream -> groupBy(user_id).applyInPandasWithState: emits each
    touched user's UPDATED running stats per micro-batch (update mode —
    untouched keys emit nothing, their state stays in the store)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    out = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=(
                "user_id long, n_events long, total_value double, max_value double"
            ),
            stateStructType="n long, total double, mx double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )


SESSION_GAP_MS = 30 * 60 * 1000


def _track_sessions(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        start_ms, end_ms, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start_ms": [start_ms],
                "session_end_ms": [end_ms],
                "n_events": [n],
            }
        )
        return
    start_ms, end_ms, n = (
        state.get if state.exists else (None, None, 0)
    )
    for pdf in pdfs:
        ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
        for t in ts_ms:
            start_ms = t if start_ms is None else min(start_ms, t)
            end_ms = t if end_ms is None else max(end_ms, t)
        n += len(pdf)
    state.update((int(start_ms), int(end_ms), int(n)))
    # close when the WATERMARK passes last-event + gap: eviction is tied
    # to event time, so late stragglers inside the gap still extend
    state.setTimeoutTimestamp(int(end_ms) + SESSION_GAP_MS)
    yield pd.DataFrame(
        {
            "user_id": pd.Series(dtype="int64"),
            "session_start_ms": pd.Series(dtype="int64"),
            "session_end_ms": pd.Series(dtype="int64"),
            "n_events": pd.Series(dtype="int64"),
        }
    )


def stateful_session_tracker(
    spark: SparkSession,
    source_dir: str,
    schema,
    query_name: str = "session_tracker",
):
    """Custom-state sessionization with EXPLICIT eviction: per-user open
    sessions live in the state store as arbitrary payload, extend on
    every batch, and are emitted EXACTLY ONCE — by the event-time timeout
    firing when the watermark passes last-event + gap — then removed.
    The declarative ``session_window`` flavor (streaming/reactive.py)
    covers plain counts; this is the §2.12 pattern for sessions carrying
    custom accumulators (scores, paths, flags) where the built-in agg
    can't express the transition logic.  State is bounded the same way:
    one in-flight row per ACTIVE user, removed at close."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    out = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track_sessions,
            outputStructType=(
                "user_id long, session_start_ms long, "
                "session_end_ms long, n_events long"
            ),
            stateStructType="start_ms long, end_ms long, n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


#: CUSUM alarm threshold in nh units — MUST equal the batch row's
#: registry/feed_state._CUSUM_K so streaming == batch == oracle
CUSUM_K = 25


def _update_cusum(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Order-confluent live CUSUM: state per event_type is the HOURLY
    COUNT VECTOR (hour -> n), which merges identically however
    micro-batches split or reorder events; the one-sided CUSUM statistic
    s_t = P_t - min_{j<=t} P_j over the integer drift d_t = nh*y_t - T
    is re-folded from that vector per batch with exact Python ints.
    Emits the type's full current alarm set with a monotone version
    (= events absorbed) — latest version per type is authoritative."""
    if state.exists:
        hours, counts = (list(x) for x in state.get)
        acc = dict(zip(hours, counts))
    else:
        acc = {}
    for pdf in pdfs:
        hr = pdf["ts"].dt.floor("h").astype("int64") // 1000  # epoch us
        for h, n in hr.value_counts().items():
            acc[int(h)] = acc.get(int(h), 0) + int(n)
    hours = sorted(acc)
    counts = [acc[h] for h in hours]
    state.update((hours, counts))
    nh, total = len(hours), sum(counts)
    pf, mn, alarms_h, alarms_s = 0, 0, [], []
    for h, y in zip(hours, counts):
        pf += nh * y - total
        mn = min(mn, pf)
        s = pf - mn
        if s >= CUSUM_K * nh:
            alarms_h.append(h)
            alarms_s.append(s)
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "version": [int(total)],
            "alarm_hours": [alarms_h],
            "alarm_cusum": [alarms_s],
        }
    )


def streaming_cusum(
    spark: SparkSession,
    source_dir: str,
    schema,
    query_name: str = "cusum_stream",
):
    """Live changepoint detection over the event stream: per-type hourly
    volume folds into bounded state (one count per calendar hour — the
    hourly-rollup grain, never the event grain) and the CUSUM alarm set
    re-derives per batch.  The streaming composition of the batch
    `events_cusum_alarms` row: because the state is a mergeable count
    vector, the live result after ANY micro-batch interleaving equals
    the one-shot batch fold — certified against the same DuckDB oracle."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    out = stream.groupBy("event_type").applyInPandasWithState(
        _update_cusum,
        outputStructType=(
            "event_type string, version long, "
            "alarm_hours array<bigint>, alarm_cusum array<bigint>"
        ),
        stateStructType="hours array<bigint>, counts array<bigint>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def _merge_session_intervals(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    gap = SESSION_GAP_MS
    if state.exists:
        starts, ends, counts = (list(x) for x in state.get)
    else:
        starts, ends, counts = [], [], []
    for pdf in pdfs:
        for ms in pdf["ms"].astype("int64").tolist():
            ms = int(ms)
            hit = [
                i
                for i, (s, e) in enumerate(zip(starts, ends))
                if s - gap <= ms <= e + gap
            ]
            ns, ne, nc = ms, ms, 1
            for i in hit:
                ns = min(ns, starts[i])
                ne = max(ne, ends[i])
                nc += counts[i]
            for i in reversed(hit):
                del starts[i], ends[i], counts[i]
            starts.append(ns)
            ends.append(ne)
            counts.append(nc)
    state.update((starts, ends, counts))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "version": [int(sum(counts))],
            "starts": [starts],
            "ends": [ends],
            "counts": [counts],
        }
    )


def streaming_session_intervals(
    spark: SparkSession,
    source_dir: str,
    schema,
    query_name: str = "session_intervals",
):
    """Order-CONFLUENT sessionization: per-user state is the set of
    gap-closed intervals (start, end, n_events), and each arriving event
    point merges every interval within ``SESSION_GAP_MS`` of it.  The
    final intervals are the gap-connected components of the user's event
    point set — a property of the SET, not the arrival sequence — so the
    live state equals the batch lag/sum sessionization no matter how
    micro-batches interleave or reorder events (the property the naive
    append-only tracker above lacks; it needs in-order arrival + event-
    time timeouts).  This is the sessionizer a backfill-plus-live
    pipeline needs: replaying history into a running query converges to
    the same sessions.  State per user is bounded by that user's session
    count; update mode emits the user's full current interval set with a
    monotone version (= events absorbed), so the latest version per user
    is the authoritative state."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    out = stream.groupBy("user_id").applyInPandasWithState(
        _merge_session_intervals,
        outputStructType=(
            "user_id long, version long, starts array<bigint>, "
            "ends array<bigint>, counts array<bigint>"
        ),
        stateStructType=(
            "starts array<bigint>, ends array<bigint>, counts array<bigint>"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )


# ---------------------------------------------------------------------------
# live per-user spend burst (Kadane over the daily vector)
# ---------------------------------------------------------------------------


def _update_burst(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Order-confluent live spend burst: state per user is the DAILY
    CENTS VECTOR (day -> cents), a mergeable object — any micro-batch
    interleaving folds to the same vector.  The maximum-subarray burst
    re-derives per batch with the same prefix-min identity as the batch
    row (exact Python ints; cents arrive PRE-CONVERTED by the Spark
    decimal cast so the money arithmetic is engine-identical).  Emits
    (user, version, n_days, burst_cents, end day) with a monotone
    version (= cents absorbed... strictly: events absorbed) — latest
    version per user is authoritative."""
    if state.exists:
        days, cents, n_events = state.get
        days, cents = list(days), list(cents)
        acc = dict(zip(days, cents))
        n_events = int(n_events)
    else:
        acc = {}
        n_events = 0
    for pdf in pdfs:
        d_us = pdf["ts"].dt.floor("D").astype("int64") // 1000  # epoch us
        for d, v in zip(d_us, pdf["v_cents"]):
            acc[int(d)] = acc.get(int(d), 0) + int(v)
            n_events += 1
    days = sorted(acc)
    cents = [acc[d] for d in days]
    state.update((days, cents, n_events))
    nd, total = len(days), sum(cents)
    # mn starts at 0: the EMPTY prefix P_0 = 0 is in the min, so a
    # maximum run starting on the user's first active day is counted
    # (batch form: s_t = P_t - least(0, min_{j<=t} P_j))
    pf, mn = 0, 0
    best_s, best_d = 0, days[0] if days else 0
    for d, y in zip(days, cents):
        pf += nd * y - total
        mn = pf if pf < mn else mn
        s = pf - mn
        if s > best_s:
            best_s, best_d = s, d
    version = n_events  # STRICTLY monotone (a zero-value purchase
    # would leave a cents-based version flat and make latest-per-user
    # ambiguous)
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "version": [int(version)],
            "n_days": [int(nd)],
            "burst_cents": [int(best_s // nd) if nd else 0],
            "end_day_us": [int(best_d)],
        }
    )


def streaming_burst(
    spark: SparkSession,
    source_dir: str,
    schema,
    query_name: str = "burst_stream",
):
    """Live per-user spend-burst tracking: the streaming composition of
    the batch `events_spend_burst` row.  State is the user's daily cents
    vector (calendar-bounded, never the event grain); the Kadane burst
    re-derives per batch from that mergeable state, so the live answer
    after ANY micro-batch split equals the one-shot batch fold."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    out = stream.groupBy("user_id").applyInPandasWithState(
        _update_burst,
        outputStructType=(
            "user_id long, version long, n_days long, "
            "burst_cents long, end_day_us long"
        ),
        stateStructType=(
            "days array<bigint>, cents array<bigint>, n_events bigint"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
