"""Reactive/live query surface: event-reduce IVM, incremental count,
streaming stateful count (SURVEY §2.9 reactive query, §2.4 incremental
count; reference MAP#rxdb/dist/esm/rx-query.js:401-491, event-reduce.js)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from javascript_vector_database_spark import registry
from javascript_vector_database_spark.operators.mango import mango_to_column
from javascript_vector_database_spark.streaming.reactive import (
    ReactiveQuery,
    streaming_live_count,
)
from tests.oracle_harness import compare

DOC_SCHEMA = "id long, color string, score long, _deleted boolean, _lwt double"


def _bulk(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_event_reduce_transitions(spark, tmp_path):
    """All four event-reduce outcomes across bulks: enter (insert/update-in),
    stay (update within), leave (update-out), delete."""
    rq = ReactiveQuery(
        spark, {"color": {"$eq": "red"}}, str(tmp_path / "rq"), id_col="id"
    )
    # bulk 1: two matching, one not
    d1 = rq.apply_changes(
        _bulk(
            spark,
            [
                (1, "red", 10, False, 1.0),
                (2, "red", 20, False, 1.0),
                (3, "blue", 30, False, 1.0),
            ],
        )
    )
    assert d1 == {"added": 2, "removed": 0}
    assert rq.count() == 2

    # bulk 2: 3 enters (update-in), 1 leaves (update-out), 2 updates in place
    d2 = rq.apply_changes(
        _bulk(
            spark,
            [
                (3, "red", 31, False, 2.0),
                (1, "blue", 11, False, 2.0),
                (2, "red", 99, False, 2.0),
            ],
        )
    )
    assert d2 == {"added": 1, "removed": 1}
    assert rq.count() == 2
    state = {r["id"]: r["score"] for r in rq.results().collect()}
    assert state == {2: 99, 3: 31}

    # bulk 3: delete 2 (soft), delete 1 (not in result: no-op), insert 4
    d3 = rq.apply_changes(
        _bulk(
            spark,
            [
                (2, "red", 99, True, 3.0),
                (1, "blue", 11, True, 3.0),
                (4, "red", 40, False, 3.0),
            ],
        )
    )
    assert d3 == {"added": 1, "removed": 1}
    assert rq.count() == 2
    assert {r["id"] for r in rq.results().collect()} == {3, 4}


def test_event_reduce_bulk_collapses_to_latest(spark, tmp_path):
    """A bulk carrying several revisions of one doc folds to the latest by
    (_lwt) — the reference's change-buffer ordering."""
    rq = ReactiveQuery(
        spark, {"color": {"$eq": "red"}}, str(tmp_path / "rq2"), id_col="id"
    )
    rq.apply_changes(
        _bulk(
            spark,
            [
                (1, "red", 1, False, 1.0),
                (1, "blue", 2, False, 2.0),  # same doc, later rev: leaves
                (2, "blue", 1, False, 1.0),
                (2, "red", 2, False, 2.0),  # same doc, later rev: enters
            ],
        )
    )
    assert {r["id"] for r in rq.results().collect()} == {2}
    assert rq.count() == 1


def test_event_reduce_equals_full_requery(spark, sf_oracle, tmp_path):
    """The reference's correctness contract: the maintained result equals a
    full re-execution of the query on the current collection state."""
    from javascript_vector_database_spark.tables import load_table

    docs = load_table(spark, sf_oracle, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    selector = {"lang": {"$in": ["en", "de"]}, "n_chars": {"$gte": 200}}
    rq = ReactiveQuery(spark, selector, str(tmp_path / "rq3"), id_col="doc_id")

    bulk1 = docs.withColumn("_deleted", F.lit(False)).withColumn("_lwt", F.lit(1.0))
    rq.apply_changes(bulk1)
    bulk2 = (
        docs.where(F.col("doc_id") % 3 == 0)
        .select("doc_id", F.lit("de").alias("lang"), (F.col("n_chars") - 150).alias("n_chars"))
        .withColumn("_deleted", F.lit(False))
        .withColumn("_lwt", F.lit(2.0))
    )
    rq.apply_changes(bulk2)

    # full re-exec on the simulated current state
    current = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("de")).otherwise(F.col("lang")).alias("lang"),
        F.when(F.col("doc_id") % 3 == 0, F.col("n_chars") - 150).otherwise(F.col("n_chars")).alias("n_chars"),
    )
    expected = current.where(mango_to_column(selector))
    got = {(r["doc_id"], r["lang"], r["n_chars"]) for r in rq.results().select("doc_id", "lang", "n_chars").collect()}
    want = {(r["doc_id"], r["lang"], r["n_chars"]) for r in expected.collect()}
    assert got == want
    assert rq.count() == len(want)


def test_streaming_live_count_is_incremental(spark, tmp_path):
    """Engine-level incremental count: per micro-batch only NEW rows are
    read (numInputRows), while the maintained per-group counts stay
    correct across batches — no reprocessing of old data."""
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    schema = "id long, color string"

    spark.createDataFrame(
        [(1, "red"), (2, "red"), (3, "blue")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    q = streaming_live_count(spark, src, schema, "color", query_name="lc_test")
    try:
        q.processAllAvailable()
        counts = {
            r["color"]: r["n"] for r in spark.sql("SELECT * FROM lc_test").collect()
        }
        assert counts == {"red": 2, "blue": 1}

        spark.createDataFrame([(4, "red"), (5, "green")], schema).coalesce(
            1
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
        counts = {
            r["color"]: r["n"] for r in spark.sql("SELECT * FROM lc_test").collect()
        }
        assert counts == {"red": 3, "blue": 1, "green": 1}
        # incremental: the last progress only ingested the 2 new rows
        batches = [p for p in (q.recentProgress or []) if p["numInputRows"] > 0]
        assert batches and batches[-1]["numInputRows"] == 2
    finally:
        q.stop()


def test_reactive_stream_foreachbatch(spark, tmp_path):
    """Streaming flavor: change bulks arrive as files; foreachBatch folds
    each into the maintained result."""
    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)
    rq = ReactiveQuery(
        spark, {"color": {"$eq": "red"}}, str(tmp_path / "rqs"), id_col="id"
    )
    _bulk(spark, [(1, "red", 1, False, 1.0), (2, "blue", 2, False, 1.0)]).coalesce(
        1
    ).write.mode("append").parquet(src)
    q = rq.start_stream(src, DOC_SCHEMA, str(tmp_path / "cp"))
    try:
        q.processAllAvailable()
        assert rq.count() == 1
        _bulk(spark, [(2, "red", 2, False, 2.0), (1, "red", 9, True, 2.0)]).coalesce(
            1
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
        assert rq.count() == 1
        assert {r["id"] for r in rq.results().collect()} == {2}
    finally:
        q.stop()


@pytest.mark.parametrize(
    "name", ["reactive_query_ivm", "reactive_count_ivm", "reactive_topk_ivm"]
)
def test_reactive_oracle(spark, sf_oracle, name):
    compare(spark, sf_oracle, registry.queries()[name], registry.oracle_sql()[name])


def test_sorted_limit_fallback_requery(spark, tmp_path):
    """Sort+limit live query (runFullQueryAgain, event-reduce.js:83-90):
    pure inserts maintain the bounded view incrementally; a remove or
    update touching an emitted row triggers the bounded re-run over the
    maintained match set — never the base scan — and after every bulk the
    emission equals a full re-query of the current state."""
    rq = ReactiveQuery(
        spark,
        {"color": {"$eq": "red"}},
        str(tmp_path / "rq_topk"),
        id_col="id",
        sort=[("score", "desc")],
        limit=2,
    )

    def emitted():
        return [
            (r["id"], r["score"])
            for r in rq.results().orderBy(F.col("score").desc(), "id").collect()
        ]

    # bulk 1: 5 reds + 1 blue -> top-2 by score
    rq.apply_changes(
        _bulk(
            spark,
            [(i, "red", i * 10, False, 1.0) for i in range(1, 6)]
            + [(9, "blue", 99, False, 1.0)],
        )
    )
    assert emitted() == [(5, 50), (4, 40)]
    assert rq.fallbacks == 0

    # bulk 2: PURE insert not touching the emitted rows -> incremental merge
    rq.apply_changes(_bulk(spark, [(6, "red", 45, False, 2.0)]))
    assert emitted() == [(5, 50), (6, 45)]
    assert rq.fallbacks == 0

    # bulk 3: remove the top row -> shrink below limit -> bounded re-run;
    # the new second row (4, 40) comes from the MAINTAINED set, not the bulk
    rq.apply_changes(_bulk(spark, [(5, "red", 50, True, 3.0)]))
    assert emitted() == [(6, 45), (4, 40)]
    assert rq.fallbacks == 1

    # bulk 4: update demotes an emitted row -> bounded re-run again
    rq.apply_changes(_bulk(spark, [(6, "red", 5, False, 4.0)]))
    assert emitted() == [(4, 40), (3, 30)]
    assert rq.fallbacks == 2

    # bulk 5: shrink the match set below the limit -> under-full emission
    rq.apply_changes(
        _bulk(
            spark,
            [(i, "red", i * 10, True, 5.0) for i in (1, 2, 3)]
            + [(6, "red", 5, True, 5.0)],
        )
    )
    assert emitted() == [(4, 40)]
    assert rq.fallbacks == 3


def test_streaming_watermark_drops_late_events(spark, tmp_path):
    """Watermarked windowed agg: a window finalizes once the watermark
    passes its end, and events arriving after that are dropped — the
    late-data contract for the 100 TB event pipeline."""
    import datetime as dt

    from javascript_vector_database_spark.streaming.reactive import (
        streaming_windowed_count,
    )

    src = str(tmp_path / "ev_src")
    os.makedirs(src, exist_ok=True)
    schema = "ts timestamp, user_id long"

    def write(events):
        spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, *hm), uid) for hm, uid in events], schema
        ).coalesce(1).write.mode("append").parquet(src)

    # window [10:00, 10:10): two on-time events
    write([((10, 0), 1), ((10, 2), 2)])
    q = streaming_windowed_count(spark, src, schema, query_name="wm_test")
    try:
        q.processAllAvailable()
        # batch 2: event at 11:00 pushes the watermark to 10:55 ->
        # the 10:00 window finalizes with n=2
        write([((11, 0), 3)])
        q.processAllAvailable()
        rows = {
            r["win_start"].strftime("%H:%M"): r["n"]
            for r in spark.sql("SELECT * FROM wm_test").collect()
        }
        assert rows == {"10:00": 2}
        # batch 3: a LATE event for the finalized window -> dropped
        write([((10, 3), 4)])
        q.processAllAvailable()
        # batch 4: advance watermark far enough to finalize 11:00 too
        write([((12, 0), 5)])
        q.processAllAvailable()
        rows = {
            r["win_start"].strftime("%H:%M"): r["n"]
            for r in spark.sql("SELECT * FROM wm_test").collect()
        }
        # the late 10:03 event did NOT reopen or bump the 10:00 window
        assert rows == {"10:00": 2, "11:00": 1}
    finally:
        q.stop()


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: every id emitted once; duplicates
    arriving in later micro-batches inside the watermark are dropped."""
    import datetime as dt

    from javascript_vector_database_spark.streaming.reactive import (
        streaming_dedup,
    )

    src = str(tmp_path / "dd_src")
    os.makedirs(src, exist_ok=True)
    schema = "id long, ts timestamp, v string"

    def write(rows):
        spark.createDataFrame(
            [(i, dt.datetime(2024, 1, 1, *hm), v) for i, hm, v in rows], schema
        ).coalesce(1).write.mode("append").parquet(src)

    write([(1, (10, 0), "a"), (2, (10, 0), "b"), (1, (10, 1), "a-dup")])
    q = streaming_dedup(spark, src, schema, query_name="dd_test")
    try:
        q.processAllAvailable()
        # cross-batch duplicate of id 1 and 2, plus a fresh id 3
        write([(1, (10, 2), "a-dup2"), (2, (10, 3), "b-dup"), (3, (10, 4), "c")])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM dd_test").collect()
        assert sorted(r["id"] for r in rows) == [1, 2, 3]
        got = {r["id"]: r["v"] for r in rows}
        assert got[1] == "a" and got[2] == "b"  # first occurrence wins
    finally:
        q.stop()


def test_streaming_hll_matches_batch(spark, tmp_path):
    """The live register table after N micro-batches equals the batch
    registers over the union of all batches (max is batch-boundary
    invariant), so the folded live estimate equals the batch estimate —
    and state stays bounded at m rows."""
    from javascript_vector_database_spark.operators.sketch import (
        HLL_M,
        hll_distinct_estimate,
        hll_estimate_from_registers,
    )
    from javascript_vector_database_spark.streaming.reactive import (
        streaming_hll_registers,
    )

    src = str(tmp_path / "hll_src")
    os.makedirs(src, exist_ok=True)
    schema = "user_id long"

    def write(ids):
        spark.createDataFrame([(i,) for i in ids], schema).coalesce(
            1
        ).write.mode("append").parquet(src)

    write(range(0, 300))
    q = streaming_hll_registers(spark, src, schema, query_name="hll_live")
    try:
        q.processAllAvailable()
        write(range(200, 700))  # overlap: distinct union is 0..699
        q.processAllAvailable()
        live = spark.sql("SELECT * FROM hll_live")
        assert live.count() <= HLL_M
        est = hll_estimate_from_registers(live).first()
        batch = hll_distinct_estimate(
            spark.createDataFrame([(i,) for i in range(700)], schema),
            "user_id",
        ).first()
        assert tuple(est) == tuple(batch)
    finally:
        q.stop()


def test_streaming_sessionize_extends_and_finalizes(spark, tmp_path):
    """session_window over a stream: an open session EXTENDS across
    micro-batches (no partial emission), finalizes exactly once when the
    watermark passes its close, and later events open a new session."""
    import datetime as dt

    from javascript_vector_database_spark.streaming.reactive import (
        streaming_sessionize,
    )

    src = str(tmp_path / "sess_src")
    os.makedirs(src, exist_ok=True)
    schema = "ts timestamp, user_id long"

    def write(events):
        spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, *hm), uid) for hm, uid in events], schema
        ).coalesce(1).write.mode("append").parquet(src)

    # user 1: events at 10:00 and 10:10 (same session, gap 30m)
    write([((10, 0), 1), ((10, 10), 1)])
    q = streaming_sessionize(spark, src, schema, query_name="sess_test")
    try:
        q.processAllAvailable()
        # nothing finalized yet: the watermark hasn't passed 10:40
        assert spark.sql("SELECT * FROM sess_test").count() == 0
        # batch 2 EXTENDS the open session (10:20 < 10:10+30m) — still
        # one session, still open
        write([((10, 20), 1)])
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM sess_test").count() == 0
        # batch 3: 12:00 pushes the watermark past 10:50 -> the merged
        # 3-event session [10:00, 10:50) finalizes as ONE row, and a new
        # session opens at 12:00
        write([((12, 0), 1)])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sess_test").collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["user_id"] == 1 and r["n_events"] == 3
        assert r["session_start"].strftime("%H:%M") == "10:00"
        assert r["session_end"].strftime("%H:%M") == "10:50"
        # batch 4: advance far enough to finalize the 12:00 session too
        write([((14, 0), 1)])
        q.processAllAvailable()
        got = {
            (r["session_start"].strftime("%H:%M"), r["n_events"])
            for r in spark.sql("SELECT * FROM sess_test").collect()
        }
        assert got == {("10:00", 3), ("12:00", 1)}
    finally:
        q.stop()


def test_stateful_session_tracker_closes_on_timeout(spark, tmp_path):
    """Custom-state sessionization: the open session extends across
    batches, is emitted exactly once when the event-time timeout fires
    (watermark past last-event + gap), and its state is removed."""
    import datetime as dt

    from javascript_vector_database_spark.streaming.stateful import (
        stateful_session_tracker,
    )

    src = str(tmp_path / "st_src")
    os.makedirs(src, exist_ok=True)
    schema = "ts timestamp, user_id long"

    def write(events):
        spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, *hm), uid) for hm, uid in events], schema
        ).coalesce(1).write.mode("append").parquet(src)

    write([((10, 0), 1), ((10, 10), 1)])
    q = stateful_session_tracker(spark, src, schema, query_name="st_test")
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM st_test").count() == 0  # still open
        # advance the watermark past 10:10 + 30m; the timeout is evaluated
        # against the watermark of the PREVIOUS batch, so two writes
        write([((12, 0), 2)])
        q.processAllAvailable()
        write([((12, 1), 2)])
        q.processAllAvailable()
        rows = [
            r
            for r in spark.sql("SELECT * FROM st_test").collect()
            if r["user_id"] == 1
        ]
        assert len(rows) == 1
        r = rows[0]
        start = dt.datetime.fromtimestamp(r["session_start_ms"] / 1000, dt.UTC)
        end = dt.datetime.fromtimestamp(r["session_end_ms"] / 1000, dt.UTC)
        assert (start.hour, start.minute) == (10, 0)
        assert (end.hour, end.minute) == (10, 10)
        assert r["n_events"] == 2
    finally:
        q.stop()


def test_stateful_user_stats_accumulates(spark, tmp_path):
    """applyInPandasWithState: per-key state persists across micro-batches;
    update mode re-emits only touched keys with their new running stats."""
    from javascript_vector_database_spark.streaming.stateful import (
        stateful_user_stats,
    )

    src = str(tmp_path / "st_src")
    os.makedirs(src, exist_ok=True)
    schema = "user_id long, value double"
    spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    q = stateful_user_stats(spark, src, schema, query_name="st_test")
    try:
        q.processAllAvailable()
        rows = {
            r["user_id"]: (r["n_events"], r["total_value"], r["max_value"])
            for r in spark.sql(
                "SELECT * FROM st_test ORDER BY user_id"
            ).collect()
        }
        assert rows == {1: (2, 30.0, 20.0), 2: (1, 5.0, 5.0)}

        # batch 2 touches only user 1: its state accumulates; user 2's
        # state survives untouched in the store
        spark.createDataFrame([(1, 40.0)], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        latest = {}
        for r in spark.sql("SELECT * FROM st_test").collect():
            latest[r["user_id"]] = (r["n_events"], r["total_value"], r["max_value"])
        assert latest[1] == (3, 70.0, 40.0)
        assert latest[2] == (1, 5.0, 5.0)
    finally:
        q.stop()


def test_streaming_cms_matches_batch(spark, tmp_path):
    """The live CMS cell table after N micro-batches is bit-identical to
    the batch sketch over the union (exact integer sums are
    batch-boundary invariant), state stays bounded at d*w cells, and
    probing the live table estimates correctly."""
    from javascript_vector_database_spark.operators.sketch import (
        CMS_D,
        CMS_W,
        cms_counters,
        cms_estimate,
    )
    from javascript_vector_database_spark.streaming.reactive import (
        streaming_cms_counters,
    )

    src = str(tmp_path / "cms_src")
    os.makedirs(src, exist_ok=True)
    schema = "tok string"

    def write(toks):
        spark.createDataFrame([(t,) for t in toks], schema).coalesce(
            1
        ).write.mode("append").parquet(src)

    batch1 = [f"tok{i % 7}" for i in range(100)]
    batch2 = [f"tok{i % 11}" for i in range(150)]
    write(batch1)
    q = streaming_cms_counters(spark, src, schema, query_name="cms_live")
    try:
        q.processAllAvailable()
        write(batch2)
        q.processAllAvailable()
        live = spark.sql("SELECT * FROM cms_live")
        assert live.count() <= CMS_D * CMS_W
        both = spark.createDataFrame([(t,) for t in batch1 + batch2], schema)
        one = {
            (r["i"], r["pos"]): r["cnt"] for r in cms_counters(both, "tok").collect()
        }
        got = {(r["i"], r["pos"]): r["cnt"] for r in live.collect()}
        assert got == one
        qdf = spark.createDataFrame([("tok0",), ("zz_absent",)], schema)
        est = {
            r["tok"]: r["est_count"]
            for r in cms_estimate(live, qdf, "tok").collect()
        }
        exact_tok0 = sum(1 for t in batch1 + batch2 if t == "tok0")
        assert est["tok0"] >= exact_tok0 and est["zz_absent"] == 0
    finally:
        q.stop()
