"""Reactive (live) queries: event-reduce incremental view maintenance.

Reference semantics: ``RxQuery.$`` re-emits maintained results per change
bulk WITHOUT re-executing the query — ``_ensureEqual`` feeds each change
bulk through the event-reduce algorithm against the previous result set
(MAP#rxdb/dist/esm/rx-query.js:401-491); count queries maintain the count
±1 per matching state transition (MAP#rxdb/dist/esm/rx-query.js:432-449);
each event maps to an action on the previous results
(MAP#rxdb/dist/esm/event-reduce.js:58-96).

Spark-first mapping — the maintained result set is a keyed table and every
update is a delta-only MERGE computed from the change bulk alone (never a
re-scan of the base collection):

* ``ReactiveQuery`` — batch flavor: explicit ``apply_changes(bulk)``,
  exactly the reference loop (collapse bulk to latest-per-id, classify
  each doc's transition, merge adds/updates, anti-merge removes, bump the
  maintained count by adds − removes).  O(|bulk| + |result|) per bulk.
* ``ReactiveQuery.start_stream`` — Structured Streaming flavor:
  ``readStream -> foreachBatch(apply_changes)`` with Spark's checkpoint
  log; each micro-batch is one change bulk.
* ``streaming_live_count`` — pure-engine flavor: update-mode stateful
  aggregation; Spark's state store IS the incremental count (per-batch
  input rows are only the new events — asserted in tests via
  ``lastProgress.numInputRows``).

Scale: the result table is keyed by the primary key; with Delta the merge
is ``MERGE INTO`` on the PK (bucketed → no shuffle).  The fallback the
reference takes for sorted+limited live queries ("runFullQueryAgain",
event-reduce.js:83-90) applies here too: a limit query's maintained set
can shrink below the limit on removes, so ``limit`` queries re-run the
bounded query against the result+bulk union — still never the base scan.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from javascript_vector_database_spark.operators.dml import ParquetTable
from javascript_vector_database_spark.operators.mango import mango_to_column


class ReactiveQuery:
    """Event-reduce-maintained live Mango query over a change stream.

    ``selector`` is a Mango selector dict (operators.mango surface); docs
    also carry ``_deleted`` and ``_lwt`` change-event meta columns.
    """

    def __init__(
        self,
        spark: SparkSession,
        selector: dict[str, Any],
        workdir: str,
        id_col: str = "id",
        sort: list[tuple[str, str]] | None = None,
        limit: int | None = None,
    ):
        self.spark = spark
        self.selector = selector
        self.id_col = id_col
        self.sort = sort
        self.limit = limit
        self.result = ParquetTable(spark, os.path.join(workdir, "result"), id_col)
        #: bounded live view for sort+limit queries (reference semantics:
        #: event-reduce maintains the limited result and falls back to
        #: "runFullQueryAgain" on doubtful transitions, event-reduce.js:83-90)
        self.emission = ParquetTable(
            spark, os.path.join(workdir, "emission"), id_col, n_buckets=None
        )
        #: number of bounded re-runs taken (the runFullQueryAgain analog);
        #: tests assert the fallback fires exactly on shrink/update bulks
        self.fallbacks = 0
        self._meta_path = os.path.join(workdir, "count.json")
        os.makedirs(workdir, exist_ok=True)

    # -- maintained state ----------------------------------------------------

    def count(self) -> int:
        """The incrementally-maintained count (rx-query.js:432-449): never
        recomputed from the result table, only bumped per bulk."""
        if not os.path.exists(self._meta_path):
            return 0
        with open(self._meta_path) as f:
            return int(json.load(f)["count"])

    def _write_count(self, n: int) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"count": n}, f)
        os.replace(tmp, self._meta_path)

    def results(self) -> DataFrame:
        """The maintained result set (RxQuery.$ emission).  For sort+limit
        queries this is the maintained BOUNDED view, not the full match
        set."""
        if self.limit is not None:
            return self.emission.docs() if self.emission.exists() else None
        if not self.result.exists():
            return None
        return self.result.docs()

    # -- sort+limit live view (event-reduce.js:83-90) ------------------------

    def _sort_cols(self):
        cols = []
        for c, d in self.sort or []:
            cols.append(
                F.col(c).desc() if str(d).lower().startswith("desc") else F.col(c).asc()
            )
        # PK appended as the deterministic tiebreak, exactly like the
        # reference's normalized sort (rx-query-helper.js:128-136)
        cols.append(F.col(self.id_col).asc())
        return cols

    def _bounded(self, df: DataFrame) -> DataFrame:
        """The bounded query: sort + limit + PK tiebreak.  Compiles to
        TakeOrderedAndProject — per-partition partial top-k."""
        return df.orderBy(*self._sort_cols()).limit(self.limit)

    def _maintain_emission(self, latest: DataFrame, now_matching: DataFrame) -> None:
        """Maintain the bounded live view after the full match set folded a
        bulk.  Two paths, mirroring event-reduce's action table:

        * pure inserts (bulk never touches a currently-emitted row):
          bounded re-rank of emission ∪ new matches — O(limit + |bulk|).
        * any update/remove touching an emitted row (including a remove
          that shrinks the set below the limit): the reference's
          ``runFullQueryAgain`` fallback — re-run the bounded query over
          the maintained match set (= previous result ∪ every folded
          bulk), NEVER the base collection scan.
        """
        id_col = self.id_col
        if not self.emission.exists():
            self.emission._swap_in(self._bounded(self.result.docs()))
            return
        em = self.emission.df()
        touched = em.join(latest.select(id_col), id_col, "left_semi").count()
        if touched:
            self.fallbacks += 1
            new_em = self._bounded(self.result.docs())
        else:
            fresh = now_matching.join(em.select(id_col), id_col, "left_anti")
            new_em = self._bounded(
                em.unionByName(fresh, allowMissingColumns=True)
            )
        self.emission._swap_in(new_em)

    # -- event-reduce (MAP#event-reduce.js:58-96) ----------------------------

    def apply_changes(self, bulk: DataFrame) -> dict[str, int]:
        """Fold one change bulk into the maintained result set.

        Touches ONLY the bulk and the result table: latest state per id
        within the bulk (a change bulk can carry several revisions of one
        doc, last wins by (_lwt, id) like the reference's event buffer
        ordering), then the four event-reduce outcomes collapse to two
        delta sets — ``now_matching`` (insert-or-update) and
        ``now_unmatching`` (remove if present)."""
        id_col = self.id_col
        others = [c for c in bulk.columns if c != id_col]
        latest = (
            bulk.groupBy(id_col)
            .agg(F.max_by(F.struct(*others), F.col("_lwt")).alias("s"))
            .select(id_col, "s.*")
        )
        match = mango_to_column(self.selector) & ~F.col("_deleted")
        latest = latest.withColumn("__match", match).cache()
        try:
            now_matching = latest.where(F.col("__match")).drop("__match")
            now_unmatching = latest.where(~F.col("__match")).drop("__match")

            if not self.result.exists():
                n_added = now_matching.count()
                self.result.bulk_upsert(now_matching)
                self._write_count(n_added)
                if self.limit is not None:
                    self._maintain_emission(latest, now_matching)
                return {"added": n_added, "removed": 0}

            existing = self.result.docs().select(id_col)
            n_added = now_matching.join(existing, id_col, "left_anti").count()
            n_removed = (
                now_unmatching.select(id_col)
                .join(existing, id_col, "left_semi")
                .count()
            )
            self.result.bulk_upsert(now_matching)
            if n_removed:
                # hard-remove from the maintained set (the result table is
                # a view, not the collection — no tombstone); only the
                # partitions the removed keys hash into are rewritten
                self.result.bulk_delete_rows(now_unmatching.select(id_col))
            self._write_count(self.count() + n_added - n_removed)
            if self.limit is not None:
                self._maintain_emission(latest, now_matching)
            return {"added": n_added, "removed": n_removed}
        finally:
            latest.unpersist()

    # -- streaming flavor ----------------------------------------------------

    def start_stream(self, source_dir: str, schema, checkpoint_dir: str):
        """readStream(change bulks) -> foreachBatch(apply_changes): each
        micro-batch is one change bulk; Spark's offset log makes the fold
        exactly-once.  ``processAllAvailable()`` ≡ awaitIdle."""
        stream = self.spark.readStream.schema(schema).parquet(source_dir)
        # default micro-batch trigger (NOT availableNow): a live query keeps
        # listening for later change bulks; processAllAvailable() is the
        # awaitIdle barrier between bulks
        return (
            stream.writeStream.foreachBatch(
                lambda batch, _epoch: self.apply_changes(batch)
            )
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )


def streaming_windowed_count(
    spark: SparkSession,
    source_dir: str,
    schema,
    ts_col: str = "ts",
    window_duration: str = "10 minutes",
    watermark: str = "5 minutes",
    query_name: str = "windowed_count",
):
    """Watermarked tumbling-window count, append mode — the late-data
    discipline a 100 TB event pipeline needs (absent in the reference,
    SURVEY §2.9; part of the beyond-reference streaming surface): events
    older than (max event time − watermark) are DROPPED, and a window is
    emitted exactly once, when the watermark passes its end."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("n"),
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def streaming_sessionize(
    spark: SparkSession,
    source_dir: str,
    schema,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    query_name: str = "sessionize_stream",
):
    """Watermarked streaming sessionization: ``F.session_window`` merges a
    user's events into gap-separated sessions INCREMENTALLY — an open
    session extends (or two sessions fuse) as events arrive, and a session
    is emitted exactly once, when the watermark passes its close (append
    mode).  This is the streaming flavor of the batch
    ``events_session_window_agg`` query (registry/feed_state.py:245): same
    gap semantics, but over an unbounded stream with state bounded by the
    watermark — open sessions for quiet users are evicted once no on-time
    event can extend them, which is what makes per-user session state
    viable over a 100 TB event firehose.  Beyond-reference streaming
    surface (SURVEY §2.9)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap),
            F.col(user_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            F.col("n_events"),
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def streaming_hll_registers(
    spark: SparkSession,
    source_dir: str,
    schema,
    col: str = "user_id",
    query_name: str = "hll_stream",
):
    """Live distinct-count sketch: maintain the deterministic HLL
    registers (operators/sketch.py) as a streaming max-aggregation.
    Stateful-agg state is BOUNDED at m=256 (bucket → max-rank) rows no
    matter how many events flow — the streaming composition of the
    mergeable-sketch property (max is idempotent/commutative, so
    arbitrary micro-batch boundaries cannot change the registers).
    Complete-mode memory sink exposes the live register table; fold it
    with ``hll_estimate_from_registers`` for the current estimate.  A
    100 TB firehose gets a live distinct-users dashboard with constant
    state and no raw-event retention."""
    from javascript_vector_database_spark.operators.sketch import HLL_W_BITS

    stream = spark.readStream.schema(schema).parquet(source_dir)
    h = F.md5(F.col(col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    w = F.conv(F.substring(h, 3, 13), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.bin(w))
    )
    regs = (
        stream.select(bucket.alias("b"), rho.alias("r"))
        .groupBy("b")
        .agg(F.max("r").alias("M"))
    )
    return (
        regs.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def streaming_dedup(
    spark: SparkSession,
    source_dir: str,
    schema,
    id_col: str = "id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    query_name: str = "dedup_stream",
):
    """Streaming exactly-once event dedup: each id is emitted on first
    sight and duplicates arriving within the watermark window are dropped
    (``dropDuplicatesWithinWatermark``).  The watermark BOUNDS the dedup
    state — per-id entries are evicted once the watermark passes, which is
    what makes this viable over an unbounded 100 TB event stream (plain
    ``dropDuplicates`` on a stream grows state forever).  Part of the
    beyond-reference streaming surface (SURVEY §2.9): the reference dedups
    via the doc-cache Set, which is the same first-wins semantics without
    an eviction contract."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    deduped = stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [id_col]
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def streaming_live_count(
    spark: SparkSession,
    source_dir: str,
    schema,
    group_col: str,
    query_name: str = "live_count",
):
    """Engine-level incremental count: update-from-state aggregation over a
    document stream.  Spark's stateful agg maintains per-group counts in
    the state store — each micro-batch reads ONLY new rows
    (``lastProgress.numInputRows``) and merges into state; this is the
    §2.4 incremental-count analog at the engine level (complete-mode
    memory sink so tests can read the maintained table)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def streaming_cms_counters(
    spark: SparkSession,
    source_dir: str,
    schema,
    col: str = "tok",
    query_name: str = "cms_stream",
):
    """Live frequency sketch: maintain the deterministic Count-Min
    counters (operators/sketch.py) as a streaming SUM aggregation —
    the additive sibling of :func:`streaming_hll_registers`'s max
    registers.  State is bounded at d*w = 4096 (row, position) cells no
    matter how many items flow; sums are exact integers, so arbitrary
    micro-batch boundaries produce the bit-identical sketch a one-shot
    batch build does (the mergeable-sketch property, streaming-composed).
    Probe the live table with ``cms_estimate`` for current counts."""
    from javascript_vector_database_spark.operators.sketch import (
        CMS_D,
        CMS_W,
        _md5_pair,
    )

    stream = spark.readStream.schema(schema).parquet(source_dir)
    v1, v2 = _md5_pair(F.col(col))
    rows = stream.select(
        v1.alias("__v1"),
        v2.alias("__v2"),
        F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("i"),
    )
    cells = (
        rows.select(
            "i", ((F.col("__v1") + F.col("i") * F.col("__v2")) % CMS_W).alias("pos")
        )
        .groupBy("i", "pos")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        cells.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
