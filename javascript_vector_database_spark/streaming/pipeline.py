"""The derived-collection pipeline (reference `addPipeline`, SURVEY §2.9).

Reference semantics (MAP#rxdb/dist/esm/plugins/pipeline/rx-pipeline.js):

* checkpointed micro-batch loop: pull ≤ batch_size changed docs since the
  checkpoint, ordered by (lwt, id) (:48-101)
* run an async handler over the batch, upsert results into the
  destination (app handler src/database.ts:181-205)
* persist checkpoint {lwt, id} after each batch (:141-173)
* `await_idle` drains until the source is exhausted (:102-112)
* handler idempotence via anti-join against existing destination rows
  (src/database.ts:184-192)
* single writer (leader election :176-178) — Spark's driver IS the
  leader; nothing to emulate.

Two flavors:

* ``Pipeline`` — batch drain loop with an explicit JSON checkpoint file;
  exactly the reference's loop, testable for crash/resume exactly-once.
* ``streaming_pipeline`` — Structured Streaming ``foreachBatch`` with
  Spark's own checkpointLocation; the scale path (offset log ≡
  checkpoint doc, processAllAvailable ≡ awaitIdle).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from javascript_vector_database_spark.operators.dml import ParquetTable

Handler = Callable[[DataFrame], DataFrame]


class Pipeline:
    """Batch-flavor checkpointed pipeline over a source parquet table."""

    def __init__(
        self,
        spark: SparkSession,
        identifier: str,
        source_path: str,
        destination: ParquetTable,
        handler: Handler,
        checkpoint_dir: str,
        source_pk: str = "id",
        lwt_col: str = "_lwt",
        batch_size: int = 1000,
    ):
        self.spark = spark
        self.identifier = identifier
        self.source_path = source_path
        self.destination = destination
        self.handler = handler
        self.source_pk = source_pk
        self.lwt_col = lwt_col
        self.batch_size = batch_size
        self.cp_path = os.path.join(checkpoint_dir, f"{identifier}.json")
        os.makedirs(checkpoint_dir, exist_ok=True)

    # -- checkpoint doc (MAP#rx-pipeline.js:141-173) -------------------------

    def _read_checkpoint(self) -> tuple[float, object] | None:
        if not os.path.exists(self.cp_path):
            return None
        with open(self.cp_path) as f:
            cp = json.load(f)
        return cp["lwt"], cp["id"]

    def _write_checkpoint(self, lwt: float, id_) -> None:
        tmp = self.cp_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"lwt": lwt, "id": id_}, f)
        os.replace(tmp, self.cp_path)  # atomic: crash keeps the old cp

    # -- drain loop (MAP#rx-pipeline.js:48-101) ------------------------------

    def _next_batch(self) -> DataFrame:
        """Scale note: ``orderBy().limit()`` compiles to
        TakeOrderedAndProject — a per-partition batch_size-heap + k-row
        driver merge, NOT a full sort.  Each drain step still rescans the
        source above the checkpoint, but the keyset predicate is sargable,
        so with the source laid out by (lwt bucket) partitioning the scan
        prunes to files past the checkpoint (Delta CDF analog).  For
        unbounded sources the ``streaming_pipeline`` flavor below is the
        real scale path — Spark's offset log replaces the rescan."""
        src = self.spark.read.parquet(self.source_path)
        cp = self._read_checkpoint()
        if cp is not None:
            lwt, id_ = cp
            src = src.where(
                (F.col(self.lwt_col) > F.lit(lwt))
                | ((F.col(self.lwt_col) == F.lit(lwt)) & (F.col(self.source_pk) > F.lit(id_)))
            )
        return src.orderBy(
            F.col(self.lwt_col).asc(), F.col(self.source_pk).asc()
        ).limit(self.batch_size)

    def run_once(self) -> int:
        """One micro-batch: returns rows processed (0 = idle)."""
        batch = self._next_batch().cache()
        try:
            # one job for batch size + checkpoint tail (max (lwt, id))
            head = batch.agg(
                F.count(F.lit(1)).alias("n"),
                F.max(F.struct(self.lwt_col, self.source_pk)).alias("tail"),
            ).first()
            n = head["n"]
            if n == 0:
                return 0
            out = self.handler(batch)
            if out is not None:
                self.destination.bulk_upsert(out)
            self._write_checkpoint(float(head["tail"][0]), head["tail"][1])
            return n
        finally:
            batch.unpersist()

    def await_idle(self, max_batches: int = 10_000) -> int:
        """Drain until exhausted (reference awaitIdle); returns total rows."""
        total = 0
        for _ in range(max_batches):
            n = self.run_once()
            if n == 0:
                return total
            total += n
        raise RuntimeError("pipeline did not drain")


def anti_join_new(batch: DataFrame, dest: ParquetTable, batch_key: str, dest_key: str) -> DataFrame:
    """The handler's idempotence guard: skip docs whose derived row already
    exists (reference src/database.ts:184-192)."""
    if not dest.exists():
        return batch
    existing = dest.docs().select(F.col(dest_key).alias(batch_key))
    return batch.join(existing, batch_key, "left_anti")


def streaming_pipeline(
    spark: SparkSession,
    source_dir: str,
    schema,
    handler: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
):
    """Structured Streaming flavor: file source -> foreachBatch(handler)
    with Spark's checkpoint/offset log for exactly-once.  Call
    ``q.processAllAvailable()`` for the awaitIdle barrier, then
    ``q.stop()``."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(handler)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
