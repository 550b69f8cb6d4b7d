"""RxState analog: replicated KV state as an op-log fold (SURVEY §2.9).

Reference: each `state.set(path, modifier)` appends an op-log doc
`{id: monotonic counter, sId, ops: [{k, v}]}`; the live state is the fold
of ops in id order (MAP#rxdb/dist/esm/plugins/state/rx-state.js:46-116,
id counter MAP#.../state/helpers.js:48-55).  Here the op-log is a small
parquet table and the fold is `max_by(value, id)` per path — one tiny
shuffle, and the same query shape scales to any op-log size.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


#: ops kept before :meth:`RxState.compact` auto-runs inside ``set()`` —
#: without it the log grows unbounded and every fold pays for dead ops
#: (the reference's rx-state op-log has the same shape in miniature)
DEFAULT_COMPACT_THRESHOLD = 256


class RxState:
    """Op-log-backed KV state. Values are JSON-encoded strings.

    The log is compacted (folded to one surviving op per key and
    rewritten) automatically once it exceeds ``compact_threshold`` ops,
    or explicitly via :meth:`compact`.  Surviving ops keep their original
    ``op_id``/``sid``, so id monotonicity and the fold result are
    unchanged — compaction only deletes ops that ``max_by(v, op_id)``
    could never return."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        writer_id: str = "driver",
        compact_threshold: int | None = DEFAULT_COMPACT_THRESHOLD,
    ):
        self.spark = spark
        self.path = path
        self.writer_id = writer_id
        self.compact_threshold = compact_threshold

    def _oplog(self):
        if not os.path.exists(self.path):
            return None
        return self.spark.read.parquet(self.path)

    def _log_stats(self) -> tuple[int, int]:
        """(next op id, live op count) in one aggregate pass."""
        log = self._oplog()
        if log is None:
            return 0, 0
        mx, n = log.agg(F.max("op_id"), F.count("*")).first()
        return int(mx) + 1, int(n)

    def set(self, key: str, value) -> None:
        """Append one op doc (the reference's insert-with-retry collapses
        to a plain append under a single writer — the Spark driver).

        ``value`` may be a MODIFIER closure ``old -> new`` exactly like the
        reference's ``state.set(path, modifier)``
        (MAP#rxdb/dist/esm/plugins/state/rx-state.js:46-52): it is applied
        to the current folded value (None when unset) and the result is
        appended as the op."""
        if callable(value):
            value = value(self.get(key))
        next_id, n_ops = self._log_stats()
        row = [(next_id, self.writer_id, key, json.dumps(value))]
        df = self.spark.createDataFrame(
            row, "op_id long, sid string, k string, v string"
        )
        df.write.mode("append").parquet(self.path)
        if self.compact_threshold is not None and n_ops + 1 > self.compact_threshold:
            self.compact()

    def compact(self) -> None:
        """Fold-and-rewrite: keep only the winning op per key (the one
        ``max_by(v, op_id)`` returns) and atomically swap the rewritten
        log in.  Ids/sids survive, so a fold over the compacted log is
        bit-identical to one over the full history, and ``_log_stats``
        stays monotonic.  The surviving set is one row per key — KV state
        is small by construction (the reference holds it in a JS object),
        so the collect is bounded by the keyspace, not the op count."""
        log = self._oplog()
        if log is None:
            return
        survivors = (
            log.groupBy("k")
            .agg(
                F.max_by(F.struct("op_id", "sid", "v"), F.col("op_id")).alias("w")
            )
            .select(F.col("w.op_id"), F.col("w.sid"), F.col("k"), F.col("w.v"))
            .collect()
        )
        df = self.spark.createDataFrame(
            [(int(r["op_id"]), r["sid"], r["k"], r["v"]) for r in survivors],
            "op_id long, sid string, k string, v string",
        )
        tmp = self.path.rstrip("/") + ".compact.tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = self.path.rstrip("/") + ".compact.old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)

    def snapshot(self):
        """state = last value per key in op-id order."""
        log = self._oplog()
        if log is None:
            return {}
        rows = (
            log.groupBy("k")
            .agg(F.max_by("v", F.col("op_id")).alias("v"))
            .collect()
        )
        return {r["k"]: json.loads(r["v"]) for r in rows}

    def get(self, key: str, default=None):
        return self.snapshot().get(key, default)

    def clear(self) -> None:
        if os.path.exists(self.path):
            shutil.rmtree(self.path)
