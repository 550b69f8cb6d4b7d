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


class RxState:
    """Op-log-backed KV state. Values are JSON-encoded strings."""

    def __init__(self, spark: SparkSession, path: str, writer_id: str = "driver"):
        self.spark = spark
        self.path = path
        self.writer_id = writer_id

    def _oplog(self):
        if not os.path.exists(self.path):
            return None
        return self.spark.read.parquet(self.path)

    def _next_id(self) -> int:
        log = self._oplog()
        if log is None:
            return 0
        return int(log.agg(F.max("op_id")).first()[0]) + 1

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
        row = [(self._next_id(), self.writer_id, key, json.dumps(value))]
        df = self.spark.createDataFrame(
            row, "op_id long, sid string, k string, v string"
        )
        df.write.mode("append").parquet(self.path)

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
