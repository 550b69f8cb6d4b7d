"""Write-path DML over parquet tables (SURVEY.md §2.10).

The reference's write surface: insert/bulkInsert with per-row 409 conflict
reports (MAP#rxdb/dist/esm/rx-collection.js:165-242), upsert/bulkUpsert
(overwrite on conflict, :294-342), soft delete (`_deleted: true`,
:243-289), optimistic revisions ``_rev`` bumped per write.

Spark has no in-place mutation; a managed table here is a parquet
directory rewritten via MERGE-shaped dataframe plans (Delta's MERGE INTO
would do this transactionally at scale — same logical plan, the emulation
is anti-join + union).  All operators are id-partition-shuffle joins;
with Delta + bucketing they co-locate without a shuffle.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _rev_bump(prev_rev: F.Column, payload_hash: F.Column) -> F.Column:
    """`_rev` = '<height>-<hash>' bumped per write
    (MAP#rxdb/dist/esm/plugins/utils/utils-revision.js:1-41)."""
    height = F.split(prev_rev, "-").getItem(0).cast("long")
    return F.concat(
        F.coalesce(height + 1, F.lit(1)).cast("string"), F.lit("-"), payload_hash
    )


def _payload_hash(cols: list[str]) -> F.Column:
    """Deterministic content hash of the user fields (name-sorted, meta
    columns excluded) — the reference's revision hash analog; md5 over a
    '|'-joined cast keeps it reproducible in the DuckDB oracle."""
    user = sorted(c for c in cols if c not in ("_rev", "_deleted", "_lwt"))
    return F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in user]))


class ParquetTable:
    """A tiny managed table: parquet dir + PK, giving the reference's DML
    verbs as atomic read-modify-write cycles (write temp, swap)."""

    def __init__(self, spark: SparkSession, path: str, primary_key: str):
        self.spark = spark
        self.path = path
        self.primary_key = primary_key

    # -- read ---------------------------------------------------------------

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def df(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def docs(self) -> DataFrame:
        """Non-deleted view (the implicit `_deleted=false` filter)."""
        d = self.df()
        return d.where(~F.col("_deleted")) if "_deleted" in d.columns else d

    # -- write --------------------------------------------------------------

    def _stamp(self, rows: DataFrame, lwt: float | None = None) -> DataFrame:
        lwt = time.time() * 1000.0 if lwt is None else lwt
        out = rows
        if "_deleted" not in rows.columns:
            out = out.withColumn("_deleted", F.lit(False))
        return out.withColumn("_lwt", F.lit(float(lwt)))

    def _swap_in(self, new_df: DataFrame) -> None:
        tmp = self.path + ".tmp"
        new_df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(self.path):
            shutil.rmtree(self.path)
        os.replace(tmp, self.path)

    def bulk_insert(self, rows: DataFrame, lwt: float | None = None) -> dict[str, int]:
        """Insert; rows whose PK already exists are rejected per-row (the
        reference's 409 conflict category) while the rest succeed.  New
        rows are stamped `_rev = '1-<hash>'` (utils-revision.js:1-41)."""
        pk = self.primary_key
        rows = self._stamp(rows.drop("_rev"), lwt)
        rows = rows.withColumn(
            "_rev", F.concat(F.lit("1-"), _payload_hash(rows.columns))
        )
        if not self.exists():
            self._swap_in(rows)
            return {"success": rows.count() if rows.isStreaming is False else -1, "conflict": 0}
        cur = self.df()
        # one counting job for both tallies (pattern: pipeline.run_once)
        tagged = rows.join(
            cur.select(pk).withColumn("__dup", F.lit(True)), pk, "left"
        )
        stats = tagged.agg(
            F.count(F.lit(1)).alias("total"),
            F.count(F.col("__dup")).alias("conflict"),
        ).first()
        accepted = tagged.where(F.col("__dup").isNull()).drop("__dup")
        self._swap_in(cur.unionByName(accepted, allowMissingColumns=True))
        return {
            "success": int(stats["total"]) - int(stats["conflict"]),
            "conflict": int(stats["conflict"]),
        }

    def bulk_upsert(self, rows: DataFrame, lwt: float | None = None) -> None:
        """MERGE: matched -> replace with new state, not matched -> insert
        (reference bulkUpsert, rx-collection.js:294-342).  `_rev` height is
        bumped over the matched row's revision ('<h+1>-<hash>'), '1-<hash>'
        for fresh inserts (utils-revision.js:1-41)."""
        pk = self.primary_key
        rows = self._stamp(rows.drop("_rev"), lwt)
        if not self.exists():
            self._swap_in(
                rows.withColumn(
                    "_rev", F.concat(F.lit("1-"), _payload_hash(rows.columns))
                )
            )
            return
        cur = self.df()
        if "_rev" in cur.columns:
            prev = cur.select(pk, F.col("_rev").alias("__prev_rev"))
            merged = rows.join(prev, pk, "left")
        else:
            merged = rows.withColumn("__prev_rev", F.lit(None).cast("string"))
        merged = merged.withColumn(
            "_rev", _rev_bump(F.col("__prev_rev"), _payload_hash(rows.columns))
        ).drop("__prev_rev")
        kept = cur.join(merged.select(pk), pk, "left_anti")
        self._swap_in(kept.unionByName(merged, allowMissingColumns=True))

    def incremental_modify(
        self,
        selector: dict,
        set_exprs: dict[str, F.Column],
        lwt: float | None = None,
    ) -> None:
        """UPDATE: apply column expressions to the rows matching a Mango
        selector — the reference's incrementalModify/incrementalPatch
        (MAP#rxdb/dist/esm/rx-document.js incremental ops; the
        conflict-retry loop collapses to one atomic read-modify-write
        under the single-writer driver, which is also why plain
        incrementalUpsert degenerates to bulk_upsert here).  `_rev` height
        is bumped on modified rows; soft-deleted rows are never touched."""
        from javascript_vector_database_spark.operators.mango import (
            mango_to_column,
        )

        lwt = time.time() * 1000.0 if lwt is None else lwt
        cur = self.df()
        user_cols = list(cur.columns)
        hit = mango_to_column(selector) & ~F.col("_deleted")
        out = cur.withColumn("__hit", hit)
        for c, e in set_exprs.items():
            out = out.withColumn(c, F.when(F.col("__hit"), e).otherwise(F.col(c)))
        out = out.withColumn(
            "_lwt", F.when(F.col("__hit"), F.lit(float(lwt))).otherwise(F.col("_lwt"))
        )
        if "_rev" in user_cols:
            out = out.withColumn(
                "_rev",
                F.when(
                    F.col("__hit"),
                    _rev_bump(F.col("_rev"), _payload_hash(user_cols)),
                ).otherwise(F.col("_rev")),
            )
        self._swap_in(out.drop("__hit"))

    def bulk_remove(self, ids, lwt: float | None = None) -> None:
        """Soft delete: set `_deleted = true`, keep the row for the change
        feed (reference rx-collection.js:243-289), bump `_rev`.  ``ids``
        is a Python list or a single-column DataFrame of keys (the scale
        path — no driver round-trip)."""
        lwt = time.time() * 1000.0 if lwt is None else lwt
        cur = self.df()
        pk = self.primary_key
        user_cols = list(cur.columns)
        if isinstance(ids, DataFrame):
            # dedup: duplicate keys in ids would fan out the left join and
            # duplicate table rows (reference bulkRemove dedups by pk)
            key_df = ids.toDF(pk).distinct()
            hit_col = "__hit"
            cur = cur.join(
                key_df.withColumn(hit_col, F.lit(True)), pk, "left"
            ).withColumn(hit_col, F.coalesce(F.col(hit_col), F.lit(False)))
            hit = F.col(hit_col)
        else:
            hit = F.col(pk).isin(ids)
        out = cur.withColumn(
            "_deleted", F.when(hit, F.lit(True)).otherwise(F.col("_deleted"))
        ).withColumn(
            "_lwt", F.when(hit, F.lit(float(lwt))).otherwise(F.col("_lwt"))
        )
        if "_rev" in out.columns:
            out = out.withColumn(
                "_rev",
                F.when(
                    hit, _rev_bump(F.col("_rev"), _payload_hash(user_cols))
                ).otherwise(F.col("_rev")),
            )
        if isinstance(ids, DataFrame):
            out = out.drop("__hit")
        self._swap_in(out)
