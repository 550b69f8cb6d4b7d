"""§2.1 change-feed source + §2.9 state fold, batch-queryable shapes.

The reference's change feed is keyset pagination ordered by
``(_meta.lwt, id)`` with selector ``lwt > cp.lwt OR (lwt = cp.lwt AND
id > cp.id)`` (MAP#rxdb/dist/esm/rx-storage-helper.js:581-640).  The
events table's ``(ts, event_id)`` plays the (lwt, id) role here.  The same
predicate drives streaming/pipeline.py's checkpoint loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

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
