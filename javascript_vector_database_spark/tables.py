"""Table catalog over the driver's parquet test data.

The reference's data model is two collections — ``items(id, body)`` and
``vectors(id, embedding, idx0..idx4)`` (reference src/database.ts:50-111) —
plus engine-added meta columns ``_deleted`` (soft delete) and ``_meta.lwt``
(last-write time) on every row (SURVEY.md §1.2).  Here:

* ``documents``  ≡ items      (doc_id, text, lang, source, n_chars)
* ``embeddings`` ≡ vectors    (vec_id, embedding array<float>, label)
* the TPC-H-ish tables + ``events`` exercise the general relational and
  streaming surface.

``with_meta`` adds the engine meta columns when absent; ``collection_view``
applies the implicit ``_deleted = false`` filter every reference query gets
(MAP#rxdb/dist/esm/rx-query.js:182-184).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: primary-key column per table (the reference appends the PK to every sort
#: for deterministic order, MAP#rxdb/dist/esm/rx-query-helper.js:128-136).
PRIMARY_KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",  # compound (l_orderkey, l_linenumber) in spirit
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the input
    arrives in fewer partitions.  Heavy row-local ops (shingle hashing,
    regex scoring, payload feature extraction) otherwise run on however
    many file splits the scan produced — a small single-row-group parquet
    file is ONE task no matter how many cores.  At 100 TB the scan already
    has >= cores partitions and this is a no-op, so the shuffle cost is
    only paid when it buys parallelism.

    Parallelism is probed via ``df.inputFiles()`` (metadata-only) — NOT
    ``df.rdd.getNumPartitions()``, which forces plan preparation and
    under AQE can eagerly execute shuffle stages.  Only call on plain
    scans/narrow plans; a non-file-backed plan probes as 0 files and is
    repartitioned."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target)


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to TIMESTAMP (LTZ).

    The driver's generated parquet has varied across rounds between
    ``isAdjustedToUTC=true`` (read as TIMESTAMP) and ``=false`` (read as
    TIMESTAMP_NTZ when ``spark.sql.parquet.inferTimestampNTZ.enabled`` is
    on — the PySpark 4 default).  Every time-based operator here
    (``unix_micros`` bucketing, as-of, session windows) speaks TIMESTAMP,
    and this must hold under ANY caller's SparkSession, so normalize at
    the scan instead of relying on session conf.  NTZ→LTZ→collect
    round-trips the wall-clock unchanged (interpret and re-render both
    use the session timezone), so results stay bit-identical to DuckDB's
    naive reading of the same file.
    """
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one table; Catalyst pushes filters/projections.

    Some rounds' ``events.parquet`` carries TIMESTAMP(NANOS) which
    Spark's reader rejects by default; it is read as nano-longs and
    converted to a true TimestampType column (microsecond truncation —
    identical to what DuckDB's reader does with the same file).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return _normalize_timestamps(df)
    return _normalize_timestamps(spark.read.parquet(path))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(prefix + name)


def with_meta(df: DataFrame, lwt_col: str | None = None) -> DataFrame:
    """Add the engine meta columns the reference adds to every schema
    (`_deleted` soft-delete flag, `_lwt` last-write time;
    MAP#rxdb/dist/esm/rx-schema-helper.js:142-167)."""
    out = df
    if "_deleted" not in df.columns:
        out = out.withColumn("_deleted", F.lit(False))
    if "_lwt" not in out.columns:
        out = out.withColumn(
            "_lwt",
            F.col(lwt_col).cast("double") if lwt_col else F.lit(0.0),
        )
    return out


def collection_view(df: DataFrame) -> DataFrame:
    """The implicit `_deleted = false` filter every prepared reference query
    receives (MAP#rxdb/dist/esm/rx-query.js:182-184).  A no-op for tables
    that carry no soft-delete column."""
    if "_deleted" in df.columns:
        return df.where(~F.col("_deleted"))
    return df
