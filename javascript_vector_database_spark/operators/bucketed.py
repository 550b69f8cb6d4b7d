"""Bucketed-table layouts: co-located joins with NO exchange.

The brief's cluster discipline ("pre-partition / bucket big joins so they
co-locate") made concrete: both sides of a recurring join are written
ONCE as bucketed managed tables (`bucketBy(n, key).sortBy(key)`), after
which every join on the bucket key is exchange-free — each task reads
bucket i of both sides, and with sortBy the sort-merge join needs no sort
either.  At 100 TB this converts the nightly fact-to-fact join from the
cluster's largest shuffle into a scan-side zip; the write-time cost
amortizes over every subsequent join, exactly like the IVF
``partitionBy(ivf_cell)`` layout amortizes probe pruning
(operators/ann_scale.py).

Spark bucketing notes that matter at scale:

* bucket counts must match (or divide) across the two sides — standardize
  one count per key domain (here: ``N_BUCKETS``);
* bucketed tables are managed (metastore) tables: `saveAsTable`, not
  path `parquet()`; the warehouse lives outside the repo (session.py);
* `spark.sql.sources.bucketing.enabled` is on by default; AQE leaves
  bucketed joins alone (no runtime re-partitioning to undo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

N_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = N_BUCKETS,
) -> None:
    """Materialize ``df`` as a bucketed+sorted managed table (idempotent
    overwrite).  The default in-memory catalog forgets table metadata
    between sessions while the warehouse directory persists, so an
    orphaned location from an earlier session must be cleared explicitly
    or saveAsTable fails with LOCATION_ALREADY_EXISTS."""
    import os
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    wh = spark.conf.get("spark.sql.warehouse.dir")
    wh = wh[len("file:"):] if wh.startswith("file:") else wh
    shutil.rmtree(os.path.join(wh, table_name.lower()), ignore_errors=True)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: zero Exchange
    (plan-pinned by tests/test_plans.py::test_bucketed_join_no_exchange).

    The MERGE hint pins the sort-merge strategy the layout exists for —
    at test scale the planner would otherwise broadcast the small side
    (marking the scans "Bucketed: false (disabled by query planner)"),
    which is the right call for a dimension join but demonstrates
    nothing; the bucketed layout targets the fact-to-fact join whose
    sides are far beyond any broadcast threshold."""
    return (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table).hint("merge"), key)
    )
