"""Driver-verified write-path surface (SURVEY §2.10) + JSON dump round
trip (§2.1): a scripted DML batch applied to a temp managed table, final
state checked against a DuckDB oracle that computes the same end state
analytically.

Script (derived from the documents table so both engines reproduce it):

1. ``bulk_insert`` docs with doc_id%2==0            (lwt=1) — all succeed
2. ``bulk_insert`` docs with doc_id%4==0            (lwt=2) — ALL conflict
   (409 per-row report; the table is unchanged)
3. ``bulk_upsert`` docs with doc_id%3==0, n_chars+5000 (lwt=3) — updates
   the even thirds (rev height 1→2), inserts the odd thirds (height 1)
4. ``bulk_remove`` docs with doc_id%10==0           (lwt=4) — soft delete
5. ``incremental_modify`` selector {doc_id: {$mod: [7, 0]}},
   n_chars += 7                                     (lwt=5) — UPDATE on
   visible rows only (soft-deleted rows untouched), rev height +1

Final visible state = (evens ∪ thirds) minus tenths, with `_rev` =
'<height>-<md5(doc_id|lang|n_chars)>' maintained per write
(MAP#rxdb/dist/esm/plugins/utils/utils-revision.js:1-41).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from javascript_vector_database_spark.operators.dml import ParquetTable
from javascript_vector_database_spark.registry import register
from javascript_vector_database_spark.sources.json_dump import (
    export_json,
    import_json,
)
from javascript_vector_database_spark.tables import load_table

_DML_ORACLE = """
WITH final AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 3 = 0 THEN n_chars + 5000 ELSE n_chars END
         + CASE WHEN doc_id % 7 = 0 AND doc_id % 10 <> 0 THEN 7 ELSE 0 END
           AS n_chars,
         CASE WHEN doc_id % 3 = 0 AND doc_id % 2 = 0 THEN 2 ELSE 1 END
         + CASE WHEN doc_id % 7 = 0 AND doc_id % 10 <> 0 THEN 1 ELSE 0 END
           AS height
  FROM documents
  WHERE doc_id % 2 = 0 OR doc_id % 3 = 0
)
SELECT doc_id, lang, n_chars,
       CAST(height AS VARCHAR) || '-' ||
       md5(concat_ws('|', doc_id, lang, n_chars)) AS _rev
FROM final
WHERE NOT (doc_id % 10 = 0)
"""


@register("dml_roundtrip", oracle=_DML_ORACLE)
def dml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """insert / conflicting insert (409) / upsert-MERGE / soft delete on a
    managed table, returning the final visible state with maintained
    optimistic revisions (rx-collection.js:165-342)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    t = ParquetTable(
        spark, tempfile.mkdtemp(prefix="dml_rt_") + "/t", "doc_id"
    )
    r1 = t.bulk_insert(docs.where(F.col("doc_id") % 2 == 0), lwt=1.0)
    r2 = t.bulk_insert(docs.where(F.col("doc_id") % 4 == 0), lwt=2.0)
    assert r2["success"] == 0 and r2["conflict"] > 0, (r1, r2)
    t.bulk_upsert(
        docs.where(F.col("doc_id") % 3 == 0).withColumn(
            "n_chars", F.col("n_chars") + 5000
        ),
        lwt=3.0,
    )
    t.bulk_remove(
        docs.where(F.col("doc_id") % 10 == 0).select("doc_id"), lwt=4.0
    )
    t.incremental_modify(
        {"doc_id": {"$mod": [7, 0]}},
        {"n_chars": F.col("n_chars") + 7},
        lwt=5.0,
    )
    return t.docs().select("doc_id", "lang", "n_chars", "_rev")


#: ids for the findByIds probe: 10/20/30 fall to the % 10 soft delete
_CACHE_PROBE_IDS = (1, 2, 3, 10, 20, 30)

#: hit/miss ledger of the scripted call sequence (see the row docstring):
#: count(miss) count(hit) byids(miss) byids(hit) WRITE count(miss)
#: byids(miss) -> hits=2, misses=4 — literals the oracle re-states
_CACHE_ORACLE = f"""
WITH en AS (SELECT * FROM documents WHERE lang = 'en')
SELECT 'count_before' AS probe, CAST(0 AS BIGINT) AS k,
       CAST((SELECT count(*) FROM en) AS BIGINT) AS v
UNION ALL SELECT 'count_cached', 0, (SELECT count(*) FROM en)
UNION ALL SELECT 'count_after', 0,
  (SELECT count(*) FROM en WHERE doc_id % 10 <> 0)
UNION ALL SELECT 'cache_hits', 0, 2
UNION ALL SELECT 'cache_misses', 0, 4
UNION ALL
SELECT 'byid', doc_id, n_chars FROM documents
WHERE doc_id IN {_CACHE_PROBE_IDS} AND doc_id % 10 <> 0
"""


@register("cache_collection_roundtrip", oracle=_CACHE_ORACLE)
def cache_collection_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CachedCollection parity surface (the reference's tunnelQueryCache
    + the rx-query fast paths, MAP#rxdb/dist/esm/rx-query.js:83-120 and
    rx-collection.js:343-381): ``count()`` (storage-count fast path, no
    result materialization; re-executions served from the cached count)
    and ``findByIds`` (direct point lookup — partition-pruned
    ``ParquetTable.get_by_ids``, reading only the PK-hash buckets the
    ids land in — never a full query), both under write invalidation.

    Script: load documents into a managed table, attach a
    CachedCollection; count {lang:'en'} twice (miss then HIT — the
    second call never touches storage), findByIds twice (miss then HIT
    — the exact same persisted DataFrame instance, the reference's
    query "tunneling"); then a ``bulk_remove`` of doc_id % 10 == 0
    fires the write listener and drops the cache (asserted empty), so
    the re-issued count and findByIds recompute against the
    post-delete state.  Output: the three counts, the hit/miss ledger
    (deterministic literals of the call sequence), and the surviving
    findByIds rows — all oracle-checked."""
    from javascript_vector_database_spark.operators.query_cache import (
        CachedCollection,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    t = ParquetTable(
        spark, tempfile.mkdtemp(prefix="cache_rt_") + "/t", "doc_id"
    )
    t.bulk_insert(docs, lwt=1.0)
    cache = CachedCollection.attach(t)
    sel = {"lang": "en"}
    ids = list(_CACHE_PROBE_IDS)
    c1 = cache.count(sel)  # miss: one pushed-down COUNT aggregate
    c2 = cache.count(sel)  # hit: served from the cached tally
    b1 = cache.find_by_ids(ids)  # miss: bucket-pruned point lookup
    b1_again = cache.find_by_ids(ids)  # hit: the SAME instance
    assert b1_again is b1, "findByIds must tunnel into the cached instance"
    assert c1 == c2 and cache.hits == 2 and cache.misses == 2
    t.bulk_remove(
        docs.where(F.col("doc_id") % 10 == 0).select("doc_id"), lwt=2.0
    )
    assert len(cache) == 0, "write must invalidate every cached entry"
    c3 = cache.count(sel)  # miss: recomputed on post-delete state
    b2 = cache.find_by_ids(ids)  # miss: deleted ids gone
    scalars = spark.createDataFrame(
        [
            ("count_before", 0, c1),
            ("count_cached", 0, c2),
            ("count_after", 0, c3),
            ("cache_hits", 0, cache.hits),
            ("cache_misses", 0, cache.misses),
        ],
        "probe string, k long, v long",
    )
    return scalars.unionByName(
        b2.select(
            F.lit("byid").alias("probe"),
            F.col("doc_id").cast("long").alias("k"),
            F.col("n_chars").cast("long").alias("v"),
        )
    )


_PIPELINE_ORACLE = """
SELECT doc_id AS id,
       trim(coalesce(regexp_extract(text, 'Title:(.*?)Content:', 1), ''))
         AS title,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
FROM documents
"""


@register("pipeline_roundtrip", oracle=_PIPELINE_ORACLE)
def pipeline_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """addPipeline end-to-end (MAP#rxdb/dist/esm/plugins/pipeline/
    rx-pipeline.js:48-173): documents play the items collection; the
    checkpointed drain loop pulls (lwt, id)-ordered batches, the handler
    derives (title, n_tokens) per doc with the idempotence anti-join, and
    bulkUpsert lands them in the destination table.  Runs in 4 batches so
    the checkpoint path is actually exercised; the final destination state
    is oracle-checked analytically."""
    from javascript_vector_database_spark.functions import text as T
    from javascript_vector_database_spark.streaming.pipeline import (
        Pipeline,
        anti_join_new,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    tmp = tempfile.mkdtemp(prefix="pipe_rt_")
    src_path = tmp + "/items"
    docs.select(
        F.col("doc_id").alias("id"),
        F.col("text").alias("body"),
        F.col("doc_id").cast("double").alias("_lwt"),
    ).write.parquet(src_path)
    dest = ParquetTable(spark, tmp + "/derived", "id")

    def handler(batch):
        new = anti_join_new(batch, dest, "id", "id")
        return new.select(
            "id",
            T.parse_title("body").alias("title"),
            T.token_count("body").alias("n_tokens"),
        )

    pipe = Pipeline(
        spark, "pipe_rt", src_path, dest, handler, tmp + "/cp",
        source_pk="id", batch_size=max(1, -(-n_docs // 4)),
    )
    pipe.await_idle()
    return dest.docs().select("id", "title", "n_tokens")


_JSON_ORACLE = """
SELECT doc_id, lang, source, n_chars, 42.0 AS _lwt
FROM documents WHERE doc_id % 4 = 1
"""


@register("json_dump_roundtrip", oracle=_JSON_ORACLE)
def json_dump_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exportJSON -> importJSON round trip (MAP#rxdb/dist/esm/plugins/
    json-dump/index.js:32-71): schema-hash-checked dump of a filtered
    collection, re-imported with a fresh `_lwt` stamp."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    ).where(F.col("doc_id") % 4 == 1)
    dump = tempfile.mkdtemp(prefix="json_dump_") + "/dump"
    export_json(docs, dump)
    back = import_json(
        spark, dump, "doc_id long, lang string, source string, n_chars long",
        lwt=42.0,
    )
    return back.select("doc_id", "lang", "source", "n_chars", "_lwt")
