"""§2.2 predicate-language surface: every Mango operator the reference
registers (MAP#rxdb/dist/esm/rx-query-mingo.js:20-43) demonstrated as a
``find()`` plan with a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from javascript_vector_database_spark.operators.mango import find
from javascript_vector_database_spark.registry import register
from javascript_vector_database_spark.tables import load_table


@register(
    "mango_eq_ne",
    oracle=(
        "SELECT doc_id, lang, n_chars FROM documents "
        "WHERE lang = 'en' AND NOT (n_chars = 128)"
    ),
)
def mango_eq_ne(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$eq bare-value sugar + $ne (null-safe)."""
    docs = load_table(spark, sf_dir, "documents")
    return find(
        docs,
        {"lang": "en", "n_chars": {"$ne": 128}},
        projection=["doc_id", "lang", "n_chars"],
    )


@register(
    "mango_range",
    oracle=(
        "SELECT doc_id, n_chars FROM documents "
        "WHERE n_chars > 100 AND n_chars <= 400"
    ),
)
def mango_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$gt/$lte range — pushes to the parquet scan as one sargable range."""
    docs = load_table(spark, sf_dir, "documents")
    return find(
        docs,
        {"n_chars": {"$gt": 100, "$lte": 400}},
        projection=["doc_id", "n_chars"],
    )


@register(
    "mango_in_nin",
    oracle=(
        "SELECT doc_id, lang, source FROM documents "
        "WHERE lang IN ('en', 'es') AND (source NOT IN ('src3') OR source IS NULL)"
    ),
)
def mango_in_nin(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return find(
        docs,
        {"lang": {"$in": ["en", "es"]}, "source": {"$nin": ["src3"]}},
        projection=["doc_id", "lang", "source"],
    )


@register(
    "mango_bool_combinators",
    oracle=(
        "SELECT doc_id, lang, n_chars FROM documents "
        "WHERE (lang = 'zh' OR n_chars < 150) "
        "AND NOT (source = 'src1' OR n_chars > 450)"
    ),
)
def mango_bool_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$or + $nor + implicit top-level $and."""
    docs = load_table(spark, sf_dir, "documents")
    return find(
        docs,
        {
            "$or": [{"lang": "zh"}, {"n_chars": {"$lt": 150}}],
            "$nor": [{"source": "src1"}, {"n_chars": {"$gt": 450}}],
        },
        projection=["doc_id", "lang", "n_chars"],
    )


@register(
    "mango_mod",
    oracle="SELECT doc_id FROM documents WHERE doc_id % 7 = 3",
)
def mango_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return find(docs, {"doc_id": {"$mod": [7, 3]}}, projection=["doc_id"])


@register(
    "mango_regex",
    oracle=(
        "SELECT doc_id, text FROM documents "
        "WHERE regexp_matches(text, 'join.*scan')"
    ),
)
def mango_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return find(docs, {"text": {"$regex": "join.*scan"}}, projection=["doc_id", "text"])


@register(
    "mango_exists",
    oracle="SELECT doc_id FROM documents WHERE lang IS NOT NULL",
)
def mango_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return find(docs, {"lang": {"$exists": True}}, projection=["doc_id"])


@register(
    "mango_elemmatch_size",
    oracle=(
        "SELECT vec_id FROM embeddings "
        "WHERE len(list_filter(embedding, x -> x > CAST(0.3 AS DOUBLE))) > 0 "
        "AND len(embedding) = 64"
    ),
)
def mango_elemmatch_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$elemMatch + $size on an array column (the engine supports array
    predicates even though the demo schema is flat, SURVEY.md §1.2)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return find(
        emb,
        {"embedding": {"$elemMatch": {"$gt": 0.3}, "$size": 64}},
        projection=["vec_id"],
    )


@register(
    "mango_sort_skip_limit",
    oracle=(
        "SELECT doc_id, n_chars FROM documents "
        "ORDER BY n_chars DESC, doc_id ASC OFFSET 10 LIMIT 20"
    ),
)
def mango_sort_skip_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-field sort with the engine's PK tiebreak + skip/limit
    (MAP#rxdb/dist/esm/rx-query-helper.js:128-136, dexie-query.js:45-47)."""
    docs = load_table(spark, sf_dir, "documents")
    return find(
        docs,
        sort=[{"n_chars": "desc"}],
        skip=10,
        limit=20,
        projection=["doc_id", "n_chars"],
        primary_key="doc_id",
    )


@register(
    "mango_count",
    oracle="SELECT count(*) AS n FROM documents WHERE lang = 'en'",
)
def mango_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count() over a selector (reference fast-mode count,
    MAP#rxdb/dist/esm/rx-query.js:83-94)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    return find(docs, {"lang": "en"}).agg(F.count(F.lit(1)).alias("n"))


@register(
    "mango_all",
    oracle=(
        "SELECT doc_id FROM documents "
        "WHERE list_contains(regexp_split_to_array(trim(lower(text)), '\\s+'), 'hash') "
        "AND list_contains(regexp_split_to_array(trim(lower(text)), '\\s+'), 'join')"
    ),
)
def mango_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$all — the array must contain EVERY listed value
    (MAP#mingo/dist/esm/operators/query/array/all.js): compiled to a
    conjunction of array_contains, all scan-side.  The demo runs it over
    a derived token-array column (the engine supports array predicates
    on any array column, SURVEY.md §1.2)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.withColumn(
        "toks", F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    )
    return find(toks, {"toks": {"$all": ["hash", "join"]}}, projection=["doc_id"])
