"""§2.11 scalar functions + text-analysis extension surface (language ID,
quality scoring, token counting, fingerprinting, title/content parse)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from javascript_vector_database_spark.functions import text as T
from javascript_vector_database_spark.registry import register
from javascript_vector_database_spark.tables import load_table, spread


@register(
    "text_title_content_parse",
    oracle=(
        "SELECT doc_id, "
        "trim(coalesce(regexp_extract(text, 'Title:(.*?)Content:', 1), '')) AS title, "
        "trim(coalesce(regexp_extract(text, 'Content:(.*)$', 1), '')) AS content "
        "FROM documents WHERE doc_id < 50"
    ),
)
def text_title_content_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference UI's body split-parse (src/index.ts:115-119)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return docs.select(
        "doc_id",
        T.parse_title("text").alias("title"),
        T.parse_content("text").alias("content"),
    )


@register(
    "text_token_count",
    oracle=f"SELECT doc_id, {T.sql_token_count('text')} AS n_tokens FROM documents",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", T.token_count("text").alias("n_tokens"))


@register(
    "text_bpe_token_count",
    oracle=(
        f"SELECT doc_id, {T.sql_bpe_token_count('text')} AS n_bpe_tokens "
        f"FROM documents"
    ),
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word-style token count (BPE pre-tokenization proxy: letter
    runs, digit runs, punctuation marks)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", T.bpe_token_count("text").alias("n_bpe_tokens"))


@register(
    "text_lang_id",
    oracle=(
        f"SELECT doc_id, lang, {T.sql_lang_id('text')} AS lang_guess FROM documents"
    ),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-hit language-ID heuristic next to the ground-truth lang."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", "lang", T.lang_id("text").alias("lang_guess"))


@register(
    "text_quality_score",
    oracle=(
        f"SELECT doc_id, {T.sql_quality_score('text')} AS quality FROM documents"
    ),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", T.quality_score("text").alias("quality"))


@register(
    "text_fingerprint",
    oracle=f"SELECT doc_id, {T.sql_fingerprint('text')} AS fp FROM documents",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", T.fingerprint("text").alias("fp"))
