"""Multimodal extension queries: binary payload columns + typed metadata,
feature extraction and frame sampling as Arrow-batched mapInPandas.

The corpus text is printable ASCII (pytest-guarded), so the utf-8 payload
bytes equal the character code points and DuckDB can reproduce every
byte-level statistic with ascii()/substr over the text column."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from javascript_vector_database_spark.operators import multimodal
from javascript_vector_database_spark.registry import register
from javascript_vector_database_spark.tables import load_table

_CODES = (
    "list_transform(range(1, length(text) + 1), i -> ascii(substr(text, i, 1)))"
)

_BYTE_STATS_ORACLE = f"""
WITH codes AS (SELECT doc_id AS media_id, {_CODES} AS cs FROM documents)
SELECT media_id,
       CAST(len(cs) AS BIGINT) AS n_bytes,
       CAST(list_sum(cs) % {multimodal.CHECKSUM_MOD} AS BIGINT) AS checksum,
       [CAST(len(list_filter(cs, c -> c // 64 = 0)) AS BIGINT),
        CAST(len(list_filter(cs, c -> c // 64 = 1)) AS BIGINT),
        CAST(len(list_filter(cs, c -> c // 64 = 2)) AS BIGINT),
        CAST(len(list_filter(cs, c -> c // 64 = 3)) AS BIGINT)] AS hist
FROM codes
"""


@register("multimodal_byte_stats", oracle=_BYTE_STATS_ORACLE)
def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction: documents -> media table
    (payload binary + meta struct) -> Arrow-batched mapInPandas computing
    byte count / checksum / coarse histogram.  Row-local, zero shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.byte_stats(multimodal.with_media(docs))


_FRAME_SAMPLE_ORACLE = f"""
WITH m AS (
  SELECT doc_id AS media_id, {_CODES} AS cs,
         1 + CAST(n_chars AS INT) % 8 AS n_frames
  FROM documents
),
f AS (
  SELECT media_id, cs, n_frames,
         CAST(ceil(CAST(len(cs) AS DOUBLE) / n_frames) AS INT) AS frame_len
  FROM m
)
SELECT media_id, n_frames,
       CAST(ceil(CAST(n_frames AS DOUBLE) / 2) AS INT) AS n_sampled,
       CAST(list_sum(cs[1:frame_len]) % {multimodal.CHECKSUM_MOD} AS BIGINT)
         AS first_frame_checksum
FROM f
"""


@register("multimodal_frame_sample", oracle=_FRAME_SAMPLE_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over the synthetic frame layout:
    payload split into meta.n_frames chunks, every 2nd frame kept."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.frame_sample(multimodal.with_media(docs, kind="video"))


@register("multimodal_decode_fake")
def multimodal_decode_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake image decode (the real codec is stubbed — PIL
    absent): pixel-grid mean/std per item.  Rows-only check: float tiling
    semantics (np.resize) are not worth reproducing in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.decode_image(multimodal.with_media(docs), fake=True)
