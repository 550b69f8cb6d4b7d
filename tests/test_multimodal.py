from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from javascript_vector_database_spark import registry
from javascript_vector_database_spark.operators import multimodal
from javascript_vector_database_spark.tables import load_table
from tests.oracle_harness import compare

MM_ORACLE_QUERIES = [
    "multimodal_byte_stats",
    "multimodal_frame_sample",
    "multimodal_decode_fake",
    "multimodal_resize_fake",
]


@pytest.mark.parametrize("name", MM_ORACLE_QUERIES)
def test_multimodal_oracle(spark, sf_oracle, name):
    compare(spark, sf_oracle, registry.queries()[name], registry.oracle_sql()[name])


def test_corpus_is_printable_ascii(spark, sf_oracle):
    """The DuckDB byte-stat oracles assume payload bytes == code points."""
    docs = load_table(spark, sf_oracle, "documents")
    assert docs.where(F.col("text").rlike(r"[^ -~]")).count() == 0


def test_media_schema_and_decode_fake(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    media = multimodal.with_media(docs)
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,payload:binary,"
        "meta:struct<width:int,height:int,n_frames:int,sample_rate:int,fmt:string>>"
    )
    out = multimodal.decode_image(media, fake=True)
    rows = out.limit(5).collect()
    assert all(0 <= r["px_mean"] <= 255 for r in rows)
    # determinism: same input -> same features
    again = multimodal.decode_image(media, fake=True).limit(5).collect()
    assert rows == again


def test_decode_without_fake_is_stubbed(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    media = multimodal.with_media(docs)
    if not multimodal._HAS_PIL:
        with pytest.raises(NotImplementedError, match="STUB"):
            multimodal.decode_image(media)
    with pytest.raises(NotImplementedError, match="STUB"):
        multimodal.resize_image(media, 8, 8)


def test_frame_sample_counts(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    out = multimodal.frame_sample(multimodal.with_media(docs, kind="video"))
    bad = out.where(
        (F.col("n_sampled") != F.ceil(F.col("n_frames") / 2)) | (F.col("n_frames") < 1)
    ).count()
    assert bad == 0
