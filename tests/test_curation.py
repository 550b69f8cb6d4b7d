"""Curation-pass operators: PII scrub, repetition metrics, eval-set
decontamination, mixture sampling, sequence packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from javascript_vector_database_spark import registry
from javascript_vector_database_spark.operators import curation
from javascript_vector_database_spark.tables import load_table
from tests.oracle_harness import compare

CURATION_QUERIES = [
    "curation_pii_scrub",
    "curation_repetition_stats",
    "curation_contamination",
    "curation_mixture_sample",
    "curation_pack_sequences",
    "curation_chunk_dedup",
    "curation_normalize_dedup",
    "curation_split_stratified",
    "curation_lm_quality",
    "curation_domain_cap",
    "curation_contamination_bloom",
    "curation_remove_boilerplate",
    "curation_luhn_cc_detect",
    "curation_universe_sample",
    "curation_weighted_sample",
]


def test_stratified_split_hits_ratios_per_group(spark, sf_oracle):
    """Every source group individually lands the 80/10/10 bounds (the
    global hash draw only achieves this in expectation)."""
    from pyspark.sql import functions as F

    from javascript_vector_database_spark.operators.chunking import (
        stratified_split_assign,
    )

    docs = load_table(spark, sf_oracle, "documents")
    out = stratified_split_assign(docs)
    per = (
        out.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("split") == "train").cast("int")).alias("tr"),
        )
        .collect()
    )
    for r in per:
        # exact per-group quantile: ceil(0.8 * n) train rows
        assert r["tr"] == -(-8 * r["n"] // 10) or r["tr"] == (8 * r["n"]) // 10


def test_normalize_text_collapses_variants(spark):
    from javascript_vector_database_spark.operators.curation import normalize_text

    df = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "HELLO   WORLD.")],
        ["id", "t"],
    )
    out = {r["id"]: r["n"] for r in df.select("id", normalize_text("t").alias("n")).collect()}
    assert out[1] == out[2] == out[3] == "hello world"


@pytest.mark.parametrize("name", CURATION_QUERIES)
def test_curation_oracles(spark, sf_oracle, name):
    compare(spark, sf_oracle, registry.queries()[name], registry.oracle_sql()[name])


def test_pii_scrub_redacts_all_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe@corp.example.org thanks"),
            (2, "server at 192.168.001.2 port 80"),
            (3, "call +1-555-123-4567 or 44 201 5550 123"),
            (4, "clean text with no pii at all"),
        ],
        ["id", "text"],
    )
    rows = {r["id"]: r for r in curation.pii_scrub(df).collect()}
    assert rows[1]["n_email"] == 1 and "[EMAIL]" in rows[1]["scrubbed"]
    assert "@" not in rows[1]["scrubbed"]
    assert rows[2]["n_ipv4"] == 1 and "[IP]" in rows[2]["scrubbed"]
    assert rows[3]["n_phone"] >= 1 and "[PHONE]" in rows[3]["scrubbed"]
    assert rows[4]["scrubbed"] == "clean text with no pii at all"
    assert rows[4]["n_email"] == rows[4]["n_ipv4"] == rows[4]["n_phone"] == 0


def test_repetition_stats_detects_repeats(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "all tokens here are unique"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in curation.repetition_stats(df).collect()}
    assert rows[1]["top_token_share"] == 1.0
    assert rows[1]["dup_bigram_ratio"] > 0.6  # 'spam spam' x3 -> 1 distinct of 3
    assert rows[2]["top_token_share"] == pytest.approx(1 / 5)
    assert rows[2]["dup_token_ratio"] == 0.0


def test_contamination_flags_duplicates(spark):
    """A corpus doc that IS an eval doc's duplicate must be flagged; an
    unrelated doc must not."""
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog again and again today")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again today"),
            (2, "completely different words about spark catalyst query planning"),
        ],
        ["doc_id", "text"],
    )
    out = curation.contamination_pairs(corpus, eval_df).collect()
    assert [(r["eval_id"], r["doc_id"]) for r in out] == [(100, 1)]


def test_contamination_short_docs_dropped_both_engines(spark):
    """Docs with < shingle_k tokens have NO k-grams: they must be dropped
    identically on the Spark side and in the DuckDB oracle even at
    min_shared=1 (previously masked by MIN_SHARED_SHINGLES=8 — the Spark
    whole-text fallback and the SQL NULL-gram expression diverged)."""
    rows = [
        (1, "only two"),  # sub-k: must never pair, even with itself
        (2, "alpha beta gamma delta"),
        (100, "only two"),
        (101, "alpha beta gamma delta epsilon"),
    ]
    corpus = spark.createDataFrame(
        [r for r in rows if r[0] < 100], ["doc_id", "text"]
    )
    eval_df = spark.createDataFrame(
        [r for r in rows if r[0] >= 100], ["doc_id", "text"]
    )
    got = sorted(
        (r["eval_id"], r["doc_id"], r["n_shared"])
        for r in curation.contamination_pairs(
            corpus, eval_df, min_shared=1
        ).collect()
    )
    assert got == [(101, 2, 2)]  # the 2 shared 3-grams; doc 1/100 dropped
    import duckdb

    duck = duckdb.connect()
    duck.execute(
        "CREATE OR REPLACE VIEW short_docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") v(doc_id, text)"
    )
    sql = curation.sql_contamination_pairs(
        "doc_id < 100", "doc_id >= 100", table="short_docs", min_shared=1
    )
    assert sorted(map(tuple, duck.execute(sql).fetchall())) == got


def test_mixture_sample_rates_and_determinism(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    rates = {"en": 1.0, "zh": 0.0}
    kept = curation.mixture_sample(docs, rates)
    by_lang = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    n_en = docs.where(F.col("lang") == "en").count()
    assert by_lang.get("en") == n_en  # rate 1.0 keeps everything
    assert "zh" not in by_lang  # rate 0.0 drops everything
    assert set(by_lang) <= {"en"}  # default rate drops the rest
    # deterministic: same decision on re-run
    assert sorted(r["doc_id"] for r in kept.select("doc_id").collect()) == sorted(
        r["doc_id"]
        for r in curation.mixture_sample(docs, rates).select("doc_id").collect()
    )


def test_pack_sequences_layout(spark, sf_oracle):
    """Intervals within a source are contiguous (start = previous start +
    previous n_tokens, in pk order) and bin ids are the interval starts
    div max_tokens."""
    out = curation.pack_sequences(
        load_table(spark, sf_oracle, "documents"), max_tokens=256
    ).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for rows in by_src.values():
        rows.sort(key=lambda r: r["doc_id"])
        pos = 0
        for r in rows:
            assert r["start_token"] == pos
            assert r["bin_id"] == pos // 256
            pos += r["n_tokens"]


def test_curation_gates_run_on_streams(spark, tmp_path):
    """The stateless curation passes (PII scrub, mixture sampling,
    normalization) are plain expression chains, so the SAME operator
    code applies unchanged to a Structured Streaming source — the
    streaming ingest shape of the curation pipeline."""
    import os

    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    schema = "doc_id long, lang string, text string"
    rows = [
        (1, "en", "mail me at a.b@example.org today"),
        (2, "zh", "no pii in this one"),
        (3, "en", "server 10.1.2.3 answered"),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    gated = curation.mixture_sample(
        curation.pii_scrub(stream), rates={"en": 1.0}, group_col="lang"
    ).withColumn("norm", curation.normalize_text("scrubbed"))
    q = (
        gated.writeStream.format("memory")
        .queryName("curated_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        out = {r["doc_id"]: r for r in spark.sql("SELECT * FROM curated_stream").collect()}
    finally:
        q.stop()
    assert set(out) == {1, 3}  # zh dropped by the 0-default mixture rate
    assert out[1]["n_email"] == 1 and "[EMAIL]" in out[1]["scrubbed"]
    assert out[3]["n_ipv4"] == 1 and "[IP]" in out[3]["scrubbed"]
    assert "@" not in out[1]["norm"]


def test_bloom_contamination_equals_exact_and_prunes(spark, sf_oracle):
    """The bloom-prefiltered pass must return EXACTLY the exact pass's
    rows (no false negatives), and the pre-filter must actually prune
    (survivors << corpus grams, since eval text is 1/25 of the corpus)."""
    from javascript_vector_database_spark.operators.dedup import (
        exploded_shingles,
    )

    docs = load_table(spark, sf_oracle, "documents")
    is_eval = F.col("doc_id") % 25 == 0
    exact = curation.contamination_pairs(docs.where(~is_eval), docs.where(is_eval))
    bloom = curation.bloom_contamination_pairs(
        docs.where(~is_eval), docs.where(is_eval)
    )
    a = sorted(tuple(r) for r in exact.collect())
    b = sorted(tuple(r) for r in bloom.collect())
    assert a == b and len(a) > 0

    ev = (
        exploded_shingles(docs.where(is_eval)).select("sh").distinct()
    )
    bitmap = curation.bloom_bitmap(ev)
    n_set = sum(bin(w & (2**64 - 1)).count("1") for w in bitmap)
    # k=2 probes: expected FP rate = (n_set/m)^2 — must stay well under 1%
    assert (n_set / curation.BLOOM_M) ** 2 < 0.01


def test_boilerplate_removal_semantics(spark, tmp_path):
    """On a constructed corpus: the repeated segment vanishes from every
    doc, surviving segments reassemble in order, and an all-boilerplate
    doc yields an empty clean_text (not a dropped row)."""
    boiler = " ".join(["spam"] * 8)
    uniq = {
        1: " ".join(f"u1w{i}" for i in range(8)),
        2: " ".join(f"u2w{i}" for i in range(8)),
    }
    rows = [
        (1, f"{uniq[1]} {boiler}", "en", "s", 0),
        (2, f"{boiler} {uniq[2]}", "en", "s", 0),
        (3, boiler, "en", "s", 0),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: (r["clean_text"], r["n_dropped"])
        for r in registry.queries()["curation_remove_boilerplate"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[1] == (uniq[1], 1)
    assert out[2] == (uniq[2], 1)
    assert out[3] == ("", 1)


def test_luhn_validates_known_numbers(spark):
    """Pin the checksum on canonical vectors: 4111111111111111 is valid,
    4111111111111112 is not."""
    df = spark.createDataFrame(
        [("4111111111111111",), ("4111111111111112",)], ["c"]
    )
    got = {
        r["c"]: r["ok"]
        for r in df.select(
            "c", curation.luhn_valid(F.col("c")).alias("ok")
        ).collect()
    }
    assert got == {"4111111111111111": True, "4111111111111112": False}
