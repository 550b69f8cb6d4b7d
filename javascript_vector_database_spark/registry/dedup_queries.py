"""Deduplication extension surface: exact, MinHash+LSH, n-gram Jaccard,
SimHash, embedding-cosine near-dup — each with a DuckDB oracle built from
the same engine-portable constructions (md5 string min-hashes, hex-nibble
bit tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from javascript_vector_database_spark import oracle as osql
from javascript_vector_database_spark.operators import dedup
from javascript_vector_database_spark.registry import register
from javascript_vector_database_spark.tables import load_table

# ---------------------------------------------------------------------------
# shared oracle fragments
# ---------------------------------------------------------------------------

#: DuckDB word-3-gram shingles over lower-cased whitespace tokens, distinct
#: (mirrors dedup.shingles; n>=k is guaranteed on this corpus — enforced by
#: a pytest guard for the short-text fallback).


def _sql_shingles(text: str, k: int = dedup.DEFAULT_SHINGLE) -> str:
    toks = f"regexp_split_to_array(trim(lower({text})), '\\s+')"
    gram_parts = " || ' ' || ".join(f"toks[i + {j}]" for j in range(k))
    return (
        f"(SELECT list_distinct(list_transform("
        f"range(1, greatest(len(toks) - {k - 1}, 1) + 1), "
        f"i -> {gram_parts})) FROM (SELECT {toks} AS toks))"
    )


def _sql_minhash(sh_expr: str, salt: int) -> str:
    return f"list_aggregate(list_transform({sh_expr}, s -> md5('{salt}|' || s)), 'min')"


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_groups",
    oracle=(
        "SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id, "
        "count(*) AS n_dups FROM documents GROUP BY md5(text)"
    ),
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by content hash: one shuffle on a 32-char
    key with map-side partial aggregation."""
    return dedup.exact_dedup_groups(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# minhash signatures + LSH pairs
# ---------------------------------------------------------------------------


def _minhash_oracle() -> str:
    sh = _sql_shingles("text")
    cols = ", ".join(
        f"{_sql_minhash('sh', i)} AS mh{i}" for i in range(dedup.DEFAULT_HASHES)
    )
    return (
        f"SELECT doc_id, {cols} "
        f"FROM (SELECT doc_id, {sh} AS sh FROM documents)"
    )


@register("dedup_minhash_signatures", oracle=_minhash_oracle())
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signatures — row-local array expressions, zero
    shuffle; the min of salted md5 digests is an engine-portable
    min-hash."""
    return dedup.minhash_signatures(load_table(spark, sf_dir, "documents"))


def _lsh_pairs_oracle() -> str:
    sh = _sql_shingles("text")
    rows = dedup.DEFAULT_HASHES // dedup.DEFAULT_BANDS
    mh_cols = ", ".join(
        f"{_sql_minhash('sh', i)} AS mh{i}" for i in range(dedup.DEFAULT_HASHES)
    )
    band_rows = []
    for b in range(dedup.DEFAULT_BANDS):
        parts = " || '|' || ".join(f"mh{b * rows + r}" for r in range(rows))
        band_rows.append(f"SELECT doc_id, {b} AS band, md5({parts}) AS bh FROM sigs")
    bands = "\nUNION ALL\n".join(band_rows)
    return f"""
WITH sigs AS (
  SELECT doc_id, {mh_cols}
  FROM (SELECT doc_id, {sh} AS sh FROM documents)
),
bands AS ({bands})
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
"""


@register("dedup_lsh_pairs", oracle=_lsh_pairs_oracle())
def dedup_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding candidate pairs: the only shuffle is the self-join on
    short (band, hash) keys — candidate pairs ≪ n²."""
    return dedup.lsh_band_pairs(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# n-gram Jaccard (blocked by source at scale)
# ---------------------------------------------------------------------------


def _jaccard_oracle() -> str:
    sh = _sql_shingles("text")
    return f"""
WITH sh AS (SELECT doc_id, source, {sh} AS sh FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(a.sh || b.sh)), 6) AS jaccard
FROM sh a JOIN sh b
  ON a.source = b.source AND a.doc_id < b.doc_id
WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(a.sh || b.sh)), 6) >= 0.1
"""


@register("dedup_ngram_jaccard", oracle=_jaccard_oracle())
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-Jaccard pairs, blocked on `source` so the self-join
    stays per-block (at 100 TB the block key is an LSH band)."""
    return dedup.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), block_col="source", threshold=0.1
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def _simhash_oracle(bits: int = dedup.SIMHASH_BITS) -> str:
    sh = _sql_shingles("text")
    hexes = f"list_transform(sh, s -> substr(md5(s), 1, {bits // 4}))"
    terms = []
    for b in range(bits):
        nib_idx = b // 4 + 1
        shift = 3 - (b % 4)
        nib = f"strpos('0123456789abcdef', substr(h, {nib_idx}, 1)) - 1"
        bit_set = f"(CAST(floor(({nib}) / {2 ** shift}) AS BIGINT) % 2 = 1)"
        ones = f"len(list_filter(hx, h -> {bit_set}))"
        terms.append(
            f"(CASE WHEN {ones} * 2 > len(hx) THEN {2 ** (bits - 1 - b)} ELSE 0 END)"
        )
    acc = " + ".join(terms)
    return f"""
WITH hx AS (
  SELECT doc_id, {hexes} AS hx
  FROM (SELECT doc_id, {sh} AS sh FROM documents)
)
SELECT doc_id, CAST({acc} AS BIGINT) AS simhash FROM hx
"""


@register("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash via per-bit weighted majority over shingle md5
    nibbles — engine-portable, row-local."""
    return dedup.simhash_table(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

_COSINE_ORACLE = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({osql.sql_cosine('a.embedding', 'b.embedding')}, 6) AS cos_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round({osql.sql_cosine('a.embedding', 'b.embedding')}, 6) >= 0.2
"""


@register("dedup_cosine_pairs", oracle=_COSINE_ORACLE)
def dedup_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs blocked on the label column (the
    block key is an IVF/LSH cell at scale)."""
    return dedup.cosine_near_dup_pairs(load_table(spark, sf_dir, "embeddings"))
