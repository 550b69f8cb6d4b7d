"""Deduplication operators for the training-data pipeline surface.

Strategies (each designed for 100 TB):

* ``exact_dedup``        — hash-groupBy on normalized text; one shuffle on
                           a 32-char key, map-side partial agg.
* ``minhash_signatures`` — word-shingle MinHash computed entirely with
                           array expressions (NO explode, NO shuffle):
                           per row, shingles -> H salted md5 min-hashes.
                           The min of a fixed-width hex digest is a valid
                           min-hash and is engine-portable (string min).
* ``lsh_band_pairs``     — banding: group signature rows into B bands,
                           hash each band, self-join on (band_idx, band
                           hash) to get candidate pairs, verify with exact
                           shingle Jaccard.  The only shuffle is on short
                           band-hash keys; candidate pairs ≪ n².
* ``simhash``            — 16-bit SimHash from the same shingle hashes via
                           per-bit weighted majority, array-expression only.
* ``cosine_near_dup``    — embedding near-duplicate pairs, blocked on a
                           coarse key (label / IVF cell) so the self-join
                           never goes quadratic.

The reference itself has no dedup surface; its union-dedup Set
(reference src/search.ts:21,37) maps to ``dropDuplicates`` — used here and
in knn.  These operators are the SURVEY §7.7 extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from javascript_vector_database_spark.functions.text import word_tokens
from javascript_vector_database_spark.functions.vector import cosine_similarity

DEFAULT_SHINGLE = 3
DEFAULT_HASHES = 8
DEFAULT_BANDS = 4  # rows-per-band = HASHES // BANDS


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups: md5 of the raw text, keep the min id as the
    canonical representative.  Output: (text_hash, canonical_id, n_dups)."""
    return (
        df.select(F.md5(_as_col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct text (the min-id row)."""
    w_hash = df.withColumn("__h", F.md5(_as_col(text_col)))
    keep = w_hash.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return w_hash.join(keep, ["__h", id_col], "inner").drop("__h")


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------


def shingles(text: Column | str, k: int = DEFAULT_SHINGLE) -> Column:
    """Distinct word k-grams as an array column, built by index-transform
    over the token array — no explode."""
    toks = word_tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    return F.when(n >= k, F.array_distinct(gram)).otherwise(
        F.array_distinct(F.array(F.array_join(toks, " ")))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_HASHES,
    shingle_k: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """Per-document MinHash signature: for salt i, min over shingles of
    md5('<i>|' || shingle).  Output: (id, mh0..mh{H-1}).  Purely
    row-local — scales linearly, zero shuffle."""
    sh = shingles(_as_col(text_col), shingle_k)
    out = df.select(F.col(id_col), sh.alias("__sh"))

    def salted(salt: int):
        # single-arg closure: a 2-arg lambda would make F.transform pass
        # the array index as the second argument
        return lambda s: F.md5(F.concat(F.lit(f"{salt}|"), s))

    for i in range(num_hashes):
        out = out.withColumn(f"mh{i}", F.array_min(F.transform(F.col("__sh"), salted(i))))
    return out.drop("__sh")


def lsh_band_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = DEFAULT_SHINGLE,
    jaccard_threshold: float | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding, optionally verified
    with exact shingle Jaccard.  Output: (id_a, id_b[, jaccard]) with
    id_a < id_b, distinct."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("bh"))
        )
    bands_df = sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, "bk.band", "bk.bh")
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    if jaccard_threshold is None:
        return pairs
    sh = df.select(
        F.col(id_col), shingles(_as_col(text_col), shingle_k).alias("sh")
    )
    pairs = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = DEFAULT_SHINGLE,
    threshold: float = 0.1,
    block_col: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs.  Quadratic unless blocked —
    pass ``block_col`` (e.g. a source/label/LSH bucket) at scale."""
    sh = df.select(
        F.col(id_col),
        *( [F.col(block_col)] if block_col else [] ),
        shingles(_as_col(text_col), shingle_k).alias("sh"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    return (
        a.join(b, cond)
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.size(F.array_union("a.sh", "b.sh")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "jaccard",
        )
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16


def simhash(text: Column | str, bits: int = SIMHASH_BITS, shingle_k: int = DEFAULT_SHINGLE) -> Column:
    """SimHash over shingle md5s: bit b of the result is 1 iff the majority
    of shingles have bit b set in their digest.  Uses the first bits/4 hex
    chars of each md5; engine-portable (no 64-bit int ops)."""
    sh = shingles(text, shingle_k)
    hexes = F.transform(sh, lambda s: F.substring(F.md5(s), 1, bits // 4))
    total = F.size(hexes)
    acc = F.lit(0).cast("long")
    def bit_set(nib_idx: int, shift: int):
        # single-arg closure (see minhash_signatures note on lambda arity)
        return lambda h: (
            F.floor(
                F.conv(F.substring(h, nib_idx, 1), 16, 10).cast("long")
                / F.lit(2**shift)
            )
            % 2
            == 1
        )

    for b in range(bits):
        ones = F.size(F.filter(hexes, bit_set(b // 4 + 1, 3 - (b % 4))))
        bit = F.when(ones * 2 > total, F.lit(1)).otherwise(F.lit(0))
        acc = acc + bit.cast("long") * F.lit(2 ** (bits - 1 - b))
    return acc


def simhash_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    return df.select(F.col(id_col), simhash(_as_col(text_col)).alias("simhash"))


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def cosine_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = "label",
    threshold: float = 0.2,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked so the self-join is
    per-block (at 100 TB the block key is an IVF/LSH cell; here the label
    column stands in).  Output: (id_a, id_b, cos_sim)."""
    cols = [F.col(id_col), F.col(vec_col)] + (
        [F.col(block_col)] if block_col else []
    )
    side = df.select(*cols)
    a, b = side.alias("a"), side.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    return (
        a.join(b, cond)
        .withColumn(
            "cos_sim",
            F.round(cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6),
        )
        .where(F.col("cos_sim") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "cos_sim",
        )
    )
