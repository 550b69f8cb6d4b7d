"""Deduplication extension surface: exact, MinHash+LSH, n-gram Jaccard,
SimHash, embedding-cosine near-dup — each with a DuckDB oracle built from
the same engine-portable constructions (one md5 per shingle -> two 32-bit
ints -> double-hashed min-hashes / bit-majority SimHash)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


#: per-shingle [v1, v2] 32-bit ints from ONE md5 (mirrors
#: dedup.shingle_hash_pairs)
def _sql_hash_pairs(sh_expr: str) -> str:
    return (
        f"list_transform(list_transform({sh_expr}, s -> md5(s)), "
        f"h -> [('0x' || substr(h, 1, 8))::BIGINT, ('0x' || substr(h, 9, 8))::BIGINT])"
    )


def _sql_minhash(vs_expr: str, salt: int) -> str:
    """Double-hashed min: min_s (v1 + salt*v2) mod P (mirrors dedup.minhash_sig)."""
    return (
        f"list_aggregate(list_transform({vs_expr}, "
        f"v -> (v[1] + {salt} * v[2]) % {dedup.MINHASH_P}), 'min')"
    )


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
    # mh rides as a comma-joined string: the driver's canonicalizer hashes
    # rows through a pandas sort, which cannot hash list-typed cells
    sh = _sql_shingles("text")
    mh = ", ".join(_sql_minhash("vs", i) for i in range(dedup.DEFAULT_HASHES))
    return (
        f"SELECT doc_id, array_to_string([{mh}], ',') AS mh "
        f"FROM (SELECT doc_id, {_sql_hash_pairs('sh')} AS vs "
        f"FROM (SELECT doc_id, {sh} AS sh FROM documents))"
    )


@register("dedup_minhash_signatures", oracle=_minhash_oracle())
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signatures — row-local array expressions, zero
    shuffle, one md5 + one arithmetic fold per shingle (double hashing)."""
    sigs = dedup.minhash_signatures(load_table(spark, sf_dir, "documents"))
    return sigs.select(
        "doc_id",
        F.array_join(F.col("mh").cast("array<string>"), ",").alias("mh"),
    )


def _lsh_pairs_ctes() -> str:
    # mirrors lsh_band_pairs' hot-bucket guards exactly: exact-dup groups
    # collapse to min-id representatives (star edges), banding runs over
    # representatives only, and each (band, bh) bucket contributes only
    # its DEFAULT_BUCKET_CAP smallest ids to the self-join.  Exposed as a
    # CTE list ending in `pairs` so the calibration oracle can extend it.
    sh = _sql_shingles("text")
    rows = dedup.DEFAULT_HASHES // dedup.DEFAULT_BANDS
    mh = ", ".join(_sql_minhash("vs", i) for i in range(dedup.DEFAULT_HASHES))
    band_rows = []
    for b in range(dedup.DEFAULT_BANDS):
        parts = " || '|' || ".join(
            f"CAST(mh[{b * rows + r + 1}] AS VARCHAR)" for r in range(rows)
        )
        band_rows.append(
            f"SELECT doc_id, {b} AS band, md5({parts}) AS bh FROM sigs"
        )
    bands = "\nUNION ALL\n".join(band_rows)
    return f"""grp AS (
  SELECT doc_id, text,
         min(doc_id) OVER (PARTITION BY md5(text)) AS rep
  FROM documents
),
star AS (SELECT rep AS id_a, doc_id AS id_b FROM grp WHERE doc_id <> rep),
repdocs AS (SELECT doc_id, text FROM grp WHERE doc_id = rep),
sigs AS (
  SELECT doc_id, [{mh}] AS mh
  FROM (SELECT doc_id, {_sql_hash_pairs('sh')} AS vs
        FROM (SELECT doc_id, {sh} AS sh FROM repdocs))
),
bands AS ({bands}),
capped AS (
  SELECT doc_id, band, bh FROM (
    SELECT *, row_number() OVER (PARTITION BY band, bh ORDER BY doc_id) AS rn
    FROM bands)
  WHERE rn <= {dedup.DEFAULT_BUCKET_CAP}
),
pairs AS (
  SELECT DISTINCT id_a, id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM capped a JOIN capped b
      ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    UNION ALL
    SELECT id_a, id_b FROM star
  )
)"""


def _lsh_pairs_oracle() -> str:
    return f"WITH {_lsh_pairs_ctes()}\nSELECT id_a, id_b FROM pairs"


@register("dedup_lsh_pairs", oracle=_lsh_pairs_oracle())
def dedup_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding candidate pairs: the only shuffle is the self-join on
    short (band, hash) keys — candidate pairs ≪ n²."""
    return dedup.lsh_band_pairs(load_table(spark, sf_dir, "documents"))


@register("stream_lsh_index_live", oracle=_lsh_pairs_oracle())
def stream_lsh_index_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE-MAINTAINED LSH dedup index (18th streaming==batch row): the
    DEDUP family's analog of the maintained ANN/BM25 indexes — at 100 TB
    a near-dup pipeline cannot re-sign the corpus per query, it
    maintains the signature table and derives pairs from it.  The
    per-document work (md5 text hash + 8-hash MinHash signature, both
    deterministic pure functions of the text) runs at INGEST inside the
    checkpointed pipeline and MERGEs (doc_id, th, mh) into a managed
    table — the signature aggregation shuffles only each micro-batch,
    keyed on doc_id; shingle-less docs store a NULL signature but keep
    their text hash so the exact-dup star collapse still sees them.
    Stop/restart from the checkpoint between halves + a re-delivered
    first-half slice, both absorbed by the key-stable MERGE.
    Certification: dedup.lsh_pairs_from_sig_table — star collapse +
    capped banding replayed over the STORED signatures — hash-matches
    the SAME DuckDB oracle as the batch ``dedup_lsh_pairs`` row."""
    import os
    import shutil
    import tempfile

    from javascript_vector_database_spark.operators.dml import ParquetTable
    from javascript_vector_database_spark.registry.feed_state import (
        _stream_feed,
    )
    from javascript_vector_database_spark.streaming.pipeline import (
        streaming_pipeline,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="stream_lshidx_")
    src = os.path.join(tmp, "src")
    cp = os.path.join(tmp, "cp")
    dest = ParquetTable(spark, os.path.join(tmp, "index"), "doc_id")
    feed_rest = _stream_feed(spark, docs, src, "doc_id")
    schema = "doc_id long, text string"

    def handler(batch: DataFrame, batch_id: int) -> None:
        withh = batch.select(
            "doc_id", F.col("text").alias("__text")
        ).withColumn("th", F.md5("__text"))
        sigs = dedup.minhash_signatures(withh, "__text", "doc_id")
        # left join: shingle-less docs keep a NULL mh but stay in the
        # table for the star collapse (mirrors lsh_band_pairs, where
        # the collapse runs BEFORE signatures exist)
        delta = withh.select("doc_id", "th").join(sigs, "doc_id", "left")
        dest.bulk_upsert(delta, lwt=float(batch_id))

    try:
        q = streaming_pipeline(spark, src, schema, handler, cp)
        q.awaitTermination()  # availableNow: drains half 1, stops
        feed_rest()
        # at-least-once: re-deliver a slice of the already-processed half
        docs.where(
            (F.coalesce(F.col("doc_id"), F.lit(0)) % 2 == 0)
            & (F.col("doc_id") % 10 == 0)
        ).write.mode("append").parquet(src)
        q2 = streaming_pipeline(spark, src, schema, handler, cp)
        q2.awaitTermination()  # checkpoint resume: only the new files
        out = dedup.lsh_pairs_from_sig_table(dest.docs())
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


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


def _minhash_calibration_oracle() -> str:
    sh = _sql_shingles("text")
    mh = ", ".join(_sql_minhash("vs", i) for i in range(dedup.DEFAULT_HASHES))
    h = dedup.DEFAULT_HASHES
    return f"""
WITH {_lsh_pairs_ctes()},
per AS (
  SELECT doc_id, sh, [{mh}] AS mh
  FROM (SELECT doc_id, sh, {_sql_hash_pairs('sh')} AS vs
        FROM (SELECT doc_id, {sh} AS sh FROM documents))
),
scored AS (
  SELECT p.id_a, p.id_b,
         CAST(floor(len(list_intersect(a.sh, b.sh)) * 1000000.0
                    / len(list_distinct(a.sh || b.sh))) AS BIGINT)
           AS exact_micro,
         CAST(floor(len(list_filter(range(1, {h + 1}),
                                    i -> a.mh[i] = b.mh[i]))
                    * 1000000.0 / {h}) AS BIGINT) AS est_micro
  FROM pairs p JOIN per a ON a.doc_id = p.id_a
  JOIN per b ON b.doc_id = p.id_b
)
SELECT id_a, id_b, exact_micro, est_micro,
       CAST(est_micro - exact_micro AS BIGINT) AS err_micro
FROM scored
"""


@register("dedup_minhash_calibration", oracle=_minhash_calibration_oracle())
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration over the LSH CANDIDATE set: exact
    shingle Jaccard beside the H={h}-slot signature estimate for every
    pair banding emits (false positives included — that's the signal),
    both as exact BIGINT micros.  The sketch-quality evidence row for
    the dedup stack: what banding threshold hits a target dup-rate.
    Work is linear in candidates (see
    operators/dedup.py:minhash_jaccard_calibration for the
    block-quadratic cliff the first design hit at 10x).
    """.replace("{h}", str(dedup.DEFAULT_HASHES))
    return dedup.minhash_jaccard_calibration(
        load_table(spark, sf_dir, "documents")
    )


_CONTAINMENT_THRESHOLD = 0.8


def _containment_oracle() -> str:
    sh = _sql_shingles("text")
    return f"""
WITH g AS (
  SELECT doc_id, text,
         min(doc_id) OVER (PARTITION BY md5(text)) AS rep
  FROM documents
),
reps AS (SELECT doc_id, text FROM g WHERE doc_id = rep),
sh AS (SELECT doc_id, {sh} AS sh FROM reps),
scored AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / least(len(a.sh), len(b.sh)), 6) AS overlap_coef
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, overlap_coef FROM scored
WHERE overlap_coef >= {_CONTAINMENT_THRESHOLD}
"""


@register("dedup_containment_pairs", oracle=_containment_oracle())
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment (overlap-coefficient) pairs over unique-text
    representatives — the sub-document duplication detector: a document
    embedded verbatim in a larger one scores ~1.0 while its Jaccard
    shrinks with the size ratio.  Spark pairs candidates through an
    inverted-index join on shingle hashes (only docs sharing a shingle
    ever meet — no block key, no quadratic pass); the oracle runs the
    textbook quadratic list_intersect over the same representatives."""
    return dedup.containment_pairs(
        load_table(spark, sf_dir, "documents"),
        threshold=_CONTAINMENT_THRESHOLD,
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def _simhash_oracle(bits: int = dedup.SIMHASH_BITS) -> str:
    sh = _sql_shingles("text")
    terms = []
    for b in range(bits):
        ones = f"len(list_filter(v1s, v -> (v // {2 ** b}) % 2 = 1))"
        terms.append(
            f"(CASE WHEN {ones} * 2 > len(v1s) THEN {2 ** (bits - 1 - b)} ELSE 0 END)"
        )
    acc = " + ".join(terms)
    return f"""
WITH v1s AS (
  SELECT doc_id, list_transform({_sql_hash_pairs('sh')}, v -> v[1]) AS v1s
  FROM (SELECT doc_id, {sh} AS sh FROM documents)
)
SELECT doc_id, CAST({acc} AS BIGINT) AS simhash FROM v1s
"""


@register("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash via weighted bit-majority over per-shingle 32-bit
    hashes — engine-portable, row-local, one md5 per shingle."""
    return dedup.simhash_table(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# duplicate clusters (connected components over LSH candidate pairs)
# ---------------------------------------------------------------------------


def _clusters_oracle() -> str:
    # transitive closure by recursive CTE: node reaches lbl if lbl is the
    # node itself or a neighbor's reachable label; cluster id = min reached
    pairs = _lsh_pairs_oracle()
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT src AS node, src AS lbl FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node
)
SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
FROM reach GROUP BY node
"""


@register("dedup_duplicate_clusters", oracle=_clusters_oracle())
def dedup_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the LSH candidate pairs: every doc in a
    duplicate component labeled with the component's min doc id (the
    canonical representative a curation pass keeps).  Iterative min-label
    propagation, one shuffle per round, O(component diameter) rounds with
    a fixpoint early-exit — checked against DuckDB's recursive-CTE
    transitive closure."""
    pairs = dedup.lsh_band_pairs(load_table(spark, sf_dir, "documents"))
    return dedup.duplicate_clusters(pairs)


@register("dedup_duplicate_clusters_star", oracle=_clusters_oracle())
def dedup_duplicate_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same components via alternating large-star/small-star (Kiveris
    et al. 2014): O(log n) rounds on ANY graph shape — the path min-label
    propagation cannot bound (its round count is the component diameter).
    Same oracle (the labeling is unique), so the two formulations cross-
    check each other through DuckDB's transitive closure."""
    pairs = dedup.lsh_band_pairs(load_table(spark, sf_dir, "documents"))
    return dedup.duplicate_clusters_star(pairs)


# ---------------------------------------------------------------------------
# leakage-safe train/val/test split (dedup-aware)
# ---------------------------------------------------------------------------


def _leakage_split_oracle() -> str:
    """The split fraction is md5(component ROOT), not md5(doc): reuse the
    dedup_duplicate_clusters transitive-closure CTE for the roots, then
    the ordinary split when-cascade keyed on COALESCE(root, doc_id) —
    singletons keep their plain assignment by construction."""
    from javascript_vector_database_spark.operators.chunking import (
        sql_split_assign,
    )

    return f"""
WITH RECURSIVE {_lsh_pairs_ctes()},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT src AS node, src AS lbl FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node
),
roots AS (
  SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS root
  FROM reach GROUP BY node
)
SELECT d.doc_id,
       {sql_split_assign('COALESCE(r.root, d.doc_id)')} AS split
FROM documents d LEFT JOIN roots r ON r.doc_id = d.doc_id
"""


@register("curation_leakage_safe_split", oracle=_leakage_split_oracle())
def curation_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-AWARE train/val/test split: near-duplicate documents land in
    the SAME split (no test-set paraphrase of a training row — the
    self-contamination hole the plain md5(doc) split leaves open).  The
    LSH candidate pairs feed connected components; the split label is a
    pure function of the component ROOT, broadcast-joined back (the
    cluster table is a small fraction of any real corpus; at 100 TB it
    is the already-materialized dedup output).  No pair can straddle
    splits by construction (pinned tests/test_r11_wave.py)."""
    from javascript_vector_database_spark.operators.chunking import (
        leakage_safe_split_assign,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.lsh_band_pairs(docs)
    return leakage_safe_split_assign(docs, pairs).select("doc_id", "split")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def _cosine_oracle() -> str:
    # the same hyperplane-LSH sign bucket the Spark operator blocks on
    from javascript_vector_database_spark.registry.ann_scale_queries import (
        ORACLE_DIM,
        _lsh_sql_bucket,
    )

    bucket = _lsh_sql_bucket("embedding", ORACLE_DIM)
    cos = f"round({osql.sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 6)"
    return f"""
WITH side AS (
  SELECT vec_id, embedding, {bucket} AS blk,
         {osql.sql_l2_norm('embedding')} AS nrm
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cos_sim
FROM side a JOIN side b ON a.blk = b.blk AND a.vec_id < b.vec_id
WHERE {cos} >= 0.2
"""


@register("dedup_cosine_pairs", oracle=_cosine_oracle())
def dedup_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs blocked on the hyperplane-LSH sign
    bucket (256 cells) — within-block pair count stays near-linear in n;
    norms are pre-projected so each pair costs one dot fold."""
    return dedup.cosine_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), dim=64
    )


#: the "incoming batch" slice of the embeddings table (mod-keyed so both
#: engines carve the identical batch/corpus split)
BATCH_MOD, BATCH_REM = 7, 3


def _batch_vs_corpus_oracle() -> str:
    from javascript_vector_database_spark.registry.ann_scale_queries import (
        ORACLE_DIM,
        _lsh_sql_bucket,
    )

    bucket = _lsh_sql_bucket("embedding", ORACLE_DIM)
    cos = (
        f"round({osql.sql_dot('b.embedding', 'c.embedding')} / (b.nrm * c.nrm), 6)"
    )
    return f"""
WITH side AS (
  SELECT vec_id, embedding, {bucket} AS blk,
         {osql.sql_l2_norm('embedding')} AS nrm
  FROM embeddings
),
scored AS (
  SELECT b.vec_id AS batch_id, c.vec_id AS corpus_id, {cos} AS cos_sim
  FROM side b JOIN side c ON b.blk = c.blk
  WHERE b.vec_id % {BATCH_MOD} = {BATCH_REM}
    AND c.vec_id % {BATCH_MOD} <> {BATCH_REM}
)
SELECT batch_id, corpus_id, cos_sim FROM (
  SELECT *, row_number() OVER (
    PARTITION BY batch_id ORDER BY cos_sim DESC, corpus_id ASC) AS rn
  FROM scored WHERE cos_sim >= 0.2
) WHERE rn <= 1
"""


@register("dedup_batch_vs_corpus", oracle=_batch_vs_corpus_oracle())
def dedup_batch_vs_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table near-dup gate: each incoming-batch vector matched to
    its best existing-corpus near-duplicate through the shared LSH bucket
    key — the new-crawl-vs-training-set dedup that precedes ingestion.
    The join never fans out |batch| x |corpus|; candidates are per-bucket."""
    emb = load_table(spark, sf_dir, "embeddings")
    is_batch = F.col("vec_id") % BATCH_MOD == BATCH_REM
    return dedup.cosine_batch_vs_corpus(
        emb.where(is_batch), emb.where(~is_batch), dim=64
    )


def _jaccard_prefix_oracle() -> str:
    # the prefix filter is LOSSLESS, so the oracle is the plain all-pairs
    # join at the same threshold — integer-gated exactly like the Spark
    # side (inter * 2 >= 1 * union for t = 1/2).  Grams are the same
    # 60-bit md5 fingerprints the Spark side shuffles (hex 1-15 ->
    # BIGINT; see jaccard_prefix_pairs for the collision math).
    sh = (
        f"list_distinct(list_transform({_sql_shingles('text')}, "
        f"s -> ('0x' || substr(md5(s), 1, 15))::BIGINT))"
    )
    return f"""
WITH sh AS (SELECT doc_id, {sh} AS sh FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
         AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh)) * 2
      >= (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
"""


@register("dedup_jaccard_prefix", oracle=_jaccard_prefix_oracle())
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.5 pairs over the WHOLE corpus via prefix
    filtering (PPJoin-style) — no block key needed: each doc's rarest
    ceil(L/2)+... prefix grams are a lossless blocking key, so the
    output equals the quadratic join the oracle runs (which is only
    feasible for DuckDB because the test corpus is small — that
    asymmetry is the point)."""
    return dedup.jaccard_prefix_pairs(load_table(spark, sf_dir, "documents"))


def _simham_oracle() -> str:
    sim = _simhash_oracle().strip()
    return f"""
WITH s AS ({sim})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {dedup.SIMHAM_K}
"""


@register("dedup_simhash_hamming", oracle=_simham_oracle())
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash pairs within hamming distance 2, blocked by the
    pigeonhole band split (3 bands of the 16-bit hash — a k-flip pair
    always shares one untouched band, so the blocking is lossless and
    the quadratic oracle is the ground truth)."""
    return dedup.simhash_hamming_pairs(load_table(spark, sf_dir, "documents"))


def _jaccard_clusters_oracle() -> str:
    # same transitive-closure oracle, over the EXACT Jaccard >= 1/2 edge
    # set (the prefix join's output) instead of the LSH candidates
    pairs = _jaccard_prefix_oracle()
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT src AS node, src AS lbl FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node
)
SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
FROM reach GROUP BY node
"""


@register("dedup_jaccard_clusters", oracle=_jaccard_clusters_oracle())
def dedup_jaccard_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end of the exact-dedup pipeline: connected components over
    the PPJoin prefix-filtered Jaccard >= 1/2 pairs — unlike the LSH
    cluster queries these edges are EXACT similarity, so the clusters
    are ground-truth duplicate groups, not candidate groups.  Same
    min-label fixpoint machinery (observe-fused probes); oracle is the
    recursive-CTE transitive closure over the quadratic pair set."""
    pairs = dedup.jaccard_prefix_pairs(
        load_table(spark, sf_dir, "documents")
    ).cache()
    return dedup.duplicate_clusters(pairs)


def _multipass_oracle() -> str:
    lsh = _lsh_pairs_oracle().strip()
    pj = _jaccard_prefix_oracle().strip()
    sh = _simham_oracle().strip()
    return f"""
WITH l AS ({lsh}), p AS ({pj}), s AS ({sh})
SELECT DISTINCT id_a, id_b FROM (
  SELECT id_a, id_b FROM l
  UNION ALL SELECT id_a, id_b FROM p
  UNION ALL SELECT id_a, id_b FROM s
)
"""


@register("dedup_multipass_pairs", oracle=_multipass_oracle())
def dedup_multipass_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass blocking (the entity-resolution recall stack): the
    UNION of three independent candidate generators — token-space LSH
    banding, exact prefix-filtered Jaccard, and bit-space SimHash
    hamming — deduplicated to one pair set.  Each pass catches near-dups
    the others' geometry misses (MinHash needs shingle overlap, SimHash
    tolerates scattered bit flips, the exact join anchors precision);
    at 100 TB the passes share the scan and their pair sets are tiny, so
    the union is output-sized.  r6: the three passes now run off ONE
    shared shingle-hash table + one exact-dup collapse
    (dedup.multipass_pair_union) — the corpus text is tokenized and
    md5'd exactly once instead of once per pass; the oracle stays the
    standalone three-way union, which the shared construction equals
    pair-for-pair (identical texts share every signature)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.multipass_pair_union(docs)


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup cluster representatives + prune list)
# ---------------------------------------------------------------------------


def _sem_assign_ctes() -> str:
    """cents + distance-carrying nearest-centroid assignment — the SQL
    mirror of ann_scale.ivf_assign_dist (same fold, same (d, cid)
    tie-break)."""
    from javascript_vector_database_spark.registry.ann_scale_queries import (
        _ivf_cents_cte,
    )

    d = osql.sql_euclid("e.embedding", "c.cemb")
    return f"""{_ivf_cents_cte()},
assign AS (
  SELECT vec_id, embedding, cid AS ivf_cell, d AS cdist FROM (
    SELECT e.vec_id, e.embedding, c.cid, {d} AS d,
           row_number() OVER (
             PARTITION BY e.vec_id ORDER BY {d} ASC, c.cid ASC) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
)"""


def _sem_medoid_oracle() -> str:
    return f"""
WITH {_sem_assign_ctes()}
SELECT ivf_cell, n_docs, vec_id AS medoid_id, round(cdist, 6) AS medoid_dist
FROM (
  SELECT ivf_cell, vec_id, cdist,
         CAST(count(*) OVER (PARTITION BY ivf_cell) AS BIGINT) AS n_docs,
         row_number() OVER (
           PARTITION BY ivf_cell ORDER BY cdist ASC, vec_id ASC) AS rn
  FROM assign
) WHERE rn = 1
"""


@register("dedup_semantic_medoids", oracle=_sem_medoid_oracle())
def dedup_semantic_medoids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep-side (Abbas et al. 2023): per embedding cluster
    (nearest of K fixed centroids), the cluster size and its MEDOID —
    the member nearest the centroid, the representative a semantic
    dedup pass keeps.  Assignment is a scan-local argmin fold; the
    reduction emits at most K rows per task (operators/dedup.py:
    semantic_medoids)."""
    return dedup.semantic_medoids(load_table(spark, sf_dir, "embeddings"))


def _sem_prune_oracle() -> str:
    cos = (
        f"round({osql.sql_dot('a.embedding', 'm.memb')} / "
        f"({osql.sql_l2_norm('a.embedding')} * {osql.sql_l2_norm('m.memb')}), 6)"
    )
    return f"""
WITH {_sem_assign_ctes()},
med AS (
  SELECT ivf_cell, vec_id AS medoid_id, embedding AS memb FROM (
    SELECT ivf_cell, vec_id, embedding,
           row_number() OVER (
             PARTITION BY ivf_cell ORDER BY cdist ASC, vec_id ASC) AS rn
    FROM assign
  ) WHERE rn = 1
)
SELECT a.vec_id, a.ivf_cell, {cos} AS cos_to_medoid
FROM assign a JOIN med m USING (ivf_cell)
WHERE a.vec_id != m.medoid_id AND {cos} >= {dedup.SEMANTIC_TAU}
"""


@register("dedup_semantic_prune", oracle=_sem_prune_oracle())
def dedup_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup prune-side: docs whose cosine to their cluster medoid
    reaches tau are semantic near-duplicates of the kept representative.
    LINEAR comparison count — each doc scores against exactly one
    medoid via a K-row broadcast join (operators/dedup.py:
    semantic_prune), the property that keeps semantic dedup tractable
    where within-cluster pairwise is quadratic."""
    return dedup.semantic_prune(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# duplicated-passage profile (ExactSubstr at k-gram granularity)
# ---------------------------------------------------------------------------


def _substring_profile_oracle() -> str:
    k = dedup.SUBSTR_GRAM_K
    gram = " || ' ' || ".join(f"t[i + {j}]" for j in range(k))
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, unnest(
    CASE WHEN len(t) >= {k}
         THEN list_transform(range(1, len(t) - {k - 2}), i -> {gram})
         ELSE [array_to_string(t, ' ')] END) AS s
  FROM toks
),
g AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(s), 1, 8))::BIGINT AS v1,
         ('0x' || substr(md5(s), 9, 8))::BIGINT AS v2
  FROM grams
),
nd AS (SELECT v1, v2, CAST(count(*) AS BIGINT) AS nd FROM g GROUP BY 1, 2),
d AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN nd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
  FROM g JOIN nd USING (v1, v2) GROUP BY 1
)
SELECT doc_id, n_grams, n_dup,
       CAST((n_dup * 1000000) // n_grams AS BIGINT) AS dup_micro
FROM d ORDER BY dup_micro DESC, doc_id ASC LIMIT 100
"""


@register("dedup_substring_profile", oracle=_substring_profile_oracle())
def dedup_substring_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-PASSAGE profile: the 100 documents most stitched from
    token-{k}-grams that also occur elsewhere in the corpus — the
    doc-level aggregate of ExactSubstr dedup (Lee et al. 2022) at
    k-gram granularity.  Complements the whole-doc pair rows: a doc can
    be 90% recycled passages without any single near-dup partner, and
    this is the row a training-data pipeline thresholds to drop such
    composites.  See operators/dedup.py:duplicated_gram_profile for the
    skew-routing argument (join over the gram key, not a window)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        dedup.duplicated_gram_profile(docs, k=dedup.SUBSTR_GRAM_K)
        .select("doc_id", "n_grams", "n_dup", "dup_micro")
        .orderBy(F.col("dup_micro").desc(), F.col("doc_id").asc())
        .limit(100)
    )


def _top_passages_oracle() -> str:
    k = dedup.SUBSTR_GRAM_K
    sh = _sql_shingles("text", k=k)
    return f"""
WITH g AS (
  SELECT DISTINCT doc_id, s AS passage FROM (
    SELECT doc_id, unnest({sh}) AS s FROM documents
  ) WHERE s IS NOT NULL
)
SELECT passage, CAST(count(*) AS BIGINT) AS n_docs
FROM g GROUP BY passage
HAVING count(*) >= 2
ORDER BY n_docs DESC, passage ASC
LIMIT 50
"""


@register("dedup_top_passages", oracle=_top_passages_oracle())
def dedup_top_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate DISCOVERY: the 50 token-{k}-gram passages recurring
    in the most documents — the other face of dedup_substring_profile
    (that row scores DOCS by recycled content; this surfaces the
    PASSAGES themselves, which is how a pipeline builds its
    boilerplate/header blocklist before filtering).  Distinct per doc
    (a passage repeated inside one doc counts once), one
    map-side-combined groupBy on the gram string, TakeOrdered for the
    top-50; docs shorter than k tokens contribute nothing (mirrored by
    the oracle's NULL-gram filter)."""
    docs = load_table(spark, sf_dir, "documents")
    g = dedup.exploded_shingles(
        docs, shingle_k=dedup.SUBSTR_GRAM_K, out_col="passage"
    ).dropDuplicates(["doc_id", "passage"])
    return (
        g.groupBy("passage")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), F.col("passage").asc())
        .limit(50)
    )
