"""Corpus-curation query surface: PII scrubbing, repetition metrics,
eval-set decontamination, deterministic mixture sampling, and sequence
packing — the pre-training passes of operators/curation.py, each with a
DuckDB oracle built from the same engine-portable constructions.

The test corpus carries no real PII, so ``curation_pii_scrub`` first
composes a deterministic ``raw`` column (text + an email/IP/phone built
arithmetically from the primary key, IDENTICALLY on both engines) and
then runs the generic scrubber over it — the redaction logic is fully
exercised with non-zero counts and the oracle checks every byte of the
scrubbed output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from javascript_vector_database_spark.operators import curation
from javascript_vector_database_spark.registry import register
from javascript_vector_database_spark.tables import load_table, spread

# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------


def _raw_pii_col() -> F.Column:
    """text + synthetic contact line derived from doc_id (Spark side)."""
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ip 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 100).cast("string"),
        F.lit("."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit(" call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )


_RAW_PII_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com ip 10.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.' || CAST(doc_id % 100 AS VARCHAR)"
    " || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)"
    " || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def _pii_oracle() -> str:
    frags = curation.sql_pii_scrub("raw")
    return f"""
WITH t AS (SELECT doc_id, {_RAW_PII_SQL} AS raw FROM documents)
SELECT doc_id,
       CAST({frags['email']} AS BIGINT) AS n_email,
       CAST({frags['ipv4']} AS BIGINT) AS n_ipv4,
       CAST({frags['phone']} AS BIGINT) AS n_phone,
       {frags['scrubbed']} AS scrubbed
FROM t
"""


@register("curation_pii_scrub", oracle=_pii_oracle())
def curation_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count + redact emails/IPs/phones.  Pure regexp Column expressions
    riding the scan — zero shuffle at any scale."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _raw_pii_col().alias("raw")
    )
    out = curation.pii_scrub(docs, text_col="raw")
    return out.select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        F.col("n_phone").cast("long").alias("n_phone"),
        "scrubbed",
    )


# ---------------------------------------------------------------------------
# repetition metrics
# ---------------------------------------------------------------------------


@register(
    "curation_repetition_stats", oracle=curation.sql_repetition_stats("documents")
)
def curation_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: top-token share and duplicate
    token/bigram ratios.  One (doc, token) shuffle with map-side combine;
    bigram dedup is row-local array math."""
    return curation.repetition_stats(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# eval-set contamination
# ---------------------------------------------------------------------------

#: pseudo eval set: every 25th document (benchmarks are small; the real
#: pipeline would read a benchmark table here)
EVAL_MOD = 25


def _contamination_oracle() -> str:
    return curation.sql_contamination_pairs(
        corpus_pred=f"doc_id % {EVAL_MOD} <> 0",
        eval_pred=f"doc_id % {EVAL_MOD} = 0",
    )


@register("curation_contamination", oracle=_contamination_oracle())
def curation_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs sharing >= 8 distinct 3-gram shingles with an eval
    doc — the decontamination join.  Eval side broadcast; corpus side
    never shuffles (map-side join over the scan)."""
    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    return curation.contamination_pairs(docs.where(~is_eval), docs.where(is_eval))


# ---------------------------------------------------------------------------
# mixture sampling
# ---------------------------------------------------------------------------

#: target language mixture (keep rates) — the kind of rebalancing a
#: multilingual pre-training mix applies to a raw crawl
MIX_RATES = {"en": 0.9, "de": 0.5, "fr": 0.5, "es": 0.25, "zh": 0.1}


def _mixture_oracle() -> str:
    inner = curation.sql_mixture_sample(MIX_RATES)
    return f"SELECT doc_id, lang, source FROM ({inner})"


@register("curation_mixture_sample", oracle=_mixture_oracle())
def curation_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling via the portable md5
    bucket — row-local filter riding the scan; adding data never flips
    earlier keep/drop decisions."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.mixture_sample(docs, MIX_RATES).select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

PACK_TOKENS = 256


@register(
    "curation_pack_sequences",
    oracle=curation.sql_pack_sequences(max_tokens=PACK_TOKENS),
)
def curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk packing layout: each doc's token interval in the
    per-source concatenated stream.  One window shuffle on source."""
    return curation.pack_sequences(
        load_table(spark, sf_dir, "documents"), max_tokens=PACK_TOKENS
    )


# ---------------------------------------------------------------------------
# normalization + normalized exact dedup
# ---------------------------------------------------------------------------

#: deterministic variant corpus: every group of 5 consecutive doc ids
#: shares one base text, each member perturbed differently (upper-cased /
#: punctuation noise / doubled whitespace by id residue) — so raw md5
#: sees 5 distinct strings while the normalizer must collapse them back
#: to one group
_PERTURB_SQL = (
    "CASE WHEN t.doc_id % 3 = 0 THEN upper(b.text) ELSE b.text END"
    " || CASE WHEN t.doc_id % 5 = 1 THEN '  !!' ELSE '' END"
    " || CASE WHEN t.doc_id % 5 = 2 THEN '   ' ELSE '' END"
)


def _normalize_dedup_oracle() -> str:
    norm = curation.sql_normalize_text("raw")
    return f"""
WITH v AS (
  SELECT t.doc_id, {_PERTURB_SQL} AS raw
  FROM documents t JOIN documents b ON b.doc_id = t.doc_id - (t.doc_id % 5)
)
SELECT md5({norm}) AS norm_hash,
       min(doc_id) AS canonical_id,
       count(*) AS n_variants
FROM v GROUP BY md5({norm})
"""


@register("curation_normalize_dedup", oracle=_normalize_dedup_oracle())
def curation_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-then-dedup: case/punctuation/whitespace variants of
    the same content collapse into one group (raw md5 would treat every
    variant as unique — the synthetic variant corpus makes 5 raw strings
    per base text).  The normalizer is a scan-side regex chain; the only
    shuffles are the variant self-join and the hash groupBy with
    map-side partials."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(F.col("doc_id").alias("__bid"), F.col("text").alias("__btext"))
    t = docs.select(
        "doc_id", (F.col("doc_id") - F.pmod(F.col("doc_id"), 5)).alias("__bid")
    )
    raw = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.upper("__btext")).otherwise(
            F.col("__btext")
        ),
        F.when(F.col("doc_id") % 5 == 1, F.lit("  !!")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 2, F.lit("   ")).otherwise(F.lit("")),
    )
    variants = t.join(base, "__bid").select("doc_id", raw.alias("raw"))
    return (
        variants.select(
            "doc_id", F.md5(curation.normalize_text("raw")).alias("norm_hash")
        )
        .groupBy("norm_hash")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_variants"),
        )
    )


# ---------------------------------------------------------------------------
# stratified split
# ---------------------------------------------------------------------------


def _stratified_split_oracle() -> str:
    from javascript_vector_database_spark.operators.chunking import (
        sql_stratified_split_assign,
    )

    return f"""
SELECT doc_id, source, {sql_stratified_split_assign()} AS split
FROM documents
"""


@register("curation_split_stratified", oracle=_stratified_split_oracle())
def curation_split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified train/val/test: md5-rank quantiles INSIDE each source
    land the 80/10/10 target exactly per group (the global hash draw only
    hits it in expectation — small groups visibly miss).  One shuffle on
    the group column."""
    from javascript_vector_database_spark.operators.chunking import (
        stratified_split_assign,
    )

    docs = load_table(spark, sf_dir, "documents")
    return stratified_split_assign(docs).select("doc_id", "source", "split")


def _lm_quality_oracle() -> str:
    from javascript_vector_database_spark.operators.curation import (
        sql_unigram_lm_scores,
    )

    return sql_unigram_lm_scores("documents")


@register("curation_lm_quality", oracle=_lm_quality_oracle())
def curation_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filtering with a corpus-trained unigram
    model standing in for the external KenLM: one token-stats pass, a
    broadcast-sized top-V model with an OOV floor, per-doc average token
    log-probability via a deterministic token-ascending fold.  Docs far
    below the typical score are boilerplate/wrong-language; far above
    are repetitive — the standard pre-training quality gate between the
    heuristic scores (text_quality_score) and real perplexity."""
    from javascript_vector_database_spark.operators.curation import (
        unigram_lm_scores,
    )

    return unigram_lm_scores(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# per-domain cap (crawl-corpus domain balancing)
# ---------------------------------------------------------------------------

#: keep at most this many docs per source/domain
DOMAIN_CAP = 10


def _domain_cap_oracle() -> str:
    from javascript_vector_database_spark.functions.text import (
        sql_quality_score,
    )

    q = sql_quality_score("text")
    return f"""
SELECT doc_id, source, quality, rn FROM (
  SELECT doc_id, source, {q} AS quality,
         row_number() OVER (PARTITION BY source
                            ORDER BY {q} DESC, doc_id ASC) AS rn
  FROM documents
) WHERE rn <= {DOMAIN_CAP}
"""


@register("curation_domain_cap", oracle=_domain_cap_oracle())
def curation_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap — the crawl-balancing gate (C4/RefinedWeb keep a
    bounded number of pages per domain so no site dominates the mix):
    top-``DOMAIN_CAP`` docs per ``source`` by the closed-form quality
    score, doc_id tiebreak.  The rank filter compiles to the two-phase
    ``WindowGroupLimit`` (same shape as knn_batch_exact): each map
    partition emits <= cap rows per domain BEFORE the exchange, so the
    shuffle carries O(domains x cap), not the corpus."""
    from javascript_vector_database_spark.functions.text import quality_score
    from pyspark.sql import Window as W

    docs = spread(load_table(spark, sf_dir, "documents"))
    w = W.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        docs.select("doc_id", "source", quality_score("text").alias("quality"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= DOMAIN_CAP)
    )


# ---------------------------------------------------------------------------
# bloom-prefiltered decontamination (same oracle as the exact pass —
# a bloom filter has no false negatives, so the results are identical)
# ---------------------------------------------------------------------------


@register("curation_contamination_bloom", oracle=_contamination_oracle())
def curation_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination join behind an 8 KiB deterministic bloom
    pre-filter: corpus grams test 2 md5-derived bits of an inlined
    bitmap and only survivors reach the exact confirm join — the
    explicit, engine-portable version of Spark's runtime bloom-filter
    join, for the regime where the eval side outgrows the broadcast
    threshold.  Oracle: the SAME SQL as curation_contamination (no false
    negatives => identical output)."""
    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    return curation.bloom_contamination_pairs(
        docs.where(~is_eval), docs.where(is_eval)
    )


# ---------------------------------------------------------------------------
# corpus-level boilerplate removal (C4's repeated-line pass)
# ---------------------------------------------------------------------------

#: segment width (the synthetic corpus has no newlines, so "lines" are
#: fixed 8-token segments — same granularity as curation_chunk_dedup)
BP_SEG = 8
#: a segment occurring this often corpus-wide is boilerplate
BP_MIN_REPEATS = 3

_BOILERPLATE_ORACLE = f"""
WITH t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
           FROM documents),
seg AS (
  SELECT doc_id, k AS seg_idx,
         array_to_string(toks[(k * {BP_SEG} + 1):(k * {BP_SEG} + {BP_SEG})], ' ') AS seg
  FROM t, LATERAL unnest(range(0, CAST(ceil(len(toks) / {float(BP_SEG)}) AS BIGINT))) AS u(k)
),
bad AS (SELECT seg FROM seg GROUP BY seg HAVING count(*) >= {BP_MIN_REPEATS}),
m AS (SELECT s.doc_id, s.seg_idx, s.seg, b.seg IS NOT NULL AS is_bad
      FROM seg s LEFT JOIN bad b USING (seg))
SELECT doc_id,
       coalesce(string_agg(CASE WHEN NOT is_bad THEN seg END, ' '
                           ORDER BY seg_idx), '') AS clean_text,
       CAST(sum(CASE WHEN is_bad THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM m GROUP BY doc_id
"""


@register("curation_remove_boilerplate", oracle=_BOILERPLATE_ORACLE)
def curation_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4's repeated-line pass, segment-granular: any 8-token segment
    occurring >= 3 times corpus-wide is boilerplate; each doc's
    surviving segments are reassembled IN ORDER into clean_text (docs
    that were pure boilerplate keep an empty string, not a dropped row).

    Scale shape: segmentation is a row-local explode; the repeat count
    is one groupBy on the segment string (map-side combined — the same
    key distribution as chunk dedup); the flag join is AQE-sized (the
    bad-segment set is unbounded on a templated crawl — never hint
    broadcast); reassembly sorts each doc's own handful of segments
    row-locally (collect_list skips the NULLed-out bad segments,
    sort_array orders by the unique seg_idx)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    base = docs.select("doc_id", toks.alias("__t"))
    nseg = F.ceil(F.size("__t") / F.lit(float(BP_SEG))).cast("long")
    seg = base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("long"), nseg - 1)).alias("seg_idx"),
        "__t",
    ).select(
        "doc_id",
        "seg_idx",
        F.array_join(
            F.slice(F.col("__t"), (F.col("seg_idx") * BP_SEG + 1).cast("int"), BP_SEG),
            " ",
        ).alias("seg"),
    )
    bad = (
        seg.groupBy("seg")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= BP_MIN_REPEATS)
        .select("seg", F.lit(True).alias("is_bad"))
    )
    marked = seg.join(bad, "seg", "left").select(
        "doc_id", "seg_idx", "seg", F.coalesce("is_bad", F.lit(False)).alias("is_bad")
    )
    return marked.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            ~F.col("is_bad"), F.struct("seg_idx", "seg")
                        )
                    )
                ),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("clean_text"),
        F.sum(F.col("is_bad").cast("long")).cast("bigint").alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# Luhn-validated card detection (validation-gated PII)
# ---------------------------------------------------------------------------

#: deterministic 16-digit candidate: 15 doc_id-derived digits + a check
#: digit that is CORRECT for ~1 in 10 docs (exercises both branches)
_CC_SPARK = None  # built inline below


def _cc_candidate_spark() -> F.Column:
    body = F.lpad(
        ((F.col("doc_id") + 7) * 479001599 % 999999999999937).cast("string"),
        15,
        "0",
    )
    return F.concat(body, (F.col("doc_id") % 10).cast("string"))


_CC_SQL = (
    "lpad(CAST((doc_id + 7) * 479001599 % 999999999999937 AS VARCHAR), 15, '0')"
    " || CAST(doc_id % 10 AS VARCHAR)"
)


def _luhn_oracle() -> str:
    valid = curation.sql_luhn_valid("cand")
    return f"""
WITH t AS (SELECT doc_id,
                  text || ' card ' || {_CC_SQL} AS raw,
                  {_CC_SQL} AS cand
           FROM documents)
SELECT doc_id, cand AS cc_candidate,
       {valid} AS luhn_valid,
       CASE WHEN {valid}
            THEN replace(raw, cand, '{curation.CC_TOKEN}')
            ELSE raw END AS scrubbed
FROM t
"""


@register("curation_luhn_cc_detect", oracle=_luhn_oracle())
def curation_luhn_cc_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-VALIDATED card-number scrubbing: every doc carries a
    synthetic 16-digit candidate, but only Luhn-valid ones (~1 in 10)
    are redacted — the validation gate a real PII pass needs so phone/
    account digit runs aren't mass-redacted.  The checksum is a 16-term
    unrolled integer expression riding the scan (no HOF, no UDF, zero
    shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    cand = _cc_candidate_spark()
    t = docs.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" card "), cand).alias("raw"),
        cand.alias("cand"),
    )
    valid = curation.luhn_valid(F.col("cand"))
    return t.select(
        "doc_id",
        F.col("cand").alias("cc_candidate"),
        valid.alias("luhn_valid"),
        F.when(
            valid, F.replace(F.col("raw"), F.col("cand"), F.lit(curation.CC_TOKEN))
        )
        .otherwise(F.col("raw"))
        .alias("scrubbed"),
    )


# ---------------------------------------------------------------------------
# consistent (universe) sampling across tables
# ---------------------------------------------------------------------------

#: keep users whose hash bucket falls under this rate (10%)
_UNIVERSE_RATE_BP = 1000


def _universe_oracle() -> str:
    from javascript_vector_database_spark.operators.curation import (
        sql_hash_bucket,
    )

    pred = lambda col: f"{sql_hash_bucket(col)} < {_UNIVERSE_RATE_BP}"  # noqa: E731
    return f"""
SELECT 'events' AS table_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events WHERE {pred('user_id')}
UNION ALL
SELECT 'orders',
       CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT o_custkey) AS BIGINT)
FROM orders WHERE {pred('o_custkey')}
"""


@register("curation_universe_sample", oracle=_universe_oracle())
def curation_universe_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNIVERSE sampling: the same md5-bucket predicate on the USER key
    samples every table, so a sampled user's whole history survives
    across events AND orders (per-row Bernoulli sampling would shatter
    joins — a 10% row sample keeps only ~1% of user-order pairs).  The
    predicate is the engine-portable hash bucket the mixture sampler
    uses; zero shuffle — both gates ride their scans."""
    from javascript_vector_database_spark.operators.curation import (
        portable_hash_bucket,
    )

    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    a = (
        ev.where(portable_hash_bucket(F.col("user_id")) < _UNIVERSE_RATE_BP)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
        .select(F.lit("events").alias("table_name"), "n_rows", "n_users")
    )
    b = (
        orders.where(portable_hash_bucket(F.col("o_custkey")) < _UNIVERSE_RATE_BP)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct("o_custkey").cast("bigint").alias("n_users"),
        )
        .select(F.lit("orders").alias("table_name"), "n_rows", "n_users")
    )
    return a.unionByName(b)


# ---------------------------------------------------------------------------
# quality-weighted sampling
# ---------------------------------------------------------------------------


def _weighted_sample_oracle() -> str:
    from javascript_vector_database_spark.functions.text import (
        sql_quality_score,
    )
    from javascript_vector_database_spark.operators.curation import (
        sql_hash_bucket,
    )

    q = sql_quality_score("text")
    return f"""
SELECT doc_id, {q} AS quality
FROM documents
WHERE {sql_hash_bucket('doc_id')} < CAST(floor({q} * 10000) AS BIGINT)
"""


@register("curation_weighted_sample", oracle=_weighted_sample_oracle())
def curation_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-WEIGHTED sampling: each doc survives with probability
    equal to its quality score (the soft-filtering mix a pre-training
    pipeline uses instead of a hard threshold — high-quality docs are
    kept almost surely, mediocre ones proportionally).  The draw is the
    engine-portable md5 bucket against floor(quality * 10000) — both
    sides compute identical doubles, so the floor product and the
    comparison agree bit-for-bit; deterministic, reproducible, stable
    under appends (same guarantees as the per-class mixture sampler)."""
    from javascript_vector_database_spark.functions.text import quality_score
    from javascript_vector_database_spark.operators.curation import (
        portable_hash_bucket,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    q = quality_score("text")
    return (
        docs.select("doc_id", q.alias("quality"))
        .where(
            portable_hash_bucket(F.col("doc_id"))
            < F.floor(F.col("quality") * 10000).cast("long")
        )
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers
# ---------------------------------------------------------------------------

#: minimum group size for a quasi-identifier combination to be safe
K_ANON = 5
#: length-bucket width for the n_chars quasi-identifier
K_ANON_LEN_BUCKET = 100

_K_ANON_ORACLE = f"""
WITH g AS (
  SELECT lang, source,
         CAST(n_chars // {K_ANON_LEN_BUCKET} AS BIGINT) AS len_bucket,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1, 2, 3
)
SELECT lang, source, len_bucket, n_docs,
       CASE WHEN n_docs < {K_ANON} THEN 1 ELSE 0 END AS risky
FROM g
ORDER BY n_docs ASC, lang ASC, source ASC, len_bucket ASC
LIMIT 100
"""


@register("curation_k_anonymity", oracle=_K_ANON_ORACLE)
def curation_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002, public): group the corpus by its
    quasi-identifier combination (lang, source, length bucket) and flag
    combinations held by fewer than k documents — the groups whose
    members a release could re-identify by joining on those attributes
    alone.  The privacy-side complement of curation_pii_scrub (scrub
    removes DIRECT identifiers; k-anonymity measures the INDIRECT
    ones), run before publishing any corpus slice.  One
    map-side-combined groupBy over the fact table, then a TakeOrdered
    over the tiny group table — the audit costs one scan at any
    corpus size (k = K_ANON = 5)."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy(
        "lang",
        "source",
        F.expr(f"n_chars DIV {K_ANON_LEN_BUCKET}").cast("long").alias(
            "len_bucket"
        ),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        g.select(
            "lang",
            "source",
            "len_bucket",
            "n_docs",
            F.when(F.col("n_docs") < K_ANON, 1).otherwise(0).alias("risky"),
        )
        .orderBy(
            F.col("n_docs").asc(),
            F.col("lang").asc(),
            F.col("source").asc(),
            F.col("len_bucket").asc(),
        )
        .limit(100)
    )
