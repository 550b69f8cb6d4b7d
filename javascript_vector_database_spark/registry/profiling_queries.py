"""Corpus-profiling extension surface: the data-engineering queries a
training-data pipeline runs before/after filtering — vocabulary heavy
hitters, length distribution, deterministic per-group sampling.

Scale notes: the token heavy-hitter is the canonical two-phase aggregate
(map-side partial counts per token, one shuffle on the token string,
TakeOrdered for the top-k — never a full sort); the histogram shuffles
only ~40 bucket keys; the per-source sample is one window over a
(source)-partitioned sort keyed by a hash, i.e. reservoir-style uniform
sampling that is reproducible across engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from javascript_vector_database_spark.functions.text import word_tokens
from javascript_vector_database_spark.registry import register
from javascript_vector_database_spark.tables import load_table, spread

TOP_TOKENS = 50
HIST_BUCKET = 50
SAMPLE_PER_GROUP = 3

_TOP_TOKENS_ORACLE = f"""
SELECT tok, count(*) AS n
FROM (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents
)
GROUP BY tok
ORDER BY n DESC, tok ASC
LIMIT {TOP_TOKENS}
"""


@register("profile_top_tokens", oracle=_TOP_TOKENS_ORACLE)
def profile_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary heavy hitters: explode tokens -> partial-agg count ->
    top-k.  The only shuffle carries (token, partial_count) pairs; the
    top-k is TakeOrderedAndProject."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(word_tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(TOP_TOKENS)
    )


_LEN_HIST_ORACLE = f"""
SELECT (n_chars // {HIST_BUCKET}) * {HIST_BUCKET} AS bucket_lo,
       count(*) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY 1
"""


@register("profile_length_histogram", oracle=_LEN_HIST_ORACLE)
def profile_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram (fixed-width buckets): the shuffle
    carries only ~max(n_chars)/bucket keys regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (F.floor(F.col("n_chars") / HIST_BUCKET) * HIST_BUCKET).cast("long")
    return (
        docs.groupBy(bucket.alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


_CURATION_QUALITY_MIN = 0.5


def _curation_oracle() -> str:
    from javascript_vector_database_spark.functions.text import (
        sql_quality_score,
    )
    from javascript_vector_database_spark.registry.dedup_queries import (
        _lsh_pairs_oracle,
    )

    # near-dup ids to drop = the id_b side of the LSH candidate pairs
    # (keep the min-id representative of every duplicate cluster edge)
    lsh = _lsh_pairs_oracle().strip().rstrip()
    return f"""
WITH pairs AS ({lsh}),
dupes AS (SELECT DISTINCT id_b AS doc_id FROM pairs)
SELECT d.doc_id, d.lang, {sql_quality_score('d.text')} AS quality
FROM documents d
LEFT JOIN dupes USING (doc_id)
WHERE dupes.doc_id IS NULL
  AND d.lang = 'en'
  AND {sql_quality_score('d.text')} >= {_CURATION_QUALITY_MIN}
"""


@register("curation_pipeline", oracle=_curation_oracle())
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data curation filter, one composed plan:
    language gate + quality-score gate + near-duplicate removal (anti-join
    against the id_b side of the MinHash/LSH candidate pairs, keeping each
    cluster's min-id representative).  At 100 TB: the scan-side scalar
    gates prune before the only shuffles (LSH banding + the anti-join)."""
    from javascript_vector_database_spark.functions.text import quality_score
    from javascript_vector_database_spark.operators import dedup

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = dedup.lsh_band_pairs(docs)
    dupes = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    # no broadcast hint: on a real crawl 30-50% of docs are near-dups and
    # a forced broadcast of billions of ids is a driver OOM.  AQE sizes
    # the materialized distinct at runtime and picks broadcast when (and
    # only when) the dupe side is actually small — plan-pinned by
    # tests/test_plans.py::test_curation_pipeline_antijoin_aqe_sized
    return (
        docs.join(dupes, "doc_id", "left_anti")
        .where(F.col("lang") == "en")
        .withColumn("quality", quality_score("text"))
        .where(F.col("quality") >= _CURATION_QUALITY_MIN)
        .select("doc_id", "lang", "quality")
    )


def _chunks_oracle() -> str:
    from javascript_vector_database_spark.operators.chunking import (
        sql_chunk_documents,
    )

    return sql_chunk_documents()


@register("curation_chunk_documents", oracle=_chunks_oracle())
def curation_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence chunking: each document split into 64-token training
    chunks with a 48-token stride (16-token overlap).  Tokenize once,
    posexplode the chunk starts, slice the token array — row-local fan-out
    with no shuffle."""
    from javascript_vector_database_spark.operators.chunking import (
        chunk_documents,
    )

    return chunk_documents(spread(load_table(spark, sf_dir, "documents")))


def _split_oracle() -> str:
    from javascript_vector_database_spark.operators.chunking import (
        sql_split_assign,
    )

    return f"""
SELECT doc_id, {sql_split_assign('doc_id')} AS split
FROM documents
"""


@register("curation_split_assign", oracle=_split_oracle())
def curation_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment from md5(pk) — stable
    across runs, engines and partitioning (never rand()); at scale the
    output is written partitioned by the split label."""
    from javascript_vector_database_spark.operators.chunking import (
        split_assign,
    )

    docs = load_table(spark, sf_dir, "documents")
    return split_assign(docs).select("doc_id", "split")


_SAMPLE_ORACLE = f"""
SELECT source, doc_id, lang
FROM (
  SELECT source, doc_id, lang,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
         ) AS rn
  FROM documents
)
WHERE rn <= {SAMPLE_PER_GROUP}
"""


@register("profile_sample_per_source", oracle=_SAMPLE_ORACLE)
def profile_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform sample of K docs per source: hash-order
    row_number within each group — reproducible across engines and runs,
    one shuffle on the group key."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        docs.select("source", "doc_id", "lang", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= SAMPLE_PER_GROUP)
        .drop("rn")
    )


_LEN_QUANTILES_ORACLE = """
SELECT source,
       count(*) AS n_docs,
       quantile_cont(n_chars, 0.25) AS q25,
       quantile_cont(n_chars, 0.5) AS median,
       quantile_cont(n_chars, 0.75) AS q75
FROM documents
GROUP BY source
"""


@register("profile_length_quantiles", oracle=_LEN_QUANTILES_ORACLE)
def profile_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact length quantiles — the distribution summary a
    curation pass reads before setting length filters.  One shuffle on
    the short source key; EXACT percentile (not approx) because 0.25/0.5/
    0.75 interpolate to binary-exact doubles, so both engines agree
    bit-for-bit (0.95-style quantiles would not — approx_percentile is
    the 100 TB alternative when exactness can be traded for one pass)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.percentile("n_chars", F.lit(0.25)).alias("q25"),
        F.percentile("n_chars", F.lit(0.5)).alias("median"),
        F.percentile("n_chars", F.lit(0.75)).alias("q75"),
    )


def _chunk_dedup_oracle() -> str:
    from javascript_vector_database_spark.operators.chunking import (
        sql_chunk_documents,
    )

    return f"""
WITH chunks AS ({sql_chunk_documents()})
SELECT md5(chunk_text) AS chunk_hash,
       min(doc_id * 1000000 + chunk_idx) AS canonical_key,
       count(*) AS n_dups
FROM chunks GROUP BY md5(chunk_text)
"""


@register("curation_chunk_dedup", oracle=_chunk_dedup_oracle())
def curation_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (chunk-level) dedup — the C4-style pass that catches
    boilerplate and partial copies whole-document hashing misses:
    chunk -> md5 -> group, keeping the smallest (doc, chunk) position as
    canonical.  The explode is row-local; the only shuffle is the hash
    groupBy with map-side partials (identical shape to exact doc dedup,
    just below document granularity)."""
    from javascript_vector_database_spark.operators.chunking import (
        chunk_documents,
    )

    chunks = chunk_documents(spread(load_table(spark, sf_dir, "documents")))
    return (
        chunks.select(
            F.md5("chunk_text").alias("chunk_hash"),
            (F.col("doc_id") * 1000000 + F.col("chunk_idx")).alias("__key"),
        )
        .groupBy("chunk_hash")
        .agg(
            F.min("__key").alias("canonical_key"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


#: NULL grouping keys are coalesced to a sentinel on BOTH engines: the
#: driver's canonicalizer sorts row tuples, and None is unorderable
#: against the real string keys (the corpus has no NULL source/lang, so
#: the sentinel is unambiguous)
_QUALITY_CUBE_ORACLE = """
SELECT coalesce(source, '(all)') AS source,
       coalesce(lang, '(all)') AS lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY CUBE (source, lang)
"""


@register("profile_cube_source_lang", oracle=_QUALITY_CUBE_ORACLE)
def profile_cube_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (source, lang): every aggregation level in ONE pass
    (per-pair, per-source, per-lang, grand total) — Spark expands the
    grouping sets before the single shuffle, so the corpus is still read
    once.  Aggregates are integer-only (count/sum/min/max of n_chars) so
    the cross-engine hash is order-independent."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.cube("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .select(
            F.coalesce("source", F.lit("(all)")).alias("source"),
            F.coalesce("lang", F.lit("(all)")).alias("lang"),
            "n_docs", "sum_chars", "min_chars", "max_chars",
        )
    )


#: fixed pivot-column list — deterministic output schema on both engines
_PIVOT_LANGS = ("de", "en", "es", "fr", "zh")

_PIVOT_ORACLE = f"""
SELECT source,
       {", ".join(f"CAST(sum(CASE WHEN lang = '{l}' THEN 1 ELSE 0 END) AS BIGINT) AS {l}" for l in _PIVOT_LANGS)}
FROM documents GROUP BY source
"""


@register("profile_pivot_lang_counts", oracle=_PIVOT_ORACLE)
def profile_pivot_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-count matrix via the DataFrame ``pivot`` API with an
    EXPLICIT value list (dynamic pivots need a distinct-values pre-scan
    and make the schema data-dependent — fixed values keep one job and a
    stable schema).  Compiles to a single hash aggregate with one
    conditional-count column per language: one shuffle on source."""
    docs = load_table(spark, sf_dir, "documents")
    out = (
        docs.groupBy("source")
        .pivot("lang", list(_PIVOT_LANGS))
        .count()
    )
    # pivot emits NULL for empty cells; the oracle's conditional sum emits 0
    return out.select(
        "source",
        *[F.coalesce(F.col(l), F.lit(0)).cast("long").alias(l) for l in _PIVOT_LANGS],
    )


# ---------------------------------------------------------------------------
# unpivot / melt (the inverse of profile_pivot_lang_counts)
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH stats AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         CAST(max(n_chars) AS BIGINT) AS max_chars
  FROM documents GROUP BY lang
)
SELECT lang, metric, value FROM (
  SELECT lang, 'n_docs' AS metric, n_docs AS value FROM stats
  UNION ALL SELECT lang, 'total_chars', total_chars FROM stats
  UNION ALL SELECT lang, 'max_chars', max_chars FROM stats
)
"""


@register("profile_unpivot_lang_stats", oracle=_UNPIVOT_ORACLE)
def profile_unpivot_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long melt via ``DataFrame.unpivot`` (Spark's UNPIVOT /
    pandas melt — the inverse of profile_pivot_lang_counts).  Unpivot is
    an Expand projection (each input row emits one row per value column)
    — scan-local, zero shuffle beyond the small upstream aggregate; the
    oracle spells the same reshaping as a UNION ALL.  Value columns are
    all BIGINT (unpivot requires one common type; counts are exact)."""
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )
    return stats.unpivot(
        ["lang"], ["n_docs", "total_chars", "max_chars"], "metric", "value"
    )


# ---------------------------------------------------------------------------
# Benford first-digit profile
# ---------------------------------------------------------------------------

#: expected Benford frequencies log10(1 + 1/d), emitted as the SAME
#: decimal literals on both engines (never derived via log at runtime)
_BENFORD = {
    1: 0.30103, 2: 0.176091, 3: 0.124939, 4: 0.09691, 5: 0.079181,
    6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757,
}


def _benford_oracle() -> str:
    exp = " ".join(
        f"WHEN {d} THEN {_BENFORD[d]}" for d in sorted(_BENFORD)
    )
    return f"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
              AS INT) AS digit
  FROM orders
),
c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
SELECT c.digit, c.n,
       floor(CAST(c.n * 1000000 AS DOUBLE) / t.tot) / 1000000.0 AS observed,
       CAST(CASE c.digit {exp} END AS DOUBLE) AS expected
FROM c, t
"""


@register("profile_benford_digits", oracle=_benford_oracle())
def profile_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit profile of order values — the
    fraud/synthetic-data smell test a profiling pass runs over monetary
    columns.  The digit comes from the DECIMAL's string form (identical
    rendering cross-engine — never float log10); observed frequencies
    use the tie-free floor-at-micro division; expected frequencies are
    fixed decimal literals.  One scan, one 9-key groupBy."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
    ).cast("int")
    c = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy()
    expected = F.lit(None).cast("double")
    for d in sorted(_BENFORD, reverse=True):
        expected = F.when(F.col("digit") == d, F.lit(_BENFORD[d])).otherwise(
            expected
        )
    return c.select(
        "digit",
        "n",
        (
            F.floor((F.col("n") * 1000000).cast("double") / F.sum("n").over(w))
            / F.lit(1000000.0)
        ).alias("observed"),
        expected.alias("expected"),
    )


# ---------------------------------------------------------------------------
# split drift (chi-square distance between split length distributions)
# ---------------------------------------------------------------------------

_DRIFT_BUCKET = 50

_DRIFT_ORACLE = f"""
WITH b AS (
  SELECT (n_chars // {_DRIFT_BUCKET}) * {_DRIFT_BUCKET} AS bucket_lo,
         CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM documents GROUP BY 1
),
t AS (SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb FROM b)
SELECT b.bucket_lo, b.na, b.nb,
       -- chi-square contribution with EXACT integer numerator:
       -- (na*tb - nb*ta)^2 / (ta*tb*(na+nb)) — one float division
       round(CAST((b.na * t.tb - b.nb * t.ta) * (b.na * t.tb - b.nb * t.ta)
                  AS DOUBLE)
             / (CAST(t.ta AS DOUBLE) * t.tb * (b.na + b.nb)), 8)
         AS chi2_term
FROM b, t
"""


@register("profile_split_drift", oracle=_DRIFT_ORACLE)
def profile_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between two splits (doc_id parity standing in
    for train/val): per length-bucket counts and the chi-square
    homogeneity contribution, with the numerator kept as an EXACT
    integer (na*tb - nb*ta)^2 so only one float division remains — the
    drift gate a pipeline runs after re-sampling to prove the splits
    still match.  One conditional-aggregation scan, ~40 bucket keys."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (F.floor(F.col("n_chars") / _DRIFT_BUCKET) * _DRIFT_BUCKET).cast("long")
    b = docs.groupBy(bucket.alias("bucket_lo")).agg(
        F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("doc_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("nb"),
    )
    w = Window.partitionBy()
    ta = F.sum("na").over(w)
    tb = F.sum("nb").over(w)
    num = (F.col("na") * tb - F.col("nb") * ta)
    return b.select(
        "bucket_lo",
        "na",
        "nb",
        F.round(
            (num * num).cast("double")
            / (ta.cast("double") * tb * (F.col("na") + F.col("nb"))),
            8,
        ).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# join-key skew diagnosis (the profile that decides salted vs plain join)
# ---------------------------------------------------------------------------

SKEW_TOP = 10

_KEY_SKEW_ORACLE = f"""
WITH counts AS (
  SELECT o_custkey AS key, count(*) AS cnt FROM orders GROUP BY 1
),
totals AS (
  SELECT count(*) AS n_keys, sum(cnt) AS total_rows FROM counts
)
SELECT c.key, CAST(c.cnt AS BIGINT) AS cnt,
       CAST((c.cnt * 1000000) // t.total_rows AS BIGINT) AS share_micro,
       CAST((c.cnt * t.n_keys * 1000) // t.total_rows AS BIGINT)
         AS skew_x1000,
       CAST(t.n_keys AS BIGINT) AS n_keys,
       CAST(t.total_rows AS BIGINT) AS total_rows
FROM counts c, totals t
ORDER BY cnt DESC, key ASC
LIMIT {SKEW_TOP}
"""


@register("profile_key_skew", oracle=_KEY_SKEW_ORACLE)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis: the heaviest SKEW_TOP customer keys in
    `orders` with their row share and skew multiplier vs a uniform
    spread — the profile a planner (or an engineer) reads before picking
    plain vs salted vs AQE-skew join (`join_salted_skew` is the
    treatment; this is the diagnosis).  Plan: one map-side-combined
    count per key, a 1-row global total broadcast back (the
    decorrelated scalar-aggregate idiom), and TakeOrderedAndProject for
    the top slice — no global sort, no second pass over the fact table.
    All ratios are integer floors (micro-shares and x1000 multipliers),
    so both engines agree bit-for-bit at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    totals = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("total_rows"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "cnt",
            F.expr("(cnt * 1000000) DIV total_rows").alias("share_micro"),
            F.expr("(cnt * n_keys * 1000) DIV total_rows").alias(
                "skew_x1000"
            ),
            "n_keys",
            "total_rows",
        )
        .orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(SKEW_TOP)
    )


# ---------------------------------------------------------------------------
# chi-square independence: is `lang` independent of `source`?
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
  FROM documents GROUP BY 1, 2
),
r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
c AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
SELECT cells.lang, cells.source, o AS observed,
       CAST((r.r * c.c * 1000000) // n.n AS BIGINT) AS expected_micro,
       CAST(floor(CAST(n.n * o - r.r * c.c AS DOUBLE)
                  * CAST(n.n * o - r.r * c.c AS DOUBLE)
                  * 1000000.0 / CAST(n.n * r.r * c.c AS DOUBLE)) AS BIGINT)
         AS chi2_micro
FROM cells JOIN r USING (lang) JOIN c USING (source), n
ORDER BY chi2_micro DESC, lang ASC, source ASC
"""


@register("profile_chi_square", oracle=_CHI2_ORACLE)
def profile_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between `lang` and `source`: the
    full contingency table with each cell's observed count, expected
    count (micro-scaled), and chi-square contribution — the drift check
    a corpus pipeline runs to catch a source whose language mix shifted
    (sum the column for the statistic; big per-cell contributions POINT
    at the shifted cells, which the scalar alone cannot).

    Determinism: all marginals are exact BIGINTs; the one non-integer
    step, (N*O - R*C)^2 / (N*R*C), runs in IEEE doubles with the
    operands built exactly in int64 first (N*O <= ~2^32 here; N*R*C <=
    N^3 must stay < 2^63 — past ~2M docs, build the operands in
    DECIMAL(38) instead) and a floor at micro precision — correctly-
    rounded IEEE ops on identical inputs are engine-identical, and
    floor has no rounding-mode to disagree on.  Plan: one cell groupBy
    with map-side partials (the fact table is touched once), marginals
    re-aggregated from the TINY cell table, broadcast back."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("o")
        # 4 consumers (r, c, n, final select): pin the tiny cell table so
        # the documents scan runs once, not four times
    ).localCheckpoint(eager=True)
    r = cells.groupBy("lang").agg(F.sum("o").cast("long").alias("r"))
    c = cells.groupBy("source").agg(F.sum("o").cast("long").alias("c"))
    n = cells.agg(F.sum("o").cast("long").alias("n"))
    d = (F.col("n") * F.col("o") - F.col("r") * F.col("c")).cast("double")
    return (
        cells.join(F.broadcast(r), "lang")
        .join(F.broadcast(c), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "source",
            F.col("o").alias("observed"),
            F.expr("(r * c * 1000000) DIV n").cast("long")
            .alias("expected_micro"),
            F.floor(
                d * d * F.lit(1000000.0)
                / (F.col("n") * F.col("r") * F.col("c")).cast("double")
            )
            .cast("long")
            .alias("chi2_micro"),
        )
        .orderBy(
            F.col("chi2_micro").desc(), F.col("lang").asc(), F.col("source").asc()
        )
    )


# ---------------------------------------------------------------------------
# exact equi-depth bins via the distributed prefix rank
# ---------------------------------------------------------------------------

EQUIDEPTH_BINS = 10

_EQUIDEPTH_ORACLE = f"""
WITH ranked AS (
  SELECT n_chars,
         row_number() OVER (ORDER BY n_chars ASC, doc_id ASC) AS rn
  FROM documents
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
bins AS (SELECT unnest(range(1, {EQUIDEPTH_BINS} + 1)) AS bin)
SELECT b.bin, CAST((b.bin * n.n) // {EQUIDEPTH_BINS} AS BIGINT) AS target_rank,
       CAST(r.n_chars AS BIGINT) AS boundary_chars
FROM bins b, n
JOIN ranked r ON r.rn = (b.bin * n.n) // {EQUIDEPTH_BINS}
ORDER BY b.bin ASC
"""


@register("profile_equidepth_bins", oracle=_EQUIDEPTH_ORACLE)
def profile_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT equi-depth bin boundaries of document length: the n_chars
    value at every rank floor(i*n/10) — the 10-bin histogram with EQUAL
    COUNTS per bin, the layout planner's split points (file sizing,
    range-partition boundaries, stratified length sampling).  The
    sketch family answers this approximately (profile_length_quantiles
    runs a fixed-bin histogram sketch); this is the exact complement,
    and the global rank runs through operators/rank.py's distributed
    prefix rank — P parallel sorts + broadcast offsets, never a
    single-partition window — then a 10-row broadcast joins back on the
    target ranks.  (n_chars, doc_id) is a total order, so every
    boundary is deterministic."""
    from javascript_vector_database_spark.operators.rank import (
        global_row_number,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = global_row_number(
        docs, [F.col("n_chars").asc(), F.col("doc_id").asc()], out="rn"
    )
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    bins = (
        spark.range(1, EQUIDEPTH_BINS + 1)
        .select(F.col("id").cast("long").alias("bin"))
        .crossJoin(F.broadcast(n))
        .select(
            "bin",
            F.expr(f"(bin * n) DIV {EQUIDEPTH_BINS}").cast("long").alias(
                "target_rank"
            ),
        )
    )
    return (
        ranked.join(
            F.broadcast(bins), F.col("rn") == F.col("target_rank")
        )
        .select(
            "bin",
            "target_rank",
            F.col("n_chars").cast("long").alias("boundary_chars"),
        )
        .orderBy(F.col("bin").asc())
    )
