"""§2.11 scalar functions + text-analysis extension surface (language ID,
quality scoring, token counting, fingerprinting, title/content parse)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


# ---------------------------------------------------------------------------
# BM25 keyword search (Robertson/Spärck Jones; the lexical complement to
# the vector-search surface — a training-data pipeline needs both)
# ---------------------------------------------------------------------------

#: fixed query terms drawn from the synthetic corpus vocabulary
BM25_TERMS = ("vector", "join", "filter")
BM25_TOP = 15
#: constants appear as the SAME decimal literals on both engines (never
#: derived arithmetically, so the parsed doubles are identical):
#: k1 = 1.2, k1+1 = 2.2, b = 0.75, 1-b = 0.25


def _bm25_oracle() -> str:
    tf_cols = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(BM25_TERMS))
    )
    idf_cols = ", ".join(
        f"ln(1 + (n_docs - df{i} + 0.5) / (df{i} + 0.5)) AS idf{i}"
        for i in range(len(BM25_TERMS))
    )
    score = " + ".join(
        f"s.idf{i} * (d.tf{i} * 2.2) / "
        f"(d.tf{i} + 1.2 * (0.25 + 0.75 * (d.dl / s.avgdl)))"
        for i in range(len(BM25_TERMS))
    )
    return f"""
WITH d AS (
  SELECT doc_id, len(toks) AS dl, {tf_cols}
  FROM (
    SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
    FROM documents
  )
),
c AS (SELECT count(*) AS n_docs, {df_cols},
             CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      FROM d),
s AS (SELECT avgdl, {idf_cols} FROM c)
SELECT d.doc_id, round({score}, 6) AS bm25
FROM d, s
ORDER BY bm25 DESC, d.doc_id ASC
LIMIT {BM25_TOP}
"""


@register("text_bm25_search", oracle=_bm25_oracle())
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical top-k over the documents table — two scans, zero
    shuffle beyond the partial aggregate: pass 1 folds the corpus stats
    (N, Σdl, per-term df) map-side and collects 5 scalars; pass 2 scores
    every doc with the idf/avgdl constants INLINED as literals (tf via a
    scan-local array filter — no explode, no token shuffle) and takes the
    top-k with TakeOrderedAndProject.  At 100 TB the stats pass is one
    cheap partial-agg job (or a maintained corpus-stats table) and the
    score pass is embarrassingly parallel."""
    import math

    docs = load_table(spark, sf_dir, "documents")
    base = spread(docs).select(
        "doc_id", T.word_tokens("text").alias("toks")
    ).withColumn("dl", F.size("toks"))

    def tf(term: str):
        return F.size(F.filter(F.col("toks"), lambda x: x == F.lit(term)))

    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sumdl"),
        *[
            F.sum((tf(t) > 0).cast("long")).alias(f"df{i}")
            for i, t in enumerate(BM25_TERMS)
        ],
    ).first()
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["sumdl"]) / float(n_docs)
    idf = [
        math.log(1 + (n_docs - int(stats[f"df{i}"]) + 0.5) / (int(stats[f"df{i}"]) + 0.5))
        for i in range(len(BM25_TERMS))
    ]

    score = None
    for i, t in enumerate(BM25_TERMS):
        term_score = (
            F.lit(idf[i])
            * (tf(t) * F.lit(2.2))
            / (tf(t) + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * (F.col("dl") / F.lit(avgdl))))
        )
        score = term_score if score is None else score + term_score
    return (
        base.select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(BM25_TOP)
    )


# ---------------------------------------------------------------------------
# batch BM25 (one corpus scan scores every query — the lexical analogue
# of batch kNN)
# ---------------------------------------------------------------------------

BM25_BATCH = (
    (1, ("vector", "join")),
    (2, ("filter", "table", "scan")),
    (3, ("query", "window")),
)

#: union of every batch query's terms, in stable order (df/tf computed once)
_BATCH_TERMS = tuple(sorted({t for _, ts in BM25_BATCH for t in ts}))


def _bm25_batch_oracle() -> str:
    tf_cols = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(_BATCH_TERMS)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(_BATCH_TERMS))
    )
    idf_cols = ", ".join(
        f"ln(1 + (n_docs - df{i} + 0.5) / (df{i} + 0.5)) AS idf{i}"
        for i in range(len(_BATCH_TERMS))
    )

    def score(terms: tuple[str, ...]) -> str:
        return " + ".join(
            f"s.idf{_BATCH_TERMS.index(t)} * (d.tf{_BATCH_TERMS.index(t)} * 2.2) / "
            f"(d.tf{_BATCH_TERMS.index(t)} + 1.2 * (0.25 + 0.75 * (d.dl / s.avgdl)))"
            for t in terms
        )

    arms = "\nUNION ALL\n".join(
        f"SELECT {qid} AS query_id, d.doc_id, round({score(ts)}, 6) AS bm25 "
        f"FROM d, s"
        for qid, ts in BM25_BATCH
    )
    return f"""
WITH d AS (
  SELECT doc_id, len(toks) AS dl, {tf_cols}
  FROM (
    SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
    FROM documents
  )
),
c AS (SELECT count(*) AS n_docs, {df_cols},
             CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      FROM d),
s AS (SELECT avgdl, {idf_cols} FROM c),
u AS ({arms})
SELECT query_id, doc_id, bm25 FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY bm25 DESC, doc_id ASC) AS rn
  FROM u
) WHERE rn <= {BM25_TOP}
"""


@register("text_bm25_batch_search", oracle=_bm25_batch_oracle())
def text_bm25_batch_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch BM25: every query's top-k from ONE corpus scan.  The stats
    pass folds df for the UNION of all query terms (one partial-agg job,
    5+|terms| scalars collected); the score pass computes each query's
    score as inlined-literal expressions over the same scan and explodes
    a (query_id, bm25) struct per query — |Q| small rows per doc, then a
    per-query row_number top-k.  The corpus is read once no matter how
    many queries ride the batch (same amortization shape as batch kNN)."""
    import math

    docs = load_table(spark, sf_dir, "documents")
    base = spread(docs).select(
        "doc_id", T.word_tokens("text").alias("toks")
    ).withColumn("dl", F.size("toks"))

    def tf(term: str):
        return F.size(F.filter(F.col("toks"), lambda x: x == F.lit(term)))

    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sumdl"),
        *[
            F.sum((tf(t) > 0).cast("long")).alias(f"df{i}")
            for i, t in enumerate(_BATCH_TERMS)
        ],
    ).first()
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["sumdl"]) / float(n_docs)
    idf = {
        t: math.log(
            1
            + (n_docs - int(stats[f"df{i}"]) + 0.5)
            / (int(stats[f"df{i}"]) + 0.5)
        )
        for i, t in enumerate(_BATCH_TERMS)
    }

    def qscore(terms: tuple[str, ...]):
        score = None
        for t in terms:
            term_score = (
                F.lit(idf[t])
                * (tf(t) * F.lit(2.2))
                / (
                    tf(t)
                    + F.lit(1.2)
                    * (F.lit(0.25) + F.lit(0.75) * (F.col("dl") / F.lit(avgdl)))
                )
            )
            score = term_score if score is None else score + term_score
        return score

    per_query = F.array(
        *[
            F.struct(
                F.lit(qid).alias("query_id"),
                F.round(qscore(ts), 6).alias("bm25"),
            )
            for qid, ts in BM25_BATCH
        ]
    )
    exploded = base.select(
        "doc_id", F.explode(per_query).alias("q")
    ).select("doc_id", "q.query_id", "q.bm25")
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    return (
        exploded.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= BM25_TOP)
        .select("query_id", "doc_id", "bm25")
    )


def _winnow_oracle() -> str:
    from javascript_vector_database_spark.operators.dedup import (
        sql_winnow_fingerprints,
    )

    return sql_winnow_fingerprints("documents")


@register("text_winnow_fingerprints", oracle=_winnow_oracle())
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (Schleimer et al. 2003, the MOSS algorithm): the real
    rolling-hash fingerprint behind plagiarism/partial-overlap detection
    — any shared run of >= w+k-1 tokens between two docs shares a
    fingerprint, at ~2/(w+1) of the gram storage.  Replaces the
    whole-document bag hash (text_fingerprint) for overlap mining; pure
    integer pipeline, so the oracle match needs no float discipline."""
    from javascript_vector_database_spark.operators.dedup import (
        winnow_fingerprints,
    )

    return winnow_fingerprints(load_table(spark, sf_dir, "documents"))


def _winnow_pairs_oracle() -> str:
    from javascript_vector_database_spark.operators.dedup import (
        sql_winnow_overlap_pairs,
    )

    return sql_winnow_overlap_pairs("documents")


@register("text_winnow_overlap_pairs", oracle=_winnow_pairs_oracle())
def text_winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs sharing >= 2 winnowing fingerprints — the MOSS partial-copy
    report: catches a lifted paragraph that whole-doc similarity dilutes.
    Same hot-bucket guard as the LSH band join (per-fp min-id cap)."""
    from javascript_vector_database_spark.operators.dedup import (
        winnow_overlap_pairs,
    )

    return winnow_overlap_pairs(load_table(spark, sf_dir, "documents"))


def _keywords_oracle() -> str:
    from javascript_vector_database_spark.operators.curation import (
        sql_keyword_terms,
    )

    return sql_keyword_terms("documents")


@register("text_keywords", oracle=_keywords_oracle())
def text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-5 keywords by tf/df — the tf-idf ordering without the
    transcendental (ln-based idf can rank near-equal scores differently
    across libms; tf/df is one IEEE-exact division, so even the RANKING
    is bit-identical cross-engine).  Corpus-adaptive stopword cut at
    df > 50% of docs."""
    from javascript_vector_database_spark.operators.curation import (
        keyword_terms,
    )

    return keyword_terms(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# BPE pair counts (the single, fully-SQL-expressible round of the
# distributed BPE trainer — operators/bpe.py; the k-round trainer is
# iterative/driver-looped and pinned by tests instead)
# ---------------------------------------------------------------------------

BPE_TOP_PAIRS = 20


def _bpe_pairs_oracle() -> str:
    from javascript_vector_database_spark.operators.bpe import (
        sql_bpe_pair_counts,
    )

    # the builder already guards 1-based ranges; empty words are filtered
    # on both engines (Spark's sequence(1,0) DESCENDS instead of being
    # empty — the filter keeps the two constructions aligned)
    return sql_bpe_pair_counts(
        "documents", T.sql_word_tokens("text"), BPE_TOP_PAIRS
    ).replace("GROUP BY word", "GROUP BY word HAVING length(word) > 0")


@register("text_bpe_pair_counts", oracle=_bpe_pairs_oracle())
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-1 BPE statistics: adjacent character-pair counts over the
    VOCAB table (word, count) — the corpus is read once for the word
    aggregate, then every BPE round is bounded by vocabulary size
    (heaps' law), which is the whole scale story of BPE training."""
    from javascript_vector_database_spark.operators import bpe

    docs = spread(load_table(spark, sf_dir, "documents"))
    vocab = (
        bpe.word_vocab(docs)
        .where(F.length("word") > 0)
        .withColumn("syms", bpe._initial_symbols(F.col("word")))
    )
    return (
        bpe._adjacent_pairs(vocab)
        .orderBy(F.col("pair_cnt").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(BPE_TOP_PAIRS)
    )


# ---------------------------------------------------------------------------
# positional phrase search
# ---------------------------------------------------------------------------

#: the fixed probe phrase (adjacent-token exact match)
PHRASE = ("hash", "join")

_PHRASE_ORACLE = f"""
WITH t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
           FROM documents)
SELECT doc_id,
       CAST(len(list_filter(range(1, len(toks)),
                i -> toks[i] = '{PHRASE[0]}' AND toks[i + 1] = '{PHRASE[1]}'))
            AS BIGINT) AS n_hits
FROM t
WHERE len(list_filter(range(1, len(toks)),
          i -> toks[i] = '{PHRASE[0]}' AND toks[i + 1] = '{PHRASE[1]}')) > 0
"""


@register("text_phrase_search", oracle=_PHRASE_ORACLE)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact adjacent-phrase occurrence counts — the positional-index
    query BM25's bag-of-words scoring cannot answer.  Token positions
    explode row-locally (codegen sequence+getItem, no interpreted HOF on
    the corpus side); the per-doc count is one map-side-combined groupBy.
    At scale the same shape runs against a PERSISTED (token, doc, pos)
    posting table instead of re-tokenizing."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    base = docs.select("doc_id", toks.alias("__t")).where(F.size("__t") >= 2)
    ex = base.select(
        "doc_id",
        "__t",
        F.explode(F.sequence(F.lit(0), F.size("__t") - 2)).alias("__i"),
    )
    hit = (F.col("__t")[F.col("__i")] == PHRASE[0]) & (
        F.col("__t")[F.col("__i") + 1] == PHRASE[1]
    )
    return (
        ex.where(hit)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )


@register("text_phrase_postings_join", oracle=_PHRASE_ORACLE)
def text_phrase_postings_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME phrase query answered the way a persisted positional
    inverted index answers it: a (doc, pos, token) posting list,
    restricted to the two phrase terms, self-joined on
    (doc, pos+1 == pos) — each term's postings are a tiny slice of the
    corpus, and the equi-join never touches non-matching tokens.  At
    100 TB the postings table is WRITTEN ONCE (partitioned/bucketed by
    token) and every phrase query is two posting fetches + this join;
    same oracle as text_phrase_search (identical result, different
    plan)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    post = docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "tok")
    )
    a = post.where(F.col("tok") == PHRASE[0]).select(
        "doc_id", (F.col("pos") + 1).alias("next_pos")
    )
    b = post.where(F.col("tok") == PHRASE[1]).select(
        "doc_id", F.col("pos").alias("next_pos")
    )
    return (
        a.join(b, ["doc_id", "next_pos"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )


_LANG_CONFUSION_ORACLE = f"""
SELECT lang AS actual, {T.sql_lang_id('text')} AS predicted,
       CAST(count(*) AS BIGINT) AS n
FROM documents GROUP BY 1, 2
"""


@register("text_lang_confusion", oracle=_LANG_CONFUSION_ORACLE)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the n-gram language-ID heuristic against the
    labeled ``lang`` column — the evaluation every classifier-gated
    curation pass needs before it gates anything.  One scan, one
    (langs^2)-key groupBy."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(
            F.col("lang").alias("actual"),
            T.lang_id("text").alias("predicted"),
        )
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


#: minimum bigram count for the collocation report
_COLLOC_MIN = 50
_COLLOC_TOP = 20

_COLLOC_ORACLE = f"""
WITH t AS (SELECT {T.sql_word_tokens('text')} AS toks FROM documents),
uni AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM uni),
bi AS (
  SELECT toks[i] AS a, toks[i + 1] AS b, CAST(count(*) AS BIGINT) AS nab
  FROM t, LATERAL unnest(range(1, len(toks))) AS u(i)
  GROUP BY 1, 2 HAVING count(*) >= {_COLLOC_MIN}
),
tb AS (SELECT CAST(sum(nab) AS BIGINT) AS nb FROM
       (SELECT toks[i] AS a, toks[i + 1] AS b, count(*) AS nab
        FROM t, LATERAL unnest(range(1, len(toks))) AS u(i) GROUP BY 1, 2))
SELECT bi.a, bi.b, bi.nab,
       -- lift = P(ab) / (P(a) P(b)).  nab is cast to DOUBLE BEFORE the
       -- nt*nt product: the all-integer form nab*nt*nt is nt^3-bounded
       -- and overflows BIGINT past nt ~ 2M tokens (Spark wraps silently,
       -- DuckDB raises — a silent divergence at corpus scale).  One
       -- early rounding step buys overflow-free math at any nt; the op
       -- order (((nab→dbl)*nt)*nt) is identical on both engines.
       floor(CAST(bi.nab AS DOUBLE) * tot.nt * tot.nt * 1000000
             / (CAST(tb.nb AS DOUBLE) * ua.n * ub.n)) / 1000000.0 AS lift
FROM bi, tot, tb
JOIN uni ua ON ua.tok = bi.a
JOIN uni ub ON ub.tok = bi.b
ORDER BY bi.nab DESC, bi.a ASC, bi.b ASC
LIMIT {_COLLOC_TOP}
"""


@register("text_collocations_lift", oracle=_COLLOC_ORACLE)
def text_collocations_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bigram collocations with LIFT — P(ab)/(P(a)P(b)) as an exact
    integer cross-product ratio (one float division, floored at micro;
    PMI's log would add a cross-libm transcendental for zero analytical
    gain at ranking time).  Bigram explode is row-local; unigram and
    bigram tables are the standard two aggregates."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    base = docs.select(toks.alias("__t"))
    uni = (
        base.select(F.explode("__t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    ex = base.where(F.size("__t") >= 2).select(
        "__t", F.explode(F.sequence(F.lit(0), F.size("__t") - 2)).alias("__i")
    )
    bi_all = ex.select(
        F.col("__t")[F.col("__i")].alias("a"),
        F.col("__t")[F.col("__i") + 1].alias("b"),
    ).groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("nab"))
    bi = bi_all.where(F.col("nab") >= _COLLOC_MIN)
    # the two corpus totals are single bounded scalars — collected once
    # and inlined as literals (the ann_scale idiom), NOT joined: a
    # keyless 1-row broadcast join compiles to the banned
    # BroadcastNestedLoopJoin
    nt = int(uni.agg(F.sum("n")).first()[0])
    nb = int(bi_all.agg(F.sum("nab")).first()[0])
    ua = uni.select(F.col("tok").alias("a"), F.col("n").alias("na"))
    ub = uni.select(F.col("tok").alias("b"), F.col("n").alias("nb_tok"))
    j = bi.join(F.broadcast(ua), "a").join(F.broadcast(ub), "b")
    # nab→double FIRST (not after the integer nt*nt product): keeps the
    # numerator overflow-free at any corpus size — see the oracle comment
    lift = (
        F.floor(
            F.col("nab").cast("double")
            * F.lit(nt)
            * F.lit(nt)
            * 1000000
            / (F.lit(float(nb)) * F.col("na") * F.col("nb_tok"))
        )
        / F.lit(1000000.0)
    )
    return (
        j.select("a", "b", "nab", lift.alias("lift"))
        .orderBy(F.col("nab").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(_COLLOC_TOP)
    )


_ZIPF_TOP = 30

_ZIPF_ORACLE = f"""
WITH c AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest({T.sql_word_tokens('text')}) AS tok FROM documents)
  GROUP BY 1
)
SELECT tok, freq,
       CAST(row_number() OVER (ORDER BY freq DESC, tok ASC) AS BIGINT) AS rnk,
       CAST(freq * row_number() OVER (ORDER BY freq DESC, tok ASC) AS BIGINT)
         AS zipf_product
FROM c
ORDER BY rnk ASC
LIMIT {_ZIPF_TOP}
"""


@register("text_zipf_profile", oracle=_ZIPF_ORACLE)
def text_zipf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency profile: the top-30 tokens with rank and the
    rank*frequency product (constant under Zipf's law — a flat column
    of zipf_product is natural text, a cliff is synthetic/templated;
    this corpus is synthetic and the profile SHOWS it).  Exact integers
    throughout — no log-log fit needed at ranking time."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    from javascript_vector_database_spark.functions.text import word_tokens

    c = (
        docs.select(F.explode(word_tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    # TakeOrdered first: only the 30 survivors see the rank window, so
    # no global single-partition pass over the (possibly huge) vocab
    top = c.orderBy(F.col("freq").desc(), F.col("tok").asc()).limit(_ZIPF_TOP)
    w = Window.orderBy(F.col("freq").desc(), F.col("tok").asc())
    return (
        top.select(
            "tok",
            "freq",
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .withColumn("zipf_product", (F.col("freq") * F.col("rnk")).cast("long"))
    )


# ---------------------------------------------------------------------------
# live-maintained BM25 index (the text twin of stream_ann_index_live)
# ---------------------------------------------------------------------------


def bm25_from_tf_index(idx) -> DataFrame:
    """Score BM25 entirely off a maintained (doc_id, dl, tf0..tfk)
    index table: corpus stats fold from the index in one bounded
    aggregate, idf/avgdl inline as literals, top-15 by the identical
    expression shape as the corpus-scanning row — the serving path of
    stream_bm25_index_live, shared with the live-hybrid capstone."""
    import math

    idx = idx.select(
        "doc_id", "dl", *[f"tf{i}" for i in range(len(BM25_TERMS))]
    )
    stats = idx.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sumdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    ).first()
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["sumdl"]) / float(n_docs)
    idf = [
        math.log(
            1
            + (n_docs - int(stats[f"df{i}"]) + 0.5)
            / (int(stats[f"df{i}"]) + 0.5)
        )
        for i in range(len(BM25_TERMS))
    ]
    score = None
    for i in range(len(BM25_TERMS)):
        term_score = (
            F.lit(idf[i])
            * (F.col(f"tf{i}") * F.lit(2.2))
            / (
                F.col(f"tf{i}")
                + F.lit(1.2)
                * (F.lit(0.25) + F.lit(0.75) * (F.col("dl") / F.lit(avgdl)))
            )
        )
        score = term_score if score is None else score + term_score
    return (
        idx.select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(BM25_TOP)
    )


@register("stream_bm25_index_live", oracle=_bm25_oracle())
def stream_bm25_index_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE-MAINTAINED lexical index (12th streaming==batch row): the
    per-doc term-frequency index behind BM25 — (doc_id, dl, tf per
    query term), the postings row a search engine stores at write time
    — is MERGE-maintained under a two-half document change feed by the
    same checkpointed Structured Streaming pipeline as the BQ ANN index
    (stop/restart between halves + a re-delivered slice, absorbed by
    the keyed MERGE).  Scoring then runs ENTIRELY off the maintained
    table: corpus stats (N, sum dl, per-term df) fold from it in one
    bounded aggregate and the idf/avgdl constants inline as literals —
    raw text is tokenized exactly once, at ingest.  The top-15 must
    hash-match the SAME DuckDB oracle as the batch `text_bm25_search`,
    which rescans the corpus — certifying that incremental index
    maintenance loses nothing.  At 100 TB this is how lexical search
    actually ships: tokenize-on-ingest, maintained stats table,
    scoring scans the compact index, never the text."""
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
    tmp = tempfile.mkdtemp(prefix="stream_bm25_")
    src = os.path.join(tmp, "src")
    cp = os.path.join(tmp, "cp")
    dest = ParquetTable(spark, os.path.join(tmp, "index"), "doc_id")
    feed_rest = _stream_feed(spark, docs, src, "doc_id")
    schema = "doc_id long, text string"

    def tf(term: str):
        return F.size(F.filter(F.col("toks"), lambda x: x == F.lit(term)))

    def handler(batch: DataFrame, batch_id: int) -> None:
        toks = batch.select(
            "doc_id", T.word_tokens("text").alias("toks")
        )
        dest.bulk_upsert(
            toks.select(
                "doc_id",
                F.size("toks").cast("long").alias("dl"),
                *[
                    tf(t).cast("long").alias(f"tf{i}")
                    for i, t in enumerate(BM25_TERMS)
                ],
            ),
            lwt=float(batch_id),
        )

    try:
        q = streaming_pipeline(spark, src, schema, handler, cp)
        q.awaitTermination()
        feed_rest()
        # at-least-once: re-deliver already-indexed docs as fresh files
        docs.where(
            (F.coalesce(F.col("doc_id"), F.lit(0)) % 2 == 0)
            & (F.col("doc_id") % 7 == 0)
        ).write.mode("append").parquet(src)
        q2 = streaming_pipeline(spark, src, schema, handler, cp)
        q2.awaitTermination()
        out = bm25_from_tf_index(dest.docs())
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out
