"""Distributed BPE (byte-pair-encoding) merge training.

No reference analog (SURVEY §7.7 LM-pipeline extension, the trainer
behind the `text_bpe_token_count` tokenizer surface).  Classic Sennrich
et al. 2016 word-level BPE with the standard scale trick: training never
touches the corpus after ONE aggregation — it iterates over the VOCAB
table (distinct word, count), which is orders of magnitude smaller than
the corpus (heaps' law), so the per-round work is bounded by vocabulary
size regardless of corpus size.

Round structure (all DataFrame ops):

* pair counts: explode each vocab word's current symbol sequence into
  adjacent pairs, sum word counts per pair — one groupBy whose key domain
  is the live pair vocabulary;
* argmax: `orderBy(cnt desc, pair asc).limit(1)` — TakeOrdered, one row
  to the driver per round (bounded by construction);
* re-tokenize: a row-local left-fold over each word's symbols that
  greedily merges leftmost non-overlapping (a, b) occurrences.  The fold
  is an interpreted HOF — acceptable HERE because it runs over the vocab
  table, not the corpus (the one place this repo allows a HOF on the hot
  path is the one place the hot path is provably small).

Determinism: counts are exact integers; ties on count break to the
lexicographically smallest pair, so the merge table is unique.  Pinned
against a pure-Python reference implementation in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: end-of-word marker (GPT-2 style </w>; keeps word-final merges distinct)
EOW = "</w>"
DEFAULT_MERGES = 8


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): the corpus's word-count table — the only pass that
    ever reads the corpus."""
    from javascript_vector_database_spark.functions.text import word_tokens

    return (
        docs.select(F.explode(word_tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _initial_symbols(word: F.Column) -> F.Column:
    """Character symbols + EOW marker, via explicit substr (portable)."""
    chars = F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))")
    return F.concat(chars, F.array(F.lit(EOW)))


def _adjacent_pairs(vocab_syms: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent symbol-pair counts weighted by word count."""
    ex = vocab_syms.select(
        "cnt",
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1),"
                " i -> struct(syms[i - 1] AS a, syms[i] AS b))"
            )
        ).alias("p"),
    )
    return ex.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("cnt").alias("pair_cnt")
    )


def _apply_merge(vocab_syms: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy leftmost non-overlapping merge of adjacent (a, b) into a||b
    via a row-local fold (runs on the vocab table only)."""
    la, lb = F.lit(a), F.lit(b)
    merged = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (s == lb)
            # guard: the trailing `a` must not itself be the product of a
            # merge THIS round (leftmost-first, non-overlapping) — track
            # by comparing against a sentinel is unnecessary: a == a||b
            # only if b is empty, which never happens
            ,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(la, lb))),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return vocab_syms.withColumn("syms", merged)


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = DEFAULT_MERGES,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges: [(left, right, pair_count), ...] in
    merge order.  Driver traffic is one (a, b, cnt) row per round."""
    vocab = word_vocab(docs, text_col).withColumn(
        "syms", _initial_symbols(F.col("word"))
    )
    # the vocab table is re-derived per round through a growing chain of
    # folds; localCheckpoint keeps the lineage flat (8 rounds of
    # interpreted HOFs over a re-read corpus would multiply the cost)
    vocab = vocab.localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _adjacent_pairs(vocab)
            .orderBy(F.col("pair_cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["pair_cnt"])
        merges.append((a, b, cnt))
        vocab = _apply_merge(vocab, a, b).localCheckpoint()
    return merges


def bpe_train_local(
    texts: list[str], n_merges: int = DEFAULT_MERGES
) -> list[tuple[str, str, int]]:
    """Pure-Python reference model of the identical algorithm (used by
    tests to pin the distributed trainer)."""
    from collections import Counter

    words = Counter()
    for t in texts:
        t = t.strip().lower()
        if t:
            import re

            words.update(re.split(r"\s+", t))
    vocab = {w: list(w) + [EOW] for w in words}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, cnt in words.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, cnt))
        for w in vocab:
            syms = vocab[w]
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges


def sql_bpe_pair_counts(table: str, text_sql_tokens: str, top_n: int) -> str:
    """DuckDB oracle for the SINGLE-round pair-count query (the fully
    SQL-expressible building block of the trainer)."""
    return f"""
WITH words AS (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({text_sql_tokens}) AS word FROM {table})
  GROUP BY word
),
syms AS (
  SELECT cnt,
         list_append(list_transform(range(1, length(word) + 1),
                                    i -> substr(word, i, 1)), '{EOW}') AS s
  FROM words
),
pairs AS (
  SELECT s[i] AS a, s[i + 1] AS b, cnt
  FROM syms, LATERAL unnest(range(1, len(s))) AS t(i)
)
SELECT a, b, CAST(sum(cnt) AS BIGINT) AS pair_cnt
FROM pairs GROUP BY a, b
ORDER BY pair_cnt DESC, a ASC, b ASC
LIMIT {top_n}
"""
