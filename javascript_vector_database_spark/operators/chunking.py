"""Sequence chunking / dataset splitting for the training-data pipeline.

No reference analog (the reference embeds whole documents,
src/database.ts:181-205); these are the SURVEY §7.7 extension ops an LLM
training pipeline runs right after curation:

* ``chunk_documents`` — split each document into fixed-token-length
  training chunks with a stride (overlap = chunk_tokens - stride).  Pure
  Column expressions: tokenize once, ``posexplode`` the chunk starts,
  slice the token array per chunk — row-local until the explode, zero
  Python.  At 100 TB the explode fans out ~n_tokens/stride rows per doc
  but stays narrow (no shuffle); downstream writes partition by a hash of
  (doc_id, chunk_idx).
* ``split_assign`` — deterministic train/val/test assignment from the
  md5 of the primary key: stable across runs, engines, and partitioning
  (never ``rand()``, which is neither reproducible nor oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_CHUNK_TOKENS = 64
DEFAULT_STRIDE = 48  # 16-token overlap between consecutive chunks


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = DEFAULT_CHUNK_TOKENS,
    stride: int = DEFAULT_STRIDE,
) -> DataFrame:
    """One row per training chunk: (id, chunk_idx, chunk_text, n_tokens).
    Chunk i covers whitespace tokens [i*stride, i*stride + chunk_tokens);
    the final chunk may be ragged."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col), toks.alias("__toks"))
    starts = F.sequence(
        F.lit(0), F.size("__toks") - 1, F.lit(stride)
    )
    ex = base.select(
        id_col,
        "__toks",
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    return ex.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(
            F.slice("__toks", F.col("__start") + 1, chunk_tokens), " "
        ).alias("chunk_text"),
        F.least(
            F.lit(chunk_tokens), F.size("__toks") - F.col("__start")
        ).cast("long").alias("n_tokens"),
    )


def sql_chunk_documents(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = DEFAULT_CHUNK_TOKENS,
    stride: int = DEFAULT_STRIDE,
) -> str:
    """DuckDB oracle: same chunks via range() starts and 1-based inclusive
    list slicing."""
    return f"""
WITH t AS (
  SELECT {id_col}, regexp_split_to_array(trim({text_col}), '\\s+') AS toks
  FROM {table}
),
s AS (
  SELECT {id_col}, toks, unnest(range(0, len(toks), {stride})) AS start
  FROM t
)
SELECT {id_col},
       CAST(start / {stride} AS BIGINT) AS chunk_idx,
       array_to_string(toks[start + 1 : start + {chunk_tokens}], ' ')
         AS chunk_text,
       CAST(least({chunk_tokens}, len(toks) - start) AS BIGINT) AS n_tokens
FROM s
"""


#: split fractions (cumulative): train < 0.8 <= val < 0.9 <= test
SPLIT_BOUNDS = (("train", 0.8), ("val", 0.9))


def split_frac(pk: Column | str) -> Column:
    """Uniform [0,1) fraction from the first 8 md5 hex chars of the key —
    the deterministic, engine-portable stand-in for rand(seed)."""
    pk = F.col(pk) if isinstance(pk, str) else pk
    return F.conv(F.substring(F.md5(pk.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) / F.lit(float(2**32))


def split_assign(
    df: DataFrame, id_col: str = "doc_id", out_col: str = "split"
) -> DataFrame:
    """Add the train/val/test label.  Scan-local; at 100 TB the output is
    written partitioned by the label so each split reads its own files."""
    frac = split_frac(id_col)
    expr = None
    for name, bound in SPLIT_BOUNDS:
        cond = frac < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    return df.withColumn(out_col, expr.otherwise(F.lit("test")))


def sql_split_frac(pk: str) -> str:
    return (
        f"(('0x' || substr(md5(CAST({pk} AS VARCHAR)), 1, 8))::BIGINT"
        f" / 4294967296.0)"
    )


def sql_split_assign(pk: str) -> str:
    frac = sql_split_frac(pk)
    expr = "'test'"
    for name, bound in reversed(SPLIT_BOUNDS):
        expr = f"CASE WHEN {frac} < {bound} THEN '{name}' ELSE {expr} END"
    return expr


def stratified_split_assign(
    df: DataFrame,
    group_col: str = "source",
    bounds: list[tuple[str, float]] | None = None,
    id_col: str = "doc_id",
    out_col: str = "split",
) -> DataFrame:
    """Per-group train/val/test assignment: the SAME deterministic
    md5(pk) fraction as :func:`split_assign`, but the label thresholds
    come from the row's md5-rank INSIDE its group — so every
    source/language lands its target ratios EXACTLY per group rather
    than only in expectation globally (small groups are where the global
    draw visibly misses).  Costs ONE shuffle on the group column (the
    window rank is the price of exact per-group quantiles; the global
    variant stays scan-local); at 100 TB write ``partitionBy(out_col)``
    like the global variant.

    ``bounds`` maps label -> cumulative upper bound, shared by every
    group by default (``SPLIT_BOUNDS``); per-group bound maps are the
    caller's composition (a when-chain over groups), kept out of this
    signature until a use case needs it."""
    bounds = SPLIT_BOUNDS if bounds is None else bounds
    frac = split_frac(id_col)
    # rank the row INSIDE its group: portable md5 order makes the
    # per-group quantile exact — row_number()/count() over the group
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    wcnt = Window.partitionBy(group_col)
    q = (F.row_number().over(w) - 1) / F.count(F.lit(1)).over(wcnt)
    expr = None
    for name, bound in bounds:
        cond = q < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    return df.withColumn(out_col, expr.otherwise(F.lit("test")))


def sql_stratified_split_assign(
    group_col: str = "source", pk: str = "doc_id", table_alias: str = ""
) -> str:
    """DuckDB mirror of :func:`stratified_split_assign`'s label column
    (window rank over md5 order inside the group)."""
    q = (
        f"(row_number() OVER (PARTITION BY {group_col} "
        f"ORDER BY md5(CAST({pk} AS VARCHAR)) ASC, {pk} ASC) - 1) * 1.0 "
        f"/ count(*) OVER (PARTITION BY {group_col})"
    )
    expr = "'test'"
    for name, bound in reversed(SPLIT_BOUNDS):
        expr = f"CASE WHEN {q} < {bound} THEN '{name}' ELSE {expr} END"
    return expr


def leakage_safe_split_assign(
    df: DataFrame,
    dup_pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    out_col: str = "split",
) -> DataFrame:
    """Dedup-AWARE train/val/test split: near-duplicate documents must
    land in the SAME split, or the test set silently contains
    paraphrases of training rows and every eval number is contaminated
    (the leakage failure mode the decontamination pass checks against
    EXTERNAL eval sets — this closes it for the corpus's own splits).

    Shape: connected components over the candidate near-dup pairs
    (dedup.duplicate_clusters — the same min-label machinery the dedup
    family ships) give every clustered doc its component's min-id root;
    singletons root at themselves.  The split fraction is then
    md5(ROOT), not md5(doc) — one broadcast-sized (doc -> root) join
    (components are a small fraction of any real corpus; at 100 TB the
    cluster table is the already-materialized dedup output), after
    which the assignment is the ordinary scan-local when-cascade.  By
    construction no pair in ``dup_pairs`` can straddle splits, because
    both ends share a root and the label is a pure function of it."""
    from javascript_vector_database_spark.operators.dedup import (
        duplicate_clusters,
    )

    roots = duplicate_clusters(dup_pairs, id_a=id_a, id_b=id_b).select(
        F.col("doc_id").alias(id_col), F.col("cluster_id").alias("__root")
    )
    rooted = df.join(F.broadcast(roots), id_col, "left").withColumn(
        "__root", F.coalesce(F.col("__root"), F.col(id_col))
    )
    # the assignment IS split_assign, keyed on the root — one rule, two
    # surfaces (the pinned singleton-equality property depends on it)
    return split_assign(rooted, id_col="__root", out_col=out_col).drop(
        "__root"
    )
