"""Multimodal extension queries: binary payload columns + typed metadata,
feature extraction and frame sampling as Arrow-batched mapInPandas.

The corpus text is printable ASCII (pytest-guarded), so the utf-8 payload
bytes equal the character code points and DuckDB can reproduce every
byte-level statistic with ascii()/substr over the text column."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from javascript_vector_database_spark.operators import multimodal
from javascript_vector_database_spark.registry import register
from javascript_vector_database_spark.tables import load_table, spread

_CODES = (
    "list_transform(range(1, length(text) + 1), i -> ascii(substr(text, i, 1)))"
)

# hist rides as a comma-joined string: the driver's canonicalizer hashes
# rows through a pandas sort, which cannot hash list-typed cells
_BYTE_STATS_ORACLE = f"""
WITH codes AS (SELECT doc_id AS media_id, {_CODES} AS cs FROM documents)
SELECT media_id,
       CAST(len(cs) AS BIGINT) AS n_bytes,
       CAST(list_sum(cs) % {multimodal.CHECKSUM_MOD} AS BIGINT) AS checksum,
       array_to_string([CAST(len(list_filter(cs, c -> c // 64 = 0)) AS BIGINT),
        CAST(len(list_filter(cs, c -> c // 64 = 1)) AS BIGINT),
        CAST(len(list_filter(cs, c -> c // 64 = 2)) AS BIGINT),
        CAST(len(list_filter(cs, c -> c // 64 = 3)) AS BIGINT)], ',') AS hist
FROM codes
"""


@register("multimodal_byte_stats", oracle=_BYTE_STATS_ORACLE)
def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction: documents -> media table
    (payload binary + meta struct) -> Arrow-batched mapInPandas computing
    byte count / checksum / coarse histogram.  Row-local, zero shuffle."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    stats = multimodal.byte_stats(multimodal.with_media(docs))
    return stats.select(
        "media_id",
        "n_bytes",
        "checksum",
        F.array_join(F.col("hist").cast("array<string>"), ",").alias("hist"),
    )


_FRAME_SAMPLE_ORACLE = f"""
WITH m AS (
  SELECT doc_id AS media_id, {_CODES} AS cs,
         1 + CAST(n_chars AS INT) % 8 AS n_frames
  FROM documents
),
f AS (
  SELECT media_id, cs, n_frames,
         CAST(ceil(CAST(len(cs) AS DOUBLE) / n_frames) AS INT) AS frame_len
  FROM m
)
SELECT media_id, n_frames,
       CAST(ceil(CAST(n_frames AS DOUBLE) / 2) AS INT) AS n_sampled,
       CAST(list_sum(cs[1:frame_len]) % {multimodal.CHECKSUM_MOD} AS BIGINT)
         AS first_frame_checksum
FROM f
"""


@register("multimodal_frame_sample", oracle=_FRAME_SAMPLE_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over the synthetic frame layout:
    payload split into meta.n_frames chunks, every 2nd frame kept."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return multimodal.frame_sample(multimodal.with_media(docs, kind="video"))


# pixel grid = payload bytes tiled cyclically to width*height; mean/std
# from exact integer sums so both engines run the same double arithmetic
_DECODE_FAKE_ORACLE = f"""
WITH codes AS (
  SELECT doc_id AS media_id, {_CODES} AS cs,
         (16 + CAST(n_chars AS INT) % 32) * (16 + CAST(n_chars AS INT) % 24)
           AS n_px
  FROM documents
),
px AS (
  SELECT media_id, n_px,
         list_transform(range(0, n_px), i -> cs[(i % len(cs)) + 1]) AS px
  FROM codes
),
sums AS (
  SELECT media_id, n_px,
         CAST(list_sum(px) AS DOUBLE) AS s,
         CAST(list_sum(list_transform(px, x -> x * x)) AS DOUBLE) AS ssq
  FROM px
)
SELECT media_id,
       s / n_px AS px_mean,
       sqrt((ssq - s * s / n_px) / n_px) AS px_std
FROM sums
"""


_RESIZE_W, _RESIZE_H = 12, 8

# nearest-neighbor resample of the tiled pixel grid, pure integer math:
# src pixel for out (y,x) is (y*h_in//h_out, x*w_in//w_out)
_RESIZE_FAKE_ORACLE = f"""
WITH codes AS (
  SELECT doc_id AS media_id, {_CODES} AS cs,
         16 + CAST(n_chars AS INT) % 32 AS w_in,
         16 + CAST(n_chars AS INT) % 24 AS h_in
  FROM documents
),
o AS (
  SELECT media_id,
         list_transform(
           range(0, {_RESIZE_H} * {_RESIZE_W}),
           i -> cs[((((i // {_RESIZE_W}) * h_in // {_RESIZE_H}) * w_in
                     + ((i % {_RESIZE_W}) * w_in // {_RESIZE_W}))
                    % len(cs)) + 1]
         ) AS px
  FROM codes
)
SELECT media_id,
       CAST({_RESIZE_H} * {_RESIZE_W} AS BIGINT) AS out_n_bytes,
       CAST(list_sum(px) % {multimodal.CHECKSUM_MOD} AS BIGINT) AS out_checksum
FROM o
"""


@register("multimodal_resize_fake", oracle=_RESIZE_FAKE_ORACLE)
def multimodal_resize_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake image resize (PIL absent): nearest-neighbor
    resample of the tiled pixel grid via integer index math inside the
    same mapInPandas plumbing the real kernel would use."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return multimodal.resize_image(
        multimodal.with_media(docs), _RESIZE_W, _RESIZE_H, fake=True
    )


@register("multimodal_decode_fake", oracle=_DECODE_FAKE_ORACLE)
def multimodal_decode_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake image decode (the real codec is stubbed — PIL
    absent): payload bytes tiled to a width*height pixel grid, per-item
    mean/std computed from exact integer sums (bit-identical in DuckDB)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return multimodal.decode_image(multimodal.with_media(docs), fake=True)


_AUDIO_WINDOWS_ORACLE = f"""
WITH codes AS (SELECT doc_id AS media_id, {_CODES} AS cs FROM documents),
wins AS (
  SELECT media_id, cs,
         unnest(range(0, (len(cs) + {multimodal.AUDIO_WINDOW_BYTES} - 1)
                          // {multimodal.AUDIO_WINDOW_BYTES})) AS win_idx
  FROM codes
),
seg AS (
  SELECT media_id, win_idx,
         list_slice(cs, win_idx * {multimodal.AUDIO_WINDOW_BYTES} + 1,
                    least((win_idx + 1) * {multimodal.AUDIO_WINDOW_BYTES},
                          len(cs))) AS s
  FROM wins
)
SELECT media_id, CAST(win_idx AS BIGINT) AS win_idx,
       CAST(len(s) AS BIGINT) AS win_bytes,
       CAST(list_sum(list_transform(s, c -> c * c)) AS BIGINT) AS energy,
       CAST(list_max(s) AS BIGINT) AS peak
FROM seg
"""


@register("multimodal_audio_windows", oracle=_AUDIO_WINDOWS_ORACLE)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style windowed feature extraction: the payload stream split
    into 256-sample windows, each reduced to (count, energy, peak) —
    the VAD/segmentation front end, one feature row per window out of
    an Arrow-batched row-local kernel.  Completes the modality triple
    (image decode/resize, video frame sampling, audio windowing); the
    oracle reproduces every window from the ASCII code points."""
    media = multimodal.with_media(
        load_table(spark, sf_dir, "documents"), kind="audio"
    )
    return multimodal.audio_windows(media)


# ---------------------------------------------------------------------------
# binary near-dup: perceptual-hash banding + hamming verify
# ---------------------------------------------------------------------------

_PHASH_CELL = (
    "list_transform(range(0, 64), c -> "
    "list_sum(list_filter(cs, (x, i) -> (i - 1) % 64 = c)))"
)

#: shared CTE chain: fingerprints -> identical-hash star collapse ->
#: 4x16-bit pigeonhole bands -> verified near-miss pairs (hamming 1..k).
#: Ends in ``ppairs`` so both the top-20 row and the clusters row build
#: on the identical pair set.
_PHASH_PAIRS_CTES = f"""codes AS (SELECT doc_id AS media_id, {_CODES} AS cs FROM documents),
cells AS (
  SELECT media_id, {_PHASH_CELL} AS cl,
         coalesce(list_sum(cs), 0) AS tot
  FROM codes
),
words AS MATERIALIZED (
  SELECT media_id,
         CAST(list_sum(list_transform(range(0, 32), c ->
           CASE WHEN coalesce(cl[c + 1], 0) * 64 > tot
                THEN 1::BIGINT << c ELSE 0::BIGINT END)) AS BIGINT) AS w0,
         CAST(list_sum(list_transform(range(0, 32), c ->
           CASE WHEN coalesce(cl[c + 33], 0) * 64 > tot
                THEN 1::BIGINT << c ELSE 0::BIGINT END)) AS BIGINT) AS w1
  FROM cells
),
grp AS MATERIALIZED (
  SELECT w0, w1, CAST(min(media_id) AS BIGINT) AS rep,
         CAST(count(*) AS BIGINT) AS grp_size
  FROM words GROUP BY 1, 2
),
bands AS MATERIALIZED (
  SELECT rep, w0, w1, grp_size, j,
         CASE j WHEN 0 THEN w0 & 65535 WHEN 1 THEN (w0 >> 16) & 65535
                WHEN 2 THEN w1 & 65535 ELSE (w1 >> 16) & 65535 END AS bv
  FROM grp CROSS JOIN (SELECT unnest(range(0, 4)) AS j)
),
cand AS (
  SELECT DISTINCT a.rep AS rep_a, b.rep AS rep_b,
         a.w0 AS aw0, a.w1 AS aw1, b.w0 AS bw0, b.w1 AS bw1,
         a.grp_size AS size_a, b.grp_size AS size_b
  FROM bands a JOIN bands b
    ON a.j = b.j AND a.bv = b.bv AND a.rep < b.rep
),
ppairs AS MATERIALIZED (
  SELECT rep_a AS media_a, rep_b AS media_b,
         CAST(bit_count(xor(aw0, bw0)) AS BIGINT)
           + CAST(bit_count(xor(aw1, bw1)) AS BIGINT) AS hamming,
         size_a, size_b
  FROM cand
  WHERE CAST(bit_count(xor(aw0, bw0)) AS BIGINT)
        + CAST(bit_count(xor(aw1, bw1)) AS BIGINT)
        BETWEEN 1 AND {multimodal.PHASH_HAM_K}
)"""

_PHASH_ORACLE = f"""
WITH {_PHASH_PAIRS_CTES}
SELECT media_a, media_b, hamming, size_a, size_b
FROM ppairs
ORDER BY hamming ASC, media_a ASC, media_b ASC
LIMIT 20
"""



def _phash_rep_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared pair pipeline: fingerprints -> star collapse -> bands ->
    verified (media_a, media_b, hamming, size_a, size_b) near-miss
    pairs, hamming 1..PHASH_HAM_K.  Mirrors _PHASH_PAIRS_CTES."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    words = multimodal.phash_words(multimodal.with_media(docs))
    grp = (
        words.groupBy("w0", "w1")
        .agg(
            F.min("media_id").cast("long").alias("rep"),
            F.count(F.lit(1)).cast("long").alias("grp_size"),
        )
        .localCheckpoint(eager=True)  # 4 band views + both join sides
    )
    bands = grp.select(
        "rep", "w0", "w1", "grp_size",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.expr(e).cast("long").alias("bv"),
                    )
                    for j, e in enumerate(
                        [
                            "w0 & 65535",
                            "(w0 >> 16) & 65535",
                            "w1 & 65535",
                            "(w1 >> 16) & 65535",
                        ]
                    )
                ]
            )
        ).alias("band"),
    ).select("rep", "w0", "w1", "grp_size", "band.j", "band.bv")
    a = bands.select(
        F.col("j"), F.col("bv"), F.col("rep").alias("rep_a"),
        F.col("w0").alias("aw0"), F.col("w1").alias("aw1"),
        F.col("grp_size").alias("size_a"),
    )
    b = bands.select(
        F.col("j"), F.col("bv"), F.col("rep").alias("rep_b"),
        F.col("w0").alias("bw0"), F.col("w1").alias("bw1"),
        F.col("grp_size").alias("size_b"),
    )
    cand = (
        a.join(b, ["j", "bv"])
        .where(F.col("rep_a") < F.col("rep_b"))
        .select(
            "rep_a", "rep_b", "aw0", "aw1", "bw0", "bw1", "size_a", "size_b"
        )
        .distinct()
    )
    ham = (
        F.expr("bit_count(aw0 ^ bw0)").cast("long")
        + F.expr("bit_count(aw1 ^ bw1)").cast("long")
    )
    return (
        cand.withColumn("hamming", ham)
        .where(
            (F.col("hamming") >= 1)
            & (F.col("hamming") <= multimodal.PHASH_HAM_K)
        )
        .select(
            F.col("rep_a").alias("media_a"),
            F.col("rep_b").alias("media_b"),
            "hamming",
            "size_a",
            "size_b",
        )
    )


@register("multimodal_phash_neardup", oracle=_PHASH_ORACLE)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary NEAR-dup over opaque media payloads — the multimodal face
    of the dedup stack: a 64-bit average-hash fingerprint per payload
    (operators/multimodal.phash_words, the aHash shape with strided
    byte cells standing in for the 8x8 grayscale grid), identical
    fingerprints collapsed to one representative FIRST (the star-
    collapse discipline — exact dup groups are the hot buckets, and
    their pair volume belongs to exact dedup, not here), then 4x16-bit
    pigeonhole banding guarantees every representative pair within
    hamming <= {k} shares a band; survivors verify with two XOR+popcount
    words.  Top-20 true near-misses (hamming 1..{k}) with both sides'
    dup-group sizes.  At 100 TB: the fingerprint is a write-time
    column, the collapse is one hash-keyed shuffle, band buckets are
    over DISTINCT hashes (bounded), and the verify is
    output-proportional."""
    return (
        _phash_rep_pairs(spark, sf_dir)
        .orderBy(
            F.col("hamming").asc(), F.col("media_a").asc(),
            F.col("media_b").asc(),
        )
        .limit(20)
    )


multimodal_phash_neardup.__doc__ = multimodal_phash_neardup.__doc__.format(
    k=multimodal.PHASH_HAM_K
)


_PHASH_CLUSTERS_ORACLE = f"""
WITH RECURSIVE {_PHASH_PAIRS_CTES},
edges AS (
  SELECT media_a AS src, media_b AS dst FROM ppairs
  UNION
  SELECT media_b, media_a FROM ppairs
),
reach AS (
  SELECT src AS node, src AS lbl FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node
)
SELECT node AS media_id, CAST(min(lbl) AS BIGINT) AS cluster_id
FROM reach GROUP BY node
"""


@register("multimodal_phash_clusters", oracle=_PHASH_CLUSTERS_ORACLE)
def multimodal_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary near-dup CLUSTERS: connected components over the phash
    near-miss pairs (the same verified pair set as
    multimodal_phash_neardup, unlimited), every representative labeled
    with its component's min media_id — the keep-one-per-cluster
    decision a multimodal curation pass executes.  Reuses the text
    stack's min-label CC (operators/dedup.duplicate_clusters — one
    shuffle per round, fixpoint early-exit) against DuckDB's
    recursive-CTE transitive closure, so the multimodal face gets the
    identical clustering guarantee as the LSH/Jaccard text families."""
    from javascript_vector_database_spark.operators.dedup import (
        duplicate_clusters,
    )

    pairs = _phash_rep_pairs(spark, sf_dir).select(
        F.col("media_a").alias("id_a"), F.col("media_b").alias("id_b")
    )
    return duplicate_clusters(pairs).select(
        F.col("doc_id").alias("media_id"), "cluster_id"
    )
