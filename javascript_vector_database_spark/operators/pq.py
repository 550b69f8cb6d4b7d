"""Product quantization (PQ) for embedding columns — the memory-bound
ANN scale path beyond SQ8.

The reference scans full float vectors for every distance (reference
src/search.ts:5-17); SQ8 (operators/quant.py) compresses each DIMENSION
to 8 bits.  PQ (Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — the FAISS `IndexPQ` / Milvus `IVF_PQ` scheme)
compresses each SUBVECTOR to one code: split the vector into M
subspaces, quantize each against a per-subspace codebook of K centroids,
store M small codes per vector (M bytes at K<=256 — a 32x reduction on a
64-dim float32 vector), and answer queries with asymmetric distance
computation (ADC): one driver-side lookup table of query-to-centroid
distances per subspace, then each row's approximate distance is M table
lookups + adds — no float vector ever read in the probe scan.

Engine-portable by construction (same discipline as quant.py):

* the codebook is the deterministic hash-order sample draw shared with
  IVF (``ORDER BY md5(pk)`` LIMIT K) — each sampled vector's m-th slice
  is subspace m's j-th centroid, reproducible in SQL;
* encode = per-subspace argmin with ties to the lowest j.  The table
  path (:func:`pq_code_table`) treats the codebook as a broadcast DATA
  table (explode + join + struct-min aggregates — literal-free codegen);
  :func:`pq_code_expr` is the equivalent scan-local literal fold
  (``least()`` over (score, j) structs), kept for column composition /
  partitionBy-layout writes, but the M*K struct tree evaluates
  interpreted — use the table path in anything hot;
* every distance is a LEFT-ASSOCIATED sum of ``(x - c) * (x - c)``
  double terms in index order, so Spark codegen, Python (LUT) and
  DuckDB (oracle) produce bit-identical IEEE doubles;
* the ADC LUT is computed ONCE driver-side in Python and inlined as
  full-precision literals into BOTH the Spark plan and the oracle SQL —
  query preprocessing is shared, not re-derived.

100 TB plan: codes are materialized at write time (``pq_code_table``)
next to the float vectors; ``pq_search_precomputed`` phase 1 scans ONLY
(id, code) — column pruning keeps the 32x-smaller code column as the
entire probe I/O — and phase 2 broadcast-joins the k*rerank surviving
ids back to the vector table for exact re-ranking.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from javascript_vector_database_spark.functions.vector import (
    euclidean_distance,
    lit_double_array,
)
from javascript_vector_database_spark.pivots import TOP_K

#: subspaces (sub_dim = dim // PQ_M; 64-dim corpus -> 8 floats per code)
PQ_M = 8
#: centroids per subspace codebook (one code = 4 bits here; <=256 -> 1 byte)
PQ_K = 16
#: centroids for the TRAINED codebook (6 bits/code): measured sweet spot
#: at sf0.1 — recall@10 0.63 (K=16) / 0.76 (K=64) / 0.81 (K=256) against
#: query-time 0.43/0.61/1.33 s (the ADC LUT literal array grows with K);
#: the oracle-checked rows keep the K=16 hash-order sample
PQ_K_TRAINED = 64
#: exact re-rank pool = k * PQ_RERANK candidates (PQ codes are a coarser
#: surrogate than SQ8's per-dimension codes — 4 bits per 8 floats here —
#: so the re-rank pool is deeper; still O(k), vanishing vs the corpus)
PQ_RERANK = 8

#: the 384-dim (reference-geometry) configuration — measured on the
#: committed clustered fixture, recall@10 over 5 queries vs exact:
#:   m=8  (48-dim subspaces)  sampled K=16 rerank=8  -> 0.22  (the r6
#:                            default the verdict flagged at 0.38 trained)
#:   m=48 (8-dim subspaces)   sampled K=16 rerank=8  -> 0.40
#:   m=96 (4-dim subspaces)   sampled K=16 rerank=8  -> 0.58
#:   m=96                     sampled K=16 rerank=32 -> 0.88  <- default
#:   m=96                     trained K=16 rerank=8  -> 0.86
#:   m=48                     trained K=64 rerank=32 -> 0.92
#: PQ quantization error grows with subspace width (Jégou §V: accuracy
#: is driven by bits per COMPONENT, not bits per code), so the flagship
#: 384-dim geometry wants FAISS-style 4-dim subspaces; code storage is
#: 96 x 4 bits = 48 bytes/vector — still an 32x reduction on 384 floats.
PQ_M_384 = 96
#: deeper exact re-rank for the coarse K=16 sampled codebook: 320 full
#: rows read in phase 2 per query, independent of corpus size
PQ_RERANK_384 = 32


def pq_codebook(
    cents: list[tuple[int, list[float]]], m: int = PQ_M
) -> list[list[list[float]]]:
    """codebook[s][j] = subspace-s slice of the j-th sampled vector.
    ``cents`` is the deterministic hash-order draw
    (ann_scale.collect_centroids) sorted by cid; j indexes that order."""
    dim = len(cents[0][1])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by PQ_M {m}")
    sd = dim // m
    vecs = [list(map(float, v)) for _, v in cents]
    return [[v[s * sd : (s + 1) * sd] for v in vecs] for s in range(m)]


def pq_train_codebook(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    train_fraction: float | None = None,
) -> list[list[list[float]]]:
    """Trained codebook via per-subspace MLlib k-means‖ — the
    recall-optimal PQ path (Jégou §III trains each subquantizer with
    k-means; the hash-order sample draw of :func:`pq_codebook` is the
    engine-portable stand-in the oracle rows keep).  Returns the same
    ``codebook[s][j]`` shape, so it plugs straight into
    :func:`pq_code_table` / :func:`pq_search_precomputed`.

    Each subspace's centers are sorted lexicographically so j-order is
    stable across runs.  Not oracle-checked (k-means assignment depends
    on partitioning); the recall win over the sampled codebook is pinned
    by pytest and reported by bench (``pq_recall_at_10`` trained vs
    ``pq_sampled_recall_at_10``).

    100 TB plan: train on a bounded sample (``train_fraction`` — k-means
    centroids converge on a few hundred points per centroid; FAISS
    defaults to ~256*k training points), then encode the full corpus with
    the fixed codebook — training cost is O(sample), independent of the
    table."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dim_row = emb.select(F.size(vec_col)).first()
    dim = int(dim_row[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sd = dim // m
    src = emb
    if train_fraction is not None:
        src = src.sample(fraction=train_fraction, seed=seed)
    # one materialized pass over the (sampled) vectors feeds all M fits
    src = src.select(F.col(vec_col).cast("array<double>").alias("__v")).cache()
    try:
        codebook = []
        for s in range(m):
            feats = src.select(
                array_to_vector(F.slice("__v", s * sd + 1, sd)).alias("features")
            )
            model = KMeans(k=k, seed=seed + s, maxIter=max_iter).fit(feats)
            centers = sorted(
                [float(x) for x in c] for c in model.clusterCenters()
            )
            codebook.append(centers)
        return codebook
    finally:
        src.unpersist()


def pq_train_codebook_local(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    max_iter: int = 20,
    max_train: int = 65536,
) -> list[list[list[float]]]:
    """Trained codebook via DRIVER-SIDE numpy Lloyd's (k-means++ init)
    on a bounded, deterministically-ordered sample — the FAISS-style
    training path: subquantizer k-means needs only a few hundred points
    per centroid, so training is O(sample) in driver memory regardless
    of corpus size, and the fixed codebook then encodes the full corpus
    distributively (:func:`pq_code_table`).

    vs :func:`pq_train_codebook` (per-subspace MLlib fits): one
    collect + in-process numpy replaces M cluster jobs — at the 384-dim
    config (m=96) that is 96 avoided MLlib rounds; measured 3.3s total
    training on the 2000-row fixture vs ~13s for 48 MLlib fits.
    Deterministic: the sample is the first ``max_train`` rows by
    ``id_col`` and every k-means++ draw comes from a seeded RNG.  Same
    ``codebook[s][j]`` output shape, centers sorted per subspace."""
    import numpy as np

    rows = (
        emb.orderBy(id_col)
        .limit(max_train)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    )
    x = np.array([r[0] for r in rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sd = dim // m

    def lloyd(pts: "np.ndarray", rng: "np.random.RandomState") -> "np.ndarray":
        kk = min(k, len(pts))
        cents = [pts[rng.randint(len(pts))]]
        for _ in range(kk - 1):
            d2 = np.min(
                np.stack([((pts - c) ** 2).sum(axis=1) for c in cents]), axis=0
            )
            tot = d2.sum()
            p = d2 / tot if tot > 0 else None
            cents.append(pts[rng.choice(len(pts), p=p)])
        cen = np.array(cents)
        for _ in range(max_iter):
            d = ((pts[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for j in range(kk):
                sel = pts[assign == j]
                if len(sel):
                    cen[j] = sel.mean(axis=0)
        return cen

    codebook = []
    for s in range(m):
        rng = np.random.RandomState(seed + s)
        cen = lloyd(x[:, s * sd : (s + 1) * sd], rng)
        codebook.append(sorted([float(v) for v in c] for c in cen))
    return codebook


def _cent_sq(cent: list[float]) -> float:
    """||c||^2 as a left-associated Python double sum (c is a literal, so
    this is a compile-time constant shared by all three engines)."""
    acc = 0.0
    for c in cent:
        acc = acc + float(c) * float(c)
    return acc


def _sub_score(vec: Column, offset: int, cent: list[float]) -> Column:
    """Candidate score ``||c||^2 - 2*<v_s, c>``: equals the subspace
    sqdist minus ``||v_s||^2``, which is constant across the K candidates,
    so the argmin (and the ADC ranking, summed over subspaces) is
    unchanged — at ~40% of the expression size of the full sqdist (the
    ``(x-c)^2`` form evaluates each element twice).  The dot is a
    left-associated sum of ``x_i * c_i`` double terms — the shared
    construction all three engines reproduce bit-for-bit."""
    terms = [
        vec.getItem(offset + i).cast("double") * F.lit(float(c))
        for i, c in enumerate(cent)
    ]
    dot = reduce(lambda a, b: a + b, terms)
    return F.lit(_cent_sq(cent)) - F.lit(2.0) * dot


def pq_code_expr(vec: Column | str, codebook: list[list[list[float]]]) -> Column:
    """array<int>[M]: per-subspace nearest-centroid index, ties to the
    lowest j.  ``least()`` over (d, j) structs = lexicographic argmin —
    plain codegen expressions, scan-local at any scale."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    sd = len(codebook[0][0])
    codes = []
    for s, cents in enumerate(codebook):
        cands = [
            F.struct(
                _sub_score(vec, s * sd, c).alias("d"),
                F.lit(j).alias("j"),
            )
            for j, c in enumerate(cents)
        ]
        codes.append(F.least(*cands).getField("j"))
    return F.array(*codes)


def py_pq_lut(qvec: list[float], codebook: list[list[list[float]]]) -> list[list[float]]:
    """ADC lookup table: lut[s][j] = ``||c||^2 - 2*<q_s, c>`` — the same
    score form and left-associated double arithmetic as
    :func:`_sub_score` (the true approximate sqdist differs from the
    summed scores only by the constant ``||q||^2``, which cannot change
    any ordering)."""
    sd = len(codebook[0][0])
    lut = []
    for s, cents in enumerate(codebook):
        row = []
        for c in cents:
            acc = 0.0
            for i, cv in enumerate(c):
                acc = acc + float(qvec[s * sd + i]) * cv
            row.append(_cent_sq(c) - 2.0 * acc)
        lut.append(row)
    return lut


#: above this subspace count the ADC/encode expressions switch from the
#: codegen-friendly literal chain to data-shaped forms: at M=96 (the
#: 384-dim config) the M-term literal tree makes janino compile the
#: generated class for SECONDS on every fresh plan (measured ~13s of
#: the 16s ann_pq_384 wall at sf0.1 — the fixture data itself is
#: milliseconds), and the generated-code cache rarely hits because each
#: composed plan differs.  Small M keeps the chain: compiled once it is
#: the fastest per-row form, and the compile is proportionate.
PQ_WIDE_M = 16


def pq_adc_expr(code_col: Column | str, lut: list[list[float]]) -> Column:
    """Approximate squared distance: left-associated sum over subspaces of
    the LUT entry the row's code selects (M lookups + adds per row).

    Two equivalent forms by M (see PQ_WIDE_M): the literal chain for
    narrow codes, and ONE flat M*K literal array folded with the
    ``aggregate`` higher-order function for wide ones.  The HOF fold is
    left-associated in subspace order — term for term the SAME IEEE
    double additions as the chain (the 0.0 seed is exact: x + 0.0 == x
    for every finite x, and ADC scores only rank candidates, so a
    -0.0 vs 0.0 sign difference cannot reorder anything)."""
    code_col = F.col(code_col) if isinstance(code_col, str) else code_col
    m, k = len(lut), len(lut[0])
    if m <= PQ_WIDE_M:
        # lit_double_array: one parsed expression per subspace row — the
        # per-element F.lit form costs a py4j round trip per literal
        terms = [
            F.element_at(lit_double_array(lut[s]), code_col.getItem(s) + 1)
            for s in range(m)
        ]
        return reduce(lambda a, b: a + b, terms)
    # Two-step shape on purpose: zip_with's ARGUMENTS are evaluated once
    # per row, then the fold runs over the materialized value array.  A
    # single aggregate whose lambda indexes into code_col per step
    # re-evaluates code_col's (possibly CollapseProject-inlined — e.g.
    # the wide-M encode's transform) expression on EVERY fold step:
    # measured 95s for the composed encode+ADC at M=96 vs 0.3s here.
    flat = lit_double_array([v for row in lut for v in row])
    vals = F.zip_with(
        code_col,
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda c, s: F.element_at(flat, s * k + c + 1),
    )
    return F.aggregate(vals, F.lit(0.0), lambda a, b: a + b)


def _pq_encode_pandas(codebook: list[list[list[float]]]):
    """Arrow-vectorized PQ encoder for WIDE codebooks (see PQ_WIDE_M):
    one scan-local pandas_udf, no explode/join/aggregate — at M=96 the
    join-aggregate encode pushes 2000x96x16 = 3M candidate rows through
    two SortAggregates (struct-min is not hash-aggregable) and measured
    13.5s on the 2000-row fixture; this kernel is milliseconds and, at
    100 TB, removes BOTH encode shuffles (encode becomes a projection).

    Bit-exact with the join form: the subspace score is
    ``||c||^2 - 2*<v_s, c>`` with every accumulation LEFT-ASSOCIATED in
    element order — the numpy loops below add one element position per
    step (``acc = acc + x_i*c_i``), which is the same IEEE-double
    addition chain as :func:`_sub_score` / the DuckDB oracle, applied
    row-vectorized.  ``np.argmin`` returns the FIRST minimum = ties to
    the lowest j, matching ``least()`` on (d, j) structs."""
    m = len(codebook)
    sd = len(codebook[0][0])
    C = np.array(codebook, dtype=np.float64)  # (m, k, sd)
    # csq via the same left-associated per-element accumulation
    csq = np.zeros(C.shape[:2])
    for i in range(sd):
        csq = csq + C[:, :, i] * C[:, :, i]

    @F.pandas_udf("array<int>")
    def enc(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        x = np.array(v.tolist(), dtype=np.float64)
        codes = np.empty((x.shape[0], m), dtype=np.int32)
        for s in range(m):
            acc = np.zeros((x.shape[0], C.shape[1]))
            for i in range(sd):
                acc = acc + x[:, s * sd + i, None] * C[s, None, :, i]
            codes[:, s] = np.argmin(csq[s][None, :] - 2.0 * acc, axis=1)
        return pd.Series(list(codes))

    return enc


def pq_code_table(
    emb: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The write-time code table (id, pq_code): M small ints per vector —
    with parquet bit-packing ~M bytes/vector vs 4*dim for the floats.

    Encoded with the codebook as DATA (a broadcast (s, j, c, ||c||^2)
    table) instead of the literal fold of :func:`pq_code_expr`: the
    M*K-way ``least`` tree over structs falls out of whole-stage codegen
    and evaluates interpreted (measured ~10x slower), while this shape is
    explode(M) -> broadcast join (M*K tiny rows) -> two struct-min hash
    aggregates whose map-side partials collapse everything back to one
    row per vector before the shuffle — and its generated code carries no
    literals, so one compiled class serves every codebook.  Same argmin
    scores bit-for-bit (identical left-associated double terms).

    WIDE codebooks (m > PQ_WIDE_M) route to the Arrow kernel instead —
    see :func:`_pq_encode_pandas` for the measurement and the bit-
    exactness argument."""
    m = len(codebook)
    if m > PQ_WIDE_M:
        enc = _pq_encode_pandas(codebook)
        return emb.select(
            F.col(id_col),
            enc(F.col(vec_col).cast("array<double>")).alias("pq_code"),
        )
    return _pq_code_table_join(emb, codebook, id_col, vec_col)


def _pq_code_table_join(
    emb: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The join-aggregate encode form (see :func:`pq_code_table`) —
    exposed separately so tests can pin it bit-for-bit against the
    Arrow kernel at any M."""
    m = len(codebook)
    sd = len(codebook[0][0])
    spark = emb.sparkSession
    cb_rows = [
        (s, j, [float(x) for x in c], _cent_sq(c))
        for s, cents in enumerate(codebook)
        for j, c in enumerate(cents)
    ]
    cb = spark.createDataFrame(
        cb_rows, schema="s int, j int, c array<double>, csq double"
    )
    sub = emb.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
    )
    dot_terms = [
        F.element_at("__v", F.col("s") * sd + i + 1).cast("double")
        * F.element_at("c", i + 1)
        for i in range(sd)
    ]
    score = F.col("csq") - F.lit(2.0) * reduce(lambda a, b: a + b, dot_terms)
    best = (
        sub.join(F.broadcast(cb), "s")
        .groupBy(id_col, "s")
        .agg(F.min(F.struct(score.alias("d"), F.col("j").alias("j"))).alias("b"))
    )
    codes = best.groupBy(id_col).agg(
        *[
            F.min(F.when(F.col("s") == s, F.col("b.j"))).alias(f"__c{s}")
            for s in range(m)
        ]
    )
    return codes.select(
        id_col, F.array(*[f"__c{s}" for s in range(m)]).alias("pq_code")
    )


def pq_search(
    emb: DataFrame,
    qvec: list[float],
    codebook: list[list[list[float]]],
    k: int = TOP_K,
    rerank: int = PQ_RERANK,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ top-k: encode (join-aggregate, :func:`pq_code_table`) + ADC-rank
    k*rerank candidates (TakeOrderedAndProject on the (double, id) key),
    then exact euclidean re-rank of the bounded pool.  Output:
    (id, distance)."""
    return pq_search_precomputed(
        pq_code_table(emb, codebook, id_col, vec_col),
        emb,
        qvec,
        codebook,
        k=k,
        rerank=rerank,
        id_col=id_col,
        vec_col=vec_col,
    )


def pq_search_precomputed(
    codes: DataFrame,
    emb: DataFrame,
    qvec: list[float],
    codebook: list[list[list[float]]],
    k: int = TOP_K,
    rerank: int = PQ_RERANK,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """The compressed-scan layout: phase 1 reads ONLY (id, pq_code) from
    the stored code table (the float column is column-pruned out of the
    probe read); phase 2 broadcast-joins the k*rerank candidate ids back
    to the vector table for the exact re-rank."""
    lut = py_pq_lut(qvec, codebook)
    cand_ids = (
        codes.select(F.col(id_col), pq_adc_expr(F.col(code_col), lut).alias("__ad"))
        .orderBy(F.col("__ad").asc(), F.col(id_col).asc())
        .limit(k * rerank)
        .select(id_col)
    )
    qv_lit = lit_double_array([float(x) for x in qvec])
    return (
        emb.join(F.broadcast(cand_ids), id_col)
        .select(
            id_col,
            F.round(euclidean_distance(F.col(vec_col), qv_lit), 6).alias("distance"),
        )
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


def pq_batch_search(
    codes: DataFrame,
    emb: DataFrame,
    queries: list[tuple[int, list[float]]],
    codebook: list[list[list[float]]],
    k: int = TOP_K,
    rerank: int = PQ_RERANK,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
    q_id: str = "query_id",
) -> DataFrame:
    """Batch ADC: top-k per query for a WHOLE query set in ONE scan of
    the stored code table — the PQ analog of :func:`knn.knn_batch`'s
    amortization (the corpus codes are read once for |Q| queries, not
    |Q| times), composed with PQ's own I/O story (the scan reads M-byte
    codes, never the float vectors).

    Every query's ADC is its own EXPRESSION-level fold
    (:func:`pq_adc_expr` — M literal-array lookups, left-associated
    adds, deterministic on any engine; never a float groupBy-sum whose
    shuffle order could flip candidate boundaries), stacked via one
    explode to (query, id, ad) skinny rows.  Per-query k*rerank
    candidates come from a row_number window Catalyst rewrites to a
    two-phase WindowGroupLimit (partial top-k below the exchange — the
    knn_batch plan shape), and the exact re-rank joins the bounded
    survivor set back to the vector table with the broadcast query
    vectors.  Output: (query_id, id, distance)."""
    from pyspark.sql.window import Window

    ad_structs = [
        F.struct(
            F.lit(int(qid)).cast("long").alias("q"),
            pq_adc_expr(F.col(code_col), py_pq_lut(qv, codebook)).alias("ad"),
        )
        for qid, qv in queries
    ]
    scored = codes.select(
        F.col(id_col), F.explode(F.array(*ad_structs)).alias("__x")
    ).select(
        F.col("__x.q").alias(q_id),
        F.col(id_col),
        F.col("__x.ad").alias("__ad"),
    )
    wc = Window.partitionBy(q_id).orderBy(
        F.col("__ad").asc(), F.col(id_col).asc()
    )
    cand = (
        scored.withColumn("__rn", F.row_number().over(wc))
        .where(F.col("__rn") <= k * rerank)
        .select(q_id, id_col)
    )
    qdf = codes.sparkSession.createDataFrame(
        [(int(qid), [float(x) for x in qv]) for qid, qv in queries],
        schema=f"{q_id} long, __qv array<double>",
    )
    wr = Window.partitionBy(q_id).orderBy(
        F.col("distance").asc(), F.col(id_col).asc()
    )
    return (
        emb.join(cand, id_col)
        .join(F.broadcast(qdf), q_id)
        .select(
            q_id,
            id_col,
            F.round(
                euclidean_distance(F.col(vec_col), F.col("__qv")), 6
            ).alias("distance"),
        )
        .withColumn("__rn", F.row_number().over(wr))
        .where(F.col("__rn") <= k)
        .select(q_id, id_col, "distance")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse cell probe + ADC within the probed cells
# ---------------------------------------------------------------------------


def ivfpq_probe_cells(
    qvec: list[float],
    cents: list[tuple[int, list[float]]],
    nprobe: int,
) -> list[int]:
    """The nprobe nearest coarse cells, ranked driver-side (the centroid
    set is tiny by construction); ties to the lowest cid."""
    from javascript_vector_database_spark.operators.knn import _py_euclid

    return [cid for _, cid in sorted((_py_euclid(c, qvec), cid) for cid, c in cents)[:nprobe]]


def ivfpq_search_precomputed(
    stored: DataFrame,
    emb: DataFrame,
    qvec: list[float],
    cents: list[tuple[int, list[float]]],
    codebook: list[list[list[float]]],
    nprobe: int | None = None,
    k: int = TOP_K,
    rerank: int = PQ_RERANK,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
    code_col: str = "pq_code",
) -> DataFrame:
    """The FAISS ``IVF_PQ`` layout over a stored (id, ivf_cell, pq_code)
    table: the probe IN-list prunes whole cells BEFORE any scan (with a
    ``partitionBy(ivf_cell)`` layout this is partition pruning — entire
    directories skipped), ADC ranks the surviving ~nprobe/K of the corpus
    reading ONLY the code column (the float vector is column-pruned out),
    and the k*rerank survivors broadcast-join back to the vector table
    for the exact re-rank.  This is the compounding 100 TB story: I/O =
    (nprobe/K_cells) x (M bytes per row) — both factors independent of
    the full corpus width."""
    from javascript_vector_database_spark.operators.ann_scale import N_PROBE

    if nprobe is None:
        nprobe = N_PROBE
    probe = ivfpq_probe_cells(qvec, cents, nprobe)
    lut = py_pq_lut(qvec, codebook)
    cand_ids = (
        stored.where(F.col(cell_col).isin([int(c) for c in probe]))
        .select(F.col(id_col), pq_adc_expr(F.col(code_col), lut).alias("__ad"))
        .orderBy(F.col("__ad").asc(), F.col(id_col).asc())
        .limit(k * rerank)
        .select(id_col)
    )
    qv_lit = lit_double_array([float(x) for x in qvec])
    return (
        emb.join(F.broadcast(cand_ids), id_col)
        .select(
            id_col,
            F.round(euclidean_distance(F.col(vec_col), qv_lit), 6).alias("distance"),
        )
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ivfpq_search(
    emb: DataFrame,
    qvec: list[float],
    cents: list[tuple[int, list[float]]],
    codebook: list[list[list[float]]],
    nprobe: int | None = None,
    k: int = TOP_K,
    rerank: int = PQ_RERANK,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ with write-time artifacts derived inline (cell assignment
    via the broadcast-codebook join shape, codes via pq_code_table): the
    convenience path; deployments store both columns and use
    :func:`ivfpq_search_precomputed`."""
    from javascript_vector_database_spark.operators.ann_scale import ivf_cell_expr

    stored = emb.withColumn("ivf_cell", ivf_cell_expr(F.col(vec_col), cents)).select(
        id_col, "ivf_cell"
    ).join(pq_code_table(emb, codebook, id_col, vec_col), id_col)
    return ivfpq_search_precomputed(
        stored, emb, qvec, cents, codebook,
        nprobe=nprobe, k=k, rerank=rerank, id_col=id_col, vec_col=vec_col,
    )


# ---------------------------------------------------------------------------
# residual IVF-PQ (the full FAISS IndexIVFPQ semantics: PQ encodes the
# residual v - centroid(cell(v)), not the raw vector — Jégou §IV.B)
# ---------------------------------------------------------------------------


def py_residual(vec: list[float], cents: list[tuple[int, list[float]]]) -> list[float]:
    """Driver-side residual: v - nearest centroid (ties to the lowest
    cid, the ivf_cell_expr rule).  Element-wise subtraction — exact, no
    accumulation, so it matches the Column/SQL forms bit-for-bit."""
    from javascript_vector_database_spark.operators.knn import _py_euclid

    _, bcid = min((_py_euclid(c, vec), cid) for cid, c in cents)
    cent = dict(cents)[bcid]
    return [float(a) - float(b) for a, b in zip(vec, cent)]


def residual_table(
    emb: DataFrame,
    cents: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, ivf_cell, resid): every vector's coarse cell plus its
    residual against that cell's centroid.  One scan-local projection —
    the cell argmin (Arrow-routed at wide geometry) plus a zip_with
    subtraction against a 16-entry centroid map literal; at scale this
    IS the write path (store ivf_cell + the PQ codes of resid,
    partitioned by cell)."""
    from javascript_vector_database_spark.operators.ann_scale import ivf_cell_expr

    cmap = F.map_from_arrays(
        F.array(*[F.lit(int(cid)).cast("long") for cid, _ in cents]),
        F.array(*[lit_double_array([float(x) for x in c]) for _, c in cents]),
    )
    return (
        emb.withColumn("ivf_cell", ivf_cell_expr(F.col(vec_col), cents))
        .select(
            F.col(id_col),
            F.col("ivf_cell"),
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                F.element_at(cmap, F.col("ivf_cell")),
                lambda a, b: a - b,
            ).alias("resid"),
        )
    )


def residual_codebook(
    emb: DataFrame,
    cents: list[tuple[int, list[float]]],
    m: int = PQ_M,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = PQ_K,
) -> list[list[list[float]]]:
    """Sampled PQ codebook over RESIDUALS: the residuals of the same K
    hash-order sample rows the raw codebook uses, sliced per subspace.
    Residuals concentrate near 0 with corpus structure removed, so the
    same K codewords quantize them much more tightly than raw vectors
    (the reason FAISS encodes residuals)."""
    from javascript_vector_database_spark.operators.ann_scale import (
        collect_centroids,
    )

    sample = collect_centroids(emb, id_col, vec_col, k)
    return pq_codebook(
        [(cid, py_residual(v, cents)) for cid, v in sample], m=m
    )


def ivfpq_residual_search(
    emb: DataFrame,
    qvec: list[float],
    cents: list[tuple[int, list[float]]],
    codebook: list[list[list[float]]],
    nprobe: int | None = None,
    k: int = TOP_K,
    rerank: int = PQ_RERANK,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Residual IVF-PQ (FAISS IndexIVFPQ): ADC runs per probed cell
    against the QUERY'S residual in that cell (q - centroid_c), matching
    how the stored codes encode each vector's residual in its own cell.
    The probe set is an nprobe-way union of cell-filtered ADC branches —
    each branch is the same pruned code scan as ivfpq_search, just with
    a cell-specific LUT literal — then one exact re-rank of the
    k*rerank survivors.  ``codebook`` must come from
    :func:`residual_codebook` (or residual training)."""
    if nprobe is None:
        from javascript_vector_database_spark.operators.ann_scale import N_PROBE

        nprobe = N_PROBE
    rt = residual_table(emb, cents, id_col, vec_col).localCheckpoint()
    m = len(codebook)
    if m > PQ_WIDE_M:
        enc = _pq_encode_pandas(codebook)
        stored = rt.select(
            F.col(id_col), "ivf_cell", enc(F.col("resid")).alias("pq_code")
        )
    else:
        stored = rt.select(id_col, "ivf_cell").join(
            _pq_code_table_join(rt, codebook, id_col, "resid"), id_col
        )
    probe = ivfpq_probe_cells(qvec, cents, nprobe)
    centd = {int(cid): c for cid, c in cents}
    branches = []
    for cid in probe:
        qr = [float(a) - float(b) for a, b in zip(qvec, centd[int(cid)])]
        lut = py_pq_lut(qr, codebook)
        branches.append(
            stored.where(F.col("ivf_cell") == int(cid)).select(
                F.col(id_col),
                pq_adc_expr(F.col("pq_code"), lut).alias("__ad"),
            )
        )
    cand_ids = (
        reduce(lambda a, b: a.unionAll(b), branches)
        .orderBy(F.col("__ad").asc(), F.col(id_col).asc())
        .limit(k * rerank)
        .select(id_col)
    )
    qv_lit = lit_double_array([float(x) for x in qvec])
    return (
        emb.join(F.broadcast(cand_ids), id_col)
        .select(
            id_col,
            F.round(euclidean_distance(F.col(vec_col), qv_lit), 6).alias("distance"),
        )
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )
