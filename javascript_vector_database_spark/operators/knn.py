"""k-NN search strategies — the heart of the reference.

Three strategies, mirroring reference src/search.ts:

* ``exact_knn``            ≡ vectorSearchFullScan    (src/search.ts:5-17)
* ``ann_index_range``      ≡ vectorSearchIndexRange  (src/search.ts:19-54)
* ``ann_index_similarity`` ≡ vectorSearchIndexSimilarity (src/search.ts:56-109)

Spark-first design notes (scale: 100 TB, 1000 executors):

* The query vector is a *parameter*: inlined as a literal array, so every
  distance is a pure Column expression — no join, no shuffle for the scan
  phase.  ``orderBy(distance).limit(k)`` compiles to
  ``TakeOrderedAndProject`` — per-partition partial top-k, then a k-row
  merge on the driver.  No full sort, no full shuffle, ever.
* The reference issues 5 separate index-range queries and union-dedups
  (src/search.ts:23-40).  On a columnar store one scan with an OR of the 5
  range predicates is the same candidate set with 1/5 the reads; min-max
  row-group skipping still applies per conjunct.  We keep the single-pass
  plan and cite the equivalence.
* Pivot-distance index columns are precomputed at write time
  (``build_pivot_index``), exactly like the reference computes idx0..idx4
  at pipeline time (src/database.ts:195-198).  At 100 TB these are plain
  sortable DOUBLE columns -> parquet min/max skipping ≈ the reference's
  IndexedDB key ranges.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from javascript_vector_database_spark.functions.vector import (
    euclidean_distance,
    index_nr_to_string,
    lit_double_array,
)
from javascript_vector_database_spark.pivots import (
    DOCS_PER_INDEX_SIDE,
    INDEX_DISTANCE,
    TOP_K,
)


def _qvec_lit(query_vec: list[float]) -> Column:
    return lit_double_array(query_vec)


def _py_euclid(a: list[float], b: list[float]) -> float:
    # driver-side mirror for computing per-pivot query distances
    s = 0.0
    for x, y in zip(a, b):
        d = float(x) - float(y)
        s += d * d
    return s**0.5


def with_distance(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    out_col: str = "distance",
    round_to: int | None = 6,
) -> DataFrame:
    """Add the euclidean distance to the (literal) query vector."""
    d = euclidean_distance(F.col(vec_col), _qvec_lit(query_vec))
    if round_to is not None:
        d = F.round(d, round_to)
    return df.withColumn(out_col, d)


def exact_knn(
    df: DataFrame,
    query_vec: list[float],
    k: int = TOP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN full scan: distance to all rows, ascending top-k with the
    primary key as deterministic tiebreak (reference sorts then slices,
    src/search.ts:10-14; PK tiebreak per rx-query-helper.js:128-136).

    Plan: one scan -> TakeOrderedAndProject(k).  Returns (id, distance).
    """
    return (
        with_distance(df, query_vec, vec_col)
        .select(id_col, "distance")
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


def build_pivot_index(
    df: DataFrame,
    pivots: list[list[float]],
    vec_col: str = "embedding",
    compat_strings: bool = False,
) -> DataFrame:
    """Add idx0..idxN distance-to-pivot columns (reference
    src/database.ts:195-198).  DOUBLE columns are the fixed/scale mode; the
    10-char compat string encoding (src/database.ts:223-225) is opt-in for
    fidelity tests (see SURVEY.md §1.3 for why strings mis-sort).
    """
    out = df
    for i, p in enumerate(pivots):
        d = euclidean_distance(F.col(vec_col), _qvec_lit(p))
        out = out.withColumn(f"idx{i}", d)
        if compat_strings:
            out = out.withColumn(f"idx{i}_str", index_nr_to_string(F.col(f"idx{i}")))
    return out


def ann_index_range(
    df: DataFrame,
    query_vec: list[float],
    pivots: list[list[float]],
    k: int = TOP_K,
    index_distance: float = INDEX_DISTANCE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    precomputed: bool = False,
) -> DataFrame:
    """Pivot-range ANN (reference src/search.ts:19-54).

    For each pivot i: d_i = dist(pivot_i, q); candidates have
    idx_i in the OPEN interval (d_i - d_i*0.003, d_i + d_i*0.003).
    The reference runs 5 index queries and union-dedups into a Set
    (src/search.ts:21-40); a single scan with the OR of the 5 sargable
    range predicates yields the identical candidate set (dedup implicit)
    and touches the storage once.  Candidates are exactly re-ranked and
    the top-k returned (src/search.ts:42-53).

    With ``precomputed=True`` the df already carries idx0..idxN columns
    (write-time index, the scale path — predicates push to parquet).
    """
    n = len(pivots)
    src = df if precomputed else build_pivot_index(df, pivots, vec_col)
    cond = None
    for i, p in enumerate(pivots[:n]):
        d_i = _py_euclid(p, query_vec)
        lo, hi = d_i - d_i * index_distance, d_i + d_i * index_distance
        c = (F.col(f"idx{i}") > F.lit(lo)) & (F.col(f"idx{i}") < F.lit(hi))
        cond = c if cond is None else (cond | c)
    return (
        with_distance(src.where(cond), query_vec, vec_col)
        .select(id_col, "distance")
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


def write_pivot_index_tables(
    df: DataFrame,
    pivots: list[list[float]],
    base_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_files: int = 8,
    compat_strings: bool = False,
) -> None:
    """Materialize the reference's pivot index as STORED tables — the
    write-time path behind ``ann_index_range_stored``.

    The reference keeps FIVE secondary indexes, one per pivot, each a
    sorted (idxN, id) structure range-scanned at query time
    (src/database.ts:103-109 declares indexes ['idx0']..['idx4'];
    src/search.ts:27-36 range-scans them).  The parquet translation:
    per pivot a skinny (id, idxN) table written range-partitioned AND
    sorted by its own key, so a probe's band predicate prunes at BOTH
    granularities — row groups via min/max footer stats, files via the
    range layout — exactly the I/O the reference's index buys it.  The
    base (id, vector) table is written beside them for the doc-read
    re-rank.  One source scan feeds all five index writes plus the base
    (the pivot distances are scan-local projections, no shuffle); at
    100 TB this is a per-collection build job, amortized over every
    subsequent query like any secondary index.

    ``compat_strings=True`` stores the key the reference PHYSICALLY
    stores — the 10-char lexicographic string of
    ``indexNrToString`` (src/database.ts:223-225) — instead of the
    double: each table becomes (id, idxN_str) sorted by the string.
    Parquet keeps binary min/max stats for strings, so string band
    predicates prune row groups exactly like the double mode; probe
    with ``ann_index_range_compat_stored``."""
    from concurrent.futures import ThreadPoolExecutor

    src = build_pivot_index(
        df, pivots, vec_col, compat_strings=compat_strings
    ).cache()
    try:
        # materialize the cache ONCE before the concurrent writers (a
        # cold cache offers no cross-job computation lock, so parallel
        # first-touch would redo the pivot folds per writer)
        src.count()

        # the six writes are independent jobs over the same cached
        # input — submit them from a small thread pool so each write's
        # range-sampling pass and output tail back-fill the cores the
        # others leave idle (guide §2.6); Spark's scheduler interleaves
        # concurrent jobs in one application safely
        def _write_idx(i: int) -> None:
            key = f"idx{i}_str" if compat_strings else f"idx{i}"
            (
                src.select(id_col, key)
                .repartitionByRange(n_files, F.col(key))
                .sortWithinPartitions(key)
                .write.mode("overwrite")
                .parquet(os.path.join(base_dir, f"idx{i}"))
            )

        def _write_base() -> None:
            src.select(id_col, vec_col).write.mode("overwrite").parquet(
                os.path.join(base_dir, "base")
            )

        with ThreadPoolExecutor(max_workers=3) as pool:
            futs = [pool.submit(_write_idx, i) for i in range(len(pivots))]
            futs.append(pool.submit(_write_base))
            for f in futs:
                f.result()
    finally:
        src.unpersist()


def append_pivot_index_delta(
    df_delta: DataFrame,
    pivots: list[list[float]],
    base_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Ingest NEW vectors into the stored pivot index (LSM discipline):
    each batch appends one unsorted segment file per index table plus
    the base rows — O(|delta|) work, no rewrite of the sorted history.
    Probes stay CORRECT immediately (they read the whole directory);
    what degrades is the delta segments' footer prunability (an
    unsorted file's [min,max] spans the key range, so band predicates
    can't skip it) — the classic LSM read-amplification tax, repaid by
    compact_pivot_index_tables.  Insert-only by design: keyed
    upsert/delete maintenance is the ParquetTable MERGE path
    (stream_pivot_index_live); these five tables are the SORTED
    secondary projections whose lifecycle is append -> compact, like
    any LSM level."""
    src = build_pivot_index(df_delta, pivots, vec_col).cache()
    try:
        for i in range(len(pivots)):
            (
                src.select(id_col, f"idx{i}")
                .coalesce(1)
                .write.mode("append")
                .parquet(os.path.join(base_dir, f"idx{i}"))
            )
        src.select(id_col, vec_col).write.mode("append").parquet(
            os.path.join(base_dir, "base")
        )
    finally:
        src.unpersist()


def compact_pivot_index_tables(
    spark: SparkSession,
    base_dir: str,
    n_pivots: int = 5,
    n_files: int = 8,
) -> None:
    """Re-sort each index table after a run of delta appends — the LSM
    compaction that restores footer prunability: range-partition +
    sort each table by its own key, write to a sibling dir, swap in.
    Base table is compacted to bounded file count without a sort (point
    lookups don't need one).  Cost: one shuffle per index table over
    that table's rows — schedule it off the query path, like any
    OPTIMIZE.

    Swap discipline matches ParquetTable._swap_in: rmtree(live) then
    os.replace(staged, live) — the rename is atomic, the pair is NOT
    (a crash between them leaves that one table absent until re-run;
    the staged data survives in the .tmp sibling).  The transactional
    version is a Delta OPTIMIZE commit.  Stale .tmp siblings from a
    crashed prior run are removed up front so a re-run always
    completes instead of wedging on leftovers (r12 review)."""
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    def _compact_one(name: str, key: str | None) -> None:
        path = os.path.join(base_dir, name)
        tmp = path + ".compact.tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)  # crashed prior run's staging
        df = spark.read.parquet(path)
        if key is not None:
            w = (
                df.repartitionByRange(n_files, F.col(key))
                .sortWithinPartitions(key)
            )
        else:
            w = df.coalesce(n_files)
        w.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(path)
        os.replace(tmp, path)

    # each table compacts independently (own dir, own swap) — overlap
    # the six rewrite jobs (guide §2.6); per-table swap discipline is
    # unchanged, so crash behavior is the same as the sequential form
    with ThreadPoolExecutor(max_workers=3) as pool:
        futs = [
            pool.submit(_compact_one, f"idx{i}", f"idx{i}")
            for i in range(n_pivots)
        ]
        futs.append(pool.submit(_compact_one, "base", None))
        for f in futs:
            f.result()


def open_pivot_index_tables(
    spark: SparkSession, base_dir: str, n_pivots: int = 5
) -> dict[str, DataFrame]:
    """Open the stored index/base tables ONCE (lazy handles — schema +
    file listing resolved here, reused by every probe).  The reference
    holds its collections open for the process lifetime; re-opening per
    query would re-pay listing/footer costs that are not part of the
    probe."""
    out = {
        f"idx{i}": spark.read.parquet(os.path.join(base_dir, f"idx{i}"))
        for i in range(n_pivots)
    }
    out["base"] = spark.read.parquet(os.path.join(base_dir, "base"))
    return out


def ann_index_range_stored(
    spark: SparkSession,
    base_dir: str,
    query_vec: list[float],
    pivots: list[list[float]],
    k: int = TOP_K,
    index_distance: float = INDEX_DISTANCE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Range-ANN served from the STORED pivot index tables (see
    write_pivot_index_tables) — the reference's actual query plan, five
    index range scans + doc reads (src/search.ts:19-54), rather than the
    recompute-the-index-per-query shape the faithful ``knn_ann_range``
    row keeps for oracle fidelity.

    Per pivot i the band predicate ``idx_i IN (d_i ± d_i·w)`` hits a
    table sorted by idx_i, so it pushes to parquet and row groups whose
    [min,max] miss the band are never decoded (the measured fraction is
    the ``pivot_idx_prunable_frac`` bench extra).  Candidate ids
    union-dedup across the five scans — the reference's Set union
    (src/search.ts:38-40) — then ONE semi-join back to the base table
    re-ranks exactly and takes top-k.  The candidate set is band-bounded
    (tiny by construction: ±0.003 of each pivot distance), so AQE
    broadcasts the semi-join; the base side stays partition-local, no
    corpus shuffle."""
    tables = tables or open_pivot_index_tables(spark, base_dir, len(pivots))
    cands = None
    for i, p in enumerate(pivots):
        d_i = _py_euclid(p, query_vec)
        lo, hi = d_i - d_i * index_distance, d_i + d_i * index_distance
        c = tables[f"idx{i}"].where(
            (F.col(f"idx{i}") > F.lit(lo)) & (F.col(f"idx{i}") < F.lit(hi))
        ).select(id_col)
        cands = c if cands is None else cands.unionByName(c)
    # no dropDuplicates: left_semi already ignores duplicate right-side
    # keys — the reference's Set union happens implicitly in the join
    hits = tables["base"].join(cands, id_col, "left_semi")
    return (
        with_distance(hits, query_vec, vec_col)
        .select(id_col, "distance")
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ann_index_range_compat_stored(
    spark: SparkSession,
    base_dir: str,
    query_vec: list[float],
    pivots: list[list[float]],
    k: int = TOP_K,
    index_distance: float = INDEX_DISTANCE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """The reference's PHYSICAL index probed as stored: the 10-char
    lexicographic string keys (indexNrToString,
    src/database.ts:223-225) persisted as the five sorted per-pivot
    secondary tables (``write_pivot_index_tables(compat_strings=True)``)
    and range-scanned with STRING band bounds (src/search.ts:27-36) —
    quirk-faithful, so it diverges from the double-key stored mode
    across digit-count regime boundaries exactly like
    ``ann_index_range_compat`` (SURVEY §1.3), and hash-matches that
    row's oracle.  Parquet keeps binary min/max footer stats for
    strings, so the string band prunes row groups the same way the
    double tables do; candidates union-dedup via the shared left_semi
    doc-read re-rank, no corpus shuffle."""
    tables = tables or open_pivot_index_tables(spark, base_dir, len(pivots))
    cands = None
    for i, p in enumerate(pivots):
        d_i = _py_euclid(p, query_vec)
        lo = _py_index_string(d_i - d_i * index_distance)
        hi = _py_index_string(d_i + d_i * index_distance)
        c = tables[f"idx{i}"].where(
            (F.col(f"idx{i}_str") > F.lit(lo))
            & (F.col(f"idx{i}_str") < F.lit(hi))
        ).select(id_col)
        cands = c if cands is None else cands.unionByName(c)
    hits = tables["base"].join(cands, id_col, "left_semi")
    return (
        with_distance(hits, query_vec, vec_col)
        .select(id_col, "distance")
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ann_index_range_stored_batch(
    spark: SparkSession,
    base_dir: str,
    queries: list[tuple[int, list[float]]],
    pivots: list[list[float]],
    k: int = TOP_K,
    index_distance: float = INDEX_DISTANCE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Batch probe of the STORED pivot index — eval-set retrieval over
    the reference's physical index shape (the batch sibling of
    ``ann_index_range_stored``, completing the batch family beside
    ``knn_batch``/``ivf_batch_search``/``pq_batch_search``).

    |Q|·n_pivots band mini-scans of the sorted skinny tables — the SAME
    sargable pushed predicates the single-query probe runs, planned in
    ONE job DAG so the driver submits once and every scan's row-group
    skipping still applies — each tagged with its query_id, then
    per-query dedup (the reference's Set union), ONE hash join back to
    the base table for the doc reads (candidate side is band-bounded
    tiny, so it broadcasts), a broadcast join to the (query_id, qvec)
    table for the exact distances, and per-query top-k through a
    row_number window Catalyst rewrites into a two-phase
    WindowGroupLimit.  The corpus is never fanned out by |Q| and never
    shuffled; scan count grows with |Q|·n_pivots, so for huge eval
    batches prefer the IVF batch path (equi-join on stored cells) —
    this is the faithful stored-index shape for bounded batches.
    Output: (query_id, vec_id, distance)."""
    from pyspark.sql.window import Window

    tables = tables or open_pivot_index_tables(spark, base_dir, len(pivots))
    cands = None
    for qid, qv in queries:
        for i, p in enumerate(pivots):
            d_i = _py_euclid(p, qv)
            lo, hi = d_i - d_i * index_distance, d_i + d_i * index_distance
            c = (
                tables[f"idx{i}"]
                .where(
                    (F.col(f"idx{i}") > F.lit(lo))
                    & (F.col(f"idx{i}") < F.lit(hi))
                )
                .select(F.lit(qid).alias("query_id"), id_col)
            )
            cands = c if cands is None else cands.unionByName(c)
    cands = cands.dropDuplicates(["query_id", id_col])
    qdf = spark.createDataFrame(
        [(int(qid), [float(x) for x in qv]) for qid, qv in queries],
        schema="query_id int, qvec array<double>",
    )
    scored = (
        tables["base"]
        .join(F.broadcast(cands), id_col)
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            id_col,
            F.round(
                euclidean_distance(F.col(vec_col), F.col("qvec")), 6
            ).alias("distance"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("distance").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", id_col, "distance")
    )


def ann_index_similarity_stored(
    spark: SparkSession,
    base_dir: str,
    query_vec: list[float],
    pivots: list[list[float]],
    k: int = TOP_K,
    docs_per_side: int = DOCS_PER_INDEX_SIDE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Pivot-neighborhood ANN served from the STORED per-pivot index
    tables (write_pivot_index_tables) — the second of the reference's
    two search modes run against its real index shape
    (src/search.ts:56-109: per pivot, two Mango queries with $lt / $gt
    + limit over the sorted idxN index).

    Per pivot each side is a sargable one-column predicate + top-N over
    a table SORTED by that column: the predicate pushes to parquet, and
    TakeOrderedAndProject takes per-partition partial top-Ns — on the
    range layout only the files straddling d_i contribute candidates,
    the rest are bounded by their min/max.  2·n_pivots skinny mini-scans
    + one semi-join doc-read re-rank; the candidate set is
    ≤ 2·n_pivots·docs_per_side rows by construction, so the join
    broadcasts.  Hash-matches the recomputed ``ann_index_similarity``
    (same bounds, same dedup, same re-rank)."""
    tables = tables or open_pivot_index_tables(spark, base_dir, len(pivots))
    sides: list[DataFrame] = []
    for i, p in enumerate(pivots):
        d_i = _py_euclid(p, query_vec)
        idx = tables[f"idx{i}"]
        below = (
            idx.where(F.col(f"idx{i}") < F.lit(d_i))
            .orderBy(F.col(f"idx{i}").desc(), F.col(id_col).asc())
            .limit(docs_per_side)
            .select(id_col)
        )
        above = (
            idx.where(F.col(f"idx{i}") > F.lit(d_i))
            .orderBy(F.col(f"idx{i}").asc(), F.col(id_col).asc())
            .limit(docs_per_side)
            .select(id_col)
        )
        sides.extend([below, above])
    cands = sides[0]
    for s in sides[1:]:
        cands = cands.unionByName(s)
    # no dropDuplicates: left_semi already ignores duplicate right-side
    # keys (the Set-union dedup is implicit in the join semantics)
    hits = tables["base"].join(F.broadcast(cands), id_col, "left_semi")
    return (
        with_distance(hits, query_vec, vec_col)
        .select(id_col, "distance")
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ann_index_similarity(
    df: DataFrame,
    query_vec: list[float],
    pivots: list[list[float]],
    k: int = TOP_K,
    docs_per_side: int = DOCS_PER_INDEX_SIDE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    precomputed: bool = False,
) -> DataFrame:
    """Pivot-neighborhood ANN (reference src/search.ts:56-109).

    Per pivot i, take the ``docs_per_side`` nearest index entries strictly
    below d_i (idx desc) and strictly above d_i (idx asc) — the reference's
    two Mango queries with $lt / $gt + limit (src/search.ts:63-82) — then
    union-dedup, exact re-rank, top-k.

    Each side compiles to TakeOrderedAndProject(docs_per_side): partial
    top-k per partition, no full shuffle.  2·n_pivots bounded mini-scans
    of a single (cached or columnar) source.
    """
    src = df if precomputed else build_pivot_index(df, pivots, vec_col)
    keep = [id_col, vec_col]
    sides: list[DataFrame] = []
    for i, p in enumerate(pivots):
        d_i = _py_euclid(p, query_vec)
        below = (
            src.where(F.col(f"idx{i}") < F.lit(d_i))
            .orderBy(F.col(f"idx{i}").desc(), F.col(id_col).asc())
            .limit(docs_per_side)
            .select(*keep)
        )
        above = (
            src.where(F.col(f"idx{i}") > F.lit(d_i))
            .orderBy(F.col(f"idx{i}").asc(), F.col(id_col).asc())
            .limit(docs_per_side)
            .select(*keep)
        )
        sides.extend([below, above])
    cands = sides[0]
    for s in sides[1:]:
        cands = cands.unionByName(s)
    cands = cands.dropDuplicates([id_col])
    return (
        with_distance(cands, query_vec, vec_col)
        .select(id_col, "distance")
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


def _js_number_to_string(x: float) -> str:
    """ECMA-262 ``Number::toString(10)``: shortest-roundtrip digits in
    decimal notation, switching to exponential only below 1e-6 or at/above
    1e21 (Python's repr switches to scientific already below 1e-4, so repr
    alone diverges from JS for bounds in [1e-7, 1e-5))."""
    if x == 0.0:
        return "0"
    sign = "-" if x < 0 else ""
    s = repr(abs(float(x)))  # shortest roundtrip digits
    if "e" in s:
        mant, _, ex = s.partition("e")
        e10 = int(ex)
    else:
        mant, e10 = s, 0
    int_part, _, frac = mant.partition(".")
    if int_part == "0":
        lead = len(frac) - len(frac.lstrip("0"))
        digits = frac.lstrip("0")
        e10 += -lead - 1
    else:
        digits = (int_part + frac).rstrip("0") or "0"
        e10 += len(int_part) - 1
    digits = digits.rstrip("0") or "0"
    k, n = len(digits), e10 + 1  # value = 0.<digits> * 10^n
    if k <= n <= 21:
        return sign + digits + "0" * (n - k)
    if 0 < n <= 21:
        return sign + digits[:n] + "." + digits[n:]
    if -6 < n <= 0:
        return sign + "0." + "0" * (-n) + digits
    # exponential, JS style: '5e-7', '1.5e+21'
    mant_js = digits[0] + ("." + digits[1:] if k > 1 else "")
    return f"{sign}{mant_js}e{'+' if n - 1 >= 0 else '-'}{abs(n - 1)}"


def _py_index_string(nr: float) -> str:
    """Driver-side mirror of index_nr_to_string (JS
    ``((nr*10)+'').slice(0,10).padEnd(10,'0')``, src/database.ts:223-225),
    using the JS-faithful number formatter so bounds in the sub-1e-4
    regime (and negative bounds, whose '-' consumes a key char exactly as
    in JS) encode identically to the reference."""
    return _js_number_to_string(nr * 10.0)[:10].ljust(10, "0")


def ann_index_range_compat(
    df: DataFrame,
    query_vec: list[float],
    pivots: list[list[float]],
    k: int = TOP_K,
    index_distance: float = INDEX_DISTANCE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    precomputed: bool = False,
) -> DataFrame:
    """STRING-key range ANN — the mode the reference actually executes:
    src/search.ts:27-36 range-scans the lexicographic ``idxN`` string
    index with string bounds built by indexNrToString.  Faithfully
    reproduces the §1.3 quirk: string comparison mis-orders across
    integer-digit-count regimes ('9.50000000' > '14.1000000'), so whenever
    (lo, hi) spans such a boundary the candidate set DIVERGES from the
    double-key mode (``ann_index_range``, the consciously-fixed scale
    path).  tests/test_knn.py::test_compat_string_range_divergence pins
    the divergence down."""
    src = df if precomputed else build_pivot_index(
        df, pivots, vec_col, compat_strings=True
    )
    cond = None
    for i, p in enumerate(pivots):
        d_i = _py_euclid(p, query_vec)
        lo = _py_index_string(d_i - d_i * index_distance)
        hi = _py_index_string(d_i + d_i * index_distance)
        c = (F.col(f"idx{i}_str") > F.lit(lo)) & (F.col(f"idx{i}_str") < F.lit(hi))
        cond = c if cond is None else (cond | c)
    return (
        with_distance(src.where(cond), query_vec, vec_col)
        .select(id_col, "distance")
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


def knn_batch(
    emb: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id: str = "query_id",
    q_vec: str = "qvec",
) -> DataFrame:
    """Batch exact kNN: top-k per query for a WHOLE SET of query vectors
    in one job (the reference searches one query at a time,
    src/search.ts:5-17; batching is the Spark-natural extension every
    training pipeline needs for e.g. eval-set retrieval).

    Plan: broadcast the small query table, ONE corpus scan computes every
    (query, row) distance JVM-side, per-query top-k via a row_number
    window whose rank filter Catalyst rewrites into a two-phase
    ``WindowGroupLimit`` (InferWindowGroupLimit, Spark 3.5+): the
    *Partial* limit runs BELOW the exchange, so each map partition emits
    at most k rows per query and only parts x |Q| x k skinny
    (query_id, id, distance) survivors ever cross the wire — the batch
    analog of ``exact_knn``'s TakeOrderedAndProject, with no full-corpus
    shuffle at any scale (plan-pinned by
    tests/test_plans.py::test_knn_batch_partial_group_limit).  The corpus
    is read once for the whole batch instead of |Q| times; for large
    corpora pre-prune candidates with the stored IVF assignment instead
    (ann_scale.ivf_batch_search) so the scan side never fans out by |Q|.
    Output: (query_id, id, distance)."""
    from pyspark.sql.window import Window

    scored = emb.crossJoin(F.broadcast(queries)).select(
        q_id,
        id_col,
        F.round(euclidean_distance(F.col(vec_col), F.col(q_vec)), 6).alias(
            "distance"
        ),
    )
    w = Window.partitionBy(q_id).orderBy(
        F.col("distance").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(q_id, id_col, "distance")
    )


def candidate_count(
    df: DataFrame,
    query_vec: list[float],
    pivots: list[list[float]],
    index_distance: float = INDEX_DISTANCE,
    vec_col: str = "embedding",
    precomputed: bool = False,
) -> int:
    """docReads analog: rows touched by the range-ANN candidate predicate
    (reference tracks docReads per search, src/search.ts:38,52)."""
    src = df if precomputed else build_pivot_index(df, pivots, vec_col)
    cond = None
    for i, p in enumerate(pivots):
        d_i = _py_euclid(p, query_vec)
        lo, hi = d_i - d_i * index_distance, d_i + d_i * index_distance
        c = (F.col(f"idx{i}") > F.lit(lo)) & (F.col(f"idx{i}") < F.lit(hi))
        cond = c if cond is None else (cond | c)
    return src.where(cond).count()


# ---------------------------------------------------------------------------
# MMR diversified re-ranking
# ---------------------------------------------------------------------------

MMR_POOL = 20
MMR_K = 5
#: trade-off weight 1/2 — an EXACT binary fraction, so lambda*x is a
#: pure halving with no rounding on either engine
MMR_LAMBDA_NUM, MMR_LAMBDA_DEN = 1, 2


def mmr_rerank(
    emb: DataFrame,
    qvec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    pool: int = MMR_POOL,
    k: int = MMR_K,
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein '98):
    from the top-``pool`` cosine candidates, greedily pick ``k`` items
    maximizing 0.5*rel(q,c) - 0.5*max_sim(c, selected) — the diversity
    pass a RAG retriever runs after ANN so the k contexts aren't k
    near-copies.  Output: (rank, vec_id, rel).

    Shape: the candidate pool is ONE TakeOrderedAndProject over the
    corpus (the only corpus-scale work); each of the k-1 greedy rounds
    is an argmax over <= pool rows with the already-selected vectors
    inlined as literals (the ann_scale literal-fold idiom), costing one
    bounded driver row per round — same contract as the BPE trainer's
    per-round argmax.  Determinism: rel and pairwise sims are the same
    sequential HOF folds the distance queries hash-match on; lambda=1/2
    halves exactly; argmax ties break on the id."""
    from javascript_vector_database_spark.functions.vector import (
        cosine_similarity,
    )

    qlit = lit_double_array(qvec)
    cand = (
        emb.select(
            F.col(id_col),
            F.col(vec_col),
            cosine_similarity(F.col(vec_col), qlit).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), F.col(id_col).asc())
        .limit(pool)
        .cache()
    )
    first = cand.orderBy(F.col("rel").desc(), F.col(id_col).asc()).limit(1).collect()[0]
    selected = [(first[id_col], [float(x) for x in first[vec_col]], float(first["rel"]))]
    for _ in range(k - 1):
        sims = [
            cosine_similarity(
                F.col(vec_col), lit_double_array(vec)
            )
            for _sid, vec, _r in selected
        ]
        maxsim = sims[0]
        for s in sims[1:]:
            maxsim = F.greatest(maxsim, s)
        score = (
            F.col("rel") * MMR_LAMBDA_NUM / MMR_LAMBDA_DEN
            - maxsim * (MMR_LAMBDA_DEN - MMR_LAMBDA_NUM) / MMR_LAMBDA_DEN
        )
        nxt = (
            cand.where(~F.col(id_col).isin([sid for sid, _v, _r in selected]))
            .orderBy(score.desc(), F.col(id_col).asc())
            .limit(1)
            .collect()
        )
        if not nxt:
            break
        r = nxt[0]
        selected.append(
            (r[id_col], [float(x) for x in r[vec_col]], float(r["rel"]))
        )
    spark = emb.sparkSession
    out = spark.createDataFrame(
        [(i + 1, sid, rel) for i, (sid, _v, rel) in enumerate(selected)],
        ["rank", id_col, "rel"],
    )
    return out.select("rank", id_col, F.round("rel", 6).alias("rel"))
