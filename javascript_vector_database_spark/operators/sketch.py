"""KMV (K-minimum-values) distinct-count sketch.

A cardinality sketch in the HyperLogLog family, chosen over HLL because it
is DETERMINISTIC and engine-portable: both Spark and DuckDB hash with md5,
keep the K smallest hash fractions, and apply the same estimator — so the
estimate is exactly oracle-checkable, unlike ``approx_count_distinct``
whose HLL++ register layout is engine-private.

Estimator (Bar-Yossef et al.): with hash values uniform on [0,1), the
K-th smallest value f_K of n distinct hashes ≈ K/n, so
``n̂ = (K-1)/f_K`` (the unbiased variant).  When fewer than K distinct
values exist the sketch IS the exact distinct set.

Scale shape: md5 is scan-side; the distinct-by-hash is a groupBy with
map-side partial aggregation (the shuffle carries ≤ one row per distinct
value per partition — for a 100 TB event table with a bounded key domain
that is tiny), and the K-minimum merge is TakeOrderedAndProject (per
partition heap of K, K-row driver merge).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 64


def hash_frac(col: Column | str) -> Column:
    """Uniform [0,1) fraction from the first 8 md5 hex chars — identical
    in DuckDB: ('0x' || substr(md5(v), 1, 8))::BIGINT / 2^32."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) / F.lit(float(2**32))


def kmv_distinct_estimate(
    df: DataFrame, col: str, k: int = DEFAULT_K
) -> DataFrame:
    """One-row DataFrame: (kmv_estimate double, k_used bigint).

    ``kmv_estimate`` is rounded to 6 decimals; ``k_used`` is the number of
    sketch slots actually filled (= exact distinct count when < k)."""
    fracs = (
        df.select(hash_frac(col).alias("f"))
        .groupBy("f")
        .agg(F.lit(1))
        .select("f")
        .orderBy(F.col("f").asc())
        .limit(k)
    )
    return fracs.agg(
        F.round(
            F.when(
                F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
            ).otherwise(F.lit(float(k - 1)) / F.max("f")),
            6,
        ).alias("kmv_estimate"),
        F.count(F.lit(1)).cast("long").alias("k_used"),
    )


def sql_kmv_distinct_estimate(table: str, col: str, k: int = DEFAULT_K) -> str:
    """DuckDB oracle for kmv_distinct_estimate over ``table.col``."""
    frac = (
        f"(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8))::BIGINT"
        f" / 4294967296.0)"
    )
    return f"""
WITH fracs AS (
  SELECT DISTINCT {frac} AS f FROM {table}
),
kmin AS (SELECT f FROM fracs ORDER BY f ASC LIMIT {k})
SELECT round(CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
             ELSE {float(k - 1)} / max(f) END, 6) AS kmv_estimate,
       CAST(count(*) AS BIGINT) AS k_used
FROM kmin
"""


# ---------------------------------------------------------------------------
# HyperLogLog — deterministic, engine-portable registers
# ---------------------------------------------------------------------------

#: register-index bits: m = 256 registers (~6.5% relative standard error)
HLL_B = 8
HLL_M = 1 << HLL_B
#: rank field width: 13 hex chars = 52 bits of w, so rho ∈ [1, 53] and
#: every 2^(53-rho) register contribution is an exact BIGINT
HLL_W_BITS = 52
#: Flajolet et al. 2007 bias constant for m >= 128
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_distinct_estimate(df: DataFrame, col: str) -> DataFrame:
    """One-row (hll_estimate double, hll_zero_registers bigint).

    Classic HyperLogLog (Flajolet et al. 2007) with DETERMINISTIC
    registers, same discipline as KMV: Spark's ``approx_count_distinct``
    is HLL++ with an engine-private register layout, so its estimate can
    never be oracle-checked; here both engines derive bucket (first 2 md5
    hex chars) and rank (leading zeros of the next 52 bits, via the
    shared ``length(bin(w))`` construction) identically.

    Determinism details:

    * register contributions are summed as EXACT integers
      (``2^(53-rho)`` ≤ 2^52 each, total ≤ 2^61) — a double sum of mixed
      magnitudes would be shuffle-order-dependent in the last ulp;
    * the one remaining transcendental (``ln`` in the small-range linear
      counting branch) is evaluated on the same (m, zero-count) integers
      in both engines and the output is rounded to 4 decimals, absorbing
      any cross-libm last-ulp difference.

    Scale shape vs KMV: the shuffle carries at most m=256 (bucket, max)
    rows per partition regardless of cardinality (KMV's distinct-by-hash
    carries one row per distinct value per partition); registers merge by
    ``max``, so the sketch is trivially mergeable across days/sources.
    """
    h = F.md5(F.col(col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    w = F.conv(F.substring(h, 3, 13), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.bin(w))
    )
    regs = (
        df.select(bucket.alias("b"), rho.alias("r"))
        .groupBy("b")
        .agg(F.max("r").alias("M"))
    )
    two53 = 2 ** (HLL_W_BITS + 1)
    agg = regs.agg(
        F.coalesce(
            F.sum(
                F.pow(F.lit(2.0), F.lit(HLL_W_BITS + 1) - F.col("M")).cast("long")
            ),
            F.lit(0).cast("long"),
        ).alias("s"),
        F.count(F.lit(1)).alias("v"),
    )
    zeros = (F.lit(HLL_M) - F.col("v")).cast("long")
    total = F.col("s") + zeros * F.lit(two53)
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M * float(two53)) / total
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
    ).otherwise(raw)
    return agg.select(
        F.round(est, 4).alias("hll_estimate"),
        zeros.alias("hll_zero_registers"),
    )


def sql_hll_distinct_estimate(table: str, col: str) -> str:
    """DuckDB oracle for :func:`hll_distinct_estimate` — same buckets,
    ranks, integer register sum, correction branch, and rounding."""
    two53 = 2 ** (HLL_W_BITS + 1)
    h = f"md5(CAST({col} AS VARCHAR))"
    bucket = f"('0x' || substr({h}, 1, 2))::BIGINT"
    w = f"('0x' || substr({h}, 3, 13))::BIGINT"
    return f"""
WITH regs AS (
  SELECT {bucket} AS b,
         max(CASE WHEN {w} = 0 THEN {HLL_W_BITS + 1}
             ELSE {HLL_W_BITS + 1} - length(bin({w})) END) AS M
  FROM {table}
  GROUP BY 1
),
agg AS (
  SELECT coalesce(CAST(sum(CAST(pow(2, {HLL_W_BITS + 1} - M) AS BIGINT))
                       AS BIGINT), 0) AS s,
         count(*) AS v
  FROM regs
),
tot AS (
  SELECT s + ({HLL_M} - v) * {two53} AS total,
         CAST({HLL_M} - v AS BIGINT) AS zeros
  FROM agg
)
SELECT round(CASE WHEN ({HLL_ALPHA * HLL_M * HLL_M * float(two53)!r} / total)
                       <= {2.5 * HLL_M}
                  AND zeros > 0
             THEN {float(HLL_M)} * ln({float(HLL_M)} / zeros)
             ELSE {HLL_ALPHA * HLL_M * HLL_M * float(two53)!r} / total END,
             4) AS hll_estimate,
       zeros AS hll_zero_registers
FROM tot
"""


def hll_registers(df: DataFrame, col: str, group_cols: list[str] | None = None) -> DataFrame:
    """The persistable sketch: (group_cols..., b, M) register rows — at
    most m=256 per group regardless of cardinality.  This is the 100 TB
    pattern the one-shot estimator can't give you: materialize per-day /
    per-source register tables once at ingest, then answer any distinct
    count over any group combination by MERGING registers (max per
    bucket, :func:`hll_estimate_from_registers`) — no rescan of the raw
    events, and the merge input is registers, not data."""
    h = F.md5(F.col(col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    w = F.conv(F.substring(h, 3, 13), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.bin(w))
    )
    gcols = [F.col(g) for g in (group_cols or [])]
    return (
        df.select(*gcols, bucket.alias("b"), rho.alias("r"))
        .groupBy(*gcols, "b")
        .agg(F.max("r").alias("M"))
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Fold (merged) register rows into per-group estimates — the same
    integer-sum + linear-counting math as :func:`hll_distinct_estimate`
    (which is exactly ``hll_estimate_from_registers(hll_registers(df))``
    for the ungrouped case).  Register tables for DIFFERENT slices merge
    by simply unioning them and re-maxing per bucket first."""
    gcols = [F.col(g) for g in (group_cols or [])]
    merged = regs.groupBy(*gcols, "b").agg(F.max("M").alias("M"))
    two53 = 2 ** (HLL_W_BITS + 1)
    agg = merged.groupBy(*gcols).agg(
        F.coalesce(
            F.sum(
                F.pow(F.lit(2.0), F.lit(HLL_W_BITS + 1) - F.col("M")).cast("long")
            ),
            F.lit(0).cast("long"),
        ).alias("s"),
        F.count(F.lit(1)).alias("v"),
    )
    zeros = (F.lit(HLL_M) - F.col("v")).cast("long")
    total = F.col("s") + zeros * F.lit(two53)
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M * float(two53)) / total
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
    ).otherwise(raw)
    return agg.select(
        *(group_cols or []),
        F.round(est, 4).alias("hll_estimate"),
        zeros.alias("hll_zero_registers"),
    )


def sql_hll_grouped_estimate(table: str, col: str, group_col: str) -> str:
    """DuckDB oracle for per-group register estimates (mirror of
    ``hll_estimate_from_registers(hll_registers(df, col, [g]), [g])``)."""
    two53 = 2 ** (HLL_W_BITS + 1)
    h = f"md5(CAST({col} AS VARCHAR))"
    bucket = f"('0x' || substr({h}, 1, 2))::BIGINT"
    w = f"('0x' || substr({h}, 3, 13))::BIGINT"
    alpha_num = repr(HLL_ALPHA * HLL_M * HLL_M * float(two53))
    return f"""
WITH regs AS (
  SELECT {group_col} AS g, {bucket} AS b,
         max(CASE WHEN {w} = 0 THEN {HLL_W_BITS + 1}
             ELSE {HLL_W_BITS + 1} - length(bin({w})) END) AS M
  FROM {table}
  GROUP BY 1, 2
),
agg AS (
  SELECT g,
         coalesce(CAST(sum(CAST(pow(2, {HLL_W_BITS + 1} - M) AS BIGINT))
                       AS BIGINT), 0) AS s,
         count(*) AS v
  FROM regs
  GROUP BY g
),
tot AS (
  SELECT g, s + ({HLL_M} - v) * {two53} AS total,
         CAST({HLL_M} - v AS BIGINT) AS zeros
  FROM agg
)
SELECT g AS {group_col},
       round(CASE WHEN ({alpha_num} / total) <= {2.5 * HLL_M} AND zeros > 0
             THEN {float(HLL_M)} * ln({float(HLL_M)} / zeros)
             ELSE {alpha_num} / total END, 4) AS hll_estimate,
       zeros AS hll_zero_registers
FROM tot
"""


# ---------------------------------------------------------------------------
# Count-Min sketch — deterministic, engine-portable counters
# ---------------------------------------------------------------------------

#: depth (independent hash rows) and width (counters per row)
CMS_D = 4
CMS_W = 1024


def _md5_pair(c: Column) -> tuple[Column, Column]:
    """The two 32-bit ints of md5(value) — the same Kirsch-Mitzenmacher
    double-hashing material as dedup.shingle_hash_pairs, so row i's hash
    is (v1 + i*v2) mod W with no overflow (v < 2^32, i < CMS_D)."""
    h = F.md5(c.cast("string"))
    v1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    v2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return v1, v2


def cms_counters(
    items: DataFrame, col: str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """The sketch itself: (i, pos, cnt) counter cells, one row per
    OCCUPIED cell (≤ d*w rows total, absent cells are zero).

    Scale shape: the d-way fan-out is a row-local explode; the only
    shuffle is the (i, pos) groupBy whose key domain is d*w — partial
    map-side aggregation collapses each partition to ≤ d*w rows no
    matter how many item occurrences it holds, and two sketches built
    from disjoint splits merge by summing cells (counters are exact
    integer counts, so the merged sketch is bit-identical to a one-shot
    build — same discipline as the HLL registers above)."""
    v1, v2 = _md5_pair(F.col(col))
    rows = items.select(
        v1.alias("__v1"),
        v2.alias("__v2"),
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("i"),
    )
    return (
        rows.select(
            "i", ((F.col("__v1") + F.col("i") * F.col("__v2")) % w).alias("pos")
        )
        .groupBy("i", "pos")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame, queries: DataFrame, col: str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Point-frequency estimates for the query values: (col, est_count).

    est = min over the d rows of the addressed counters; a missing cell
    reads as 0 (the min of anything with 0 is 0 — how an absent value
    correctly estimates to 0).  The join is a broadcast equi-join on
    (i, pos) — the sketch is ≤ d*w rows by construction, so probing any
    number of queries never shuffles them."""
    v1, v2 = _md5_pair(F.col(col))
    qpos = queries.select(
        F.col(col),
        v1.alias("__v1"),
        v2.alias("__v2"),
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("i"),
    ).select(col, "i", ((F.col("__v1") + F.col("i") * F.col("__v2")) % w).alias("pos"))
    return (
        qpos.join(F.broadcast(counters), ["i", "pos"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est_count"))
    )


def sql_cms_token_freq(
    table: str,
    text_sql_tokens: str,
    query_tokens: tuple[str, ...],
    d: int = CMS_D,
    w: int = CMS_W,
) -> str:
    """DuckDB oracle for the token-frequency CMS query: mirrors the full
    build + probe + exact-comparison construction."""
    qlist = ", ".join(f"'{t}'" for t in query_tokens)
    v1 = "('0x' || substr(md5(tok), 1, 8))::BIGINT"
    v2 = "('0x' || substr(md5(tok), 9, 8))::BIGINT"
    return f"""
WITH toks AS (SELECT unnest({text_sql_tokens}) AS tok FROM {table}),
h AS (SELECT tok, {v1} AS v1, {v2} AS v2 FROM toks),
cells AS (
  SELECT k AS i, (v1 + k * v2) % {w} AS pos, CAST(count(*) AS BIGINT) AS cnt
  FROM h, LATERAL unnest(range(0, {d})) AS t(k)
  GROUP BY 1, 2
),
q AS (SELECT unnest([{qlist}]) AS tok),
qh AS (SELECT tok, {v1} AS v1, {v2} AS v2 FROM q),
qpos AS (SELECT tok, k AS i, (v1 + k * v2) % {w} AS pos
         FROM qh, LATERAL unnest(range(0, {d})) AS t(k)),
est AS (
  SELECT qpos.tok, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est_count
  FROM qpos LEFT JOIN cells c ON c.i = qpos.i AND c.pos = qpos.pos
  GROUP BY 1
),
exact AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_count
          FROM toks WHERE tok IN ({qlist}) GROUP BY 1)
SELECT est.tok, est.est_count, coalesce(exact.exact_count, 0) AS exact_count
FROM est LEFT JOIN exact USING (tok)
"""


# ---------------------------------------------------------------------------
# fixed-bin histogram quantile sketch — mergeable, deterministic
# ---------------------------------------------------------------------------

#: bin width for the n_chars quantile sketch
HIST_Q_BIN = 25
#: probe quantiles as exact fractions (num, den) — never float literals,
#: so the rank thresholds stay integer-exact on both engines
HIST_Q_PROBES = ((1, 2), (9, 10), (99, 100))


def histogram_quantiles(
    df: DataFrame, col: str, bin_width: int = HIST_Q_BIN
) -> DataFrame:
    """(q, bin_lo, est) quantile estimates from a fixed-bin histogram.

    The sketch is the (bin, cnt) histogram — bounded by the value RANGE
    (not the row count), mergeable by summing bins (exact integer
    counts, same discipline as the CMS/HLL sketches), and a one-shuffle
    build with map-side partials.  Quantile lookup happens on the tiny
    sketch: a running-count window locates the covering bin with the
    INTEGER comparison cum*den >= total*num (no float rank), then one
    linear interpolation inside the bin — the only float math, identical
    single-expression IEEE ops on both engines, rounded to 4dp.

    vs percentile_approx: Spark's KLL/GK internals are engine-private;
    this estimate is value-checkable in DuckDB, and the fixed-bin layout
    is what a 100 TB profile actually persists (per-split histograms
    merged later)."""
    from pyspark.sql.window import Window

    hist = (
        df.select(
            # bin_lo = v - pmod(v, bw): PURE-INTEGER floor-division bin
            # start, exact at any BIGINT (Spark's `/` is double division,
            # so floor(v/bw) rounds beyond 2^53; DuckDB's `//` truncates
            # toward zero on negatives — this form sidesteps both, and
            # the oracle mirrors it with v - (((v % bw) + bw) % bw))
            (F.col(col) - F.pmod(F.col(col), F.lit(bin_width)))
            .cast("long")
            .alias("bin_lo")
        )
        .groupBy("bin_lo")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.orderBy("bin_lo").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bin_lo",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy("bin_lo").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    outs = []
    for num, den in HIST_Q_PROBES:
        cand = (
            cum.where(F.col("cum") * den >= F.col("total") * num)
            .orderBy(F.col("bin_lo").asc())
            .limit(1)
        )
        outs.append(
            cand.select(
                F.lit(f"{num}/{den}").alias("q"),
                "bin_lo",
                F.round(
                    F.col("bin_lo")
                    + bin_width
                    * (
                        (F.col("total") * num / F.lit(float(den)))
                        - (F.col("cum") - F.col("cnt"))
                    )
                    / F.col("cnt"),
                    4,
                ).alias("est"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def sql_histogram_quantiles(
    table: str, col: str, bin_width: int = HIST_Q_BIN
) -> str:
    """DuckDB oracle mirroring :func:`histogram_quantiles` exactly."""
    probes = []
    for num, den in HIST_Q_PROBES:
        probes.append(
            f"""
SELECT '{num}/{den}' AS q, bin_lo,
       round(bin_lo + {bin_width} *
             ((total * {num} / {float(den)}) - (cum - cnt)) / cnt, 4) AS est
FROM (SELECT bin_lo, cnt, cum, total FROM cum
      WHERE cum * {den} >= total * {num}
      ORDER BY bin_lo ASC LIMIT 1)"""
        )
    body = "\nUNION ALL".join(probes)
    return f"""
WITH hist AS (
  -- v - (((v % bw) + bw) % bw): integer floor-division bin start (DuckDB
  -- `//` truncates toward zero on negatives; this mirrors Spark's pmod)
  SELECT CAST({col} - ((({col} % {bin_width}) + {bin_width})
                       % {bin_width}) AS BIGINT) AS bin_lo,
         CAST(count(*) AS BIGINT) AS cnt
  FROM {table} GROUP BY 1
),
cum AS (
  SELECT bin_lo, cnt,
         sum(cnt) OVER (ORDER BY bin_lo ASC
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER () AS total
  FROM hist
)
{body}
"""


def grouped_histogram_quantiles(
    df: DataFrame, group_col: str, col: str, bin_width: int = HIST_Q_BIN
) -> DataFrame:
    """(group, q, bin_lo, est): the histogram-quantile sketch per group —
    the persisted per-domain profile (each group's bins merge across
    splits independently, same integer discipline as the global
    :func:`histogram_quantiles`).  The running-count window partitions
    by group, so no single-partition global sort exists at ANY group
    count — this is the form a 100 TB profile actually runs; the global
    sketch is the one-group special case."""
    from pyspark.sql.window import Window

    hist = (
        df.select(
            F.col(group_col).alias("g"),
            # integer floor-division bin — see histogram_quantiles
            (F.col(col) - F.pmod(F.col(col), F.lit(bin_width)))
            .cast("long")
            .alias("bin_lo"),
        )
        .groupBy("g", "bin_lo")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    wg = Window.partitionBy("g")
    w = wg.orderBy("bin_lo").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "g",
        "bin_lo",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wg).alias("total"),
    )
    outs = []
    for num, den in HIST_Q_PROBES:
        wq = Window.partitionBy("g").orderBy(F.col("bin_lo").asc())
        cand = (
            cum.where(F.col("cum") * den >= F.col("total") * num)
            .withColumn("__rn", F.row_number().over(wq))
            .where(F.col("__rn") == 1)
        )
        outs.append(
            cand.select(
                F.col("g").alias(group_col),
                F.lit(f"{num}/{den}").alias("q"),
                "bin_lo",
                F.round(
                    F.col("bin_lo")
                    + bin_width
                    * (
                        (F.col("total") * num / F.lit(float(den)))
                        - (F.col("cum") - F.col("cnt"))
                    )
                    / F.col("cnt"),
                    4,
                ).alias("est"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def sql_grouped_histogram_quantiles(
    table: str, group_col: str, col: str, bin_width: int = HIST_Q_BIN
) -> str:
    """DuckDB oracle mirroring :func:`grouped_histogram_quantiles`."""
    probes = []
    for num, den in HIST_Q_PROBES:
        probes.append(
            f"""
SELECT {group_col}, '{num}/{den}' AS q, bin_lo,
       round(bin_lo + {bin_width} *
             ((total * {num} / {float(den)}) - (cum - cnt)) / cnt, 4) AS est
FROM (SELECT {group_col}, bin_lo, cnt, cum, total,
             row_number() OVER (PARTITION BY {group_col}
                                ORDER BY bin_lo ASC) AS rn
      FROM cum WHERE cum * {den} >= total * {num})
WHERE rn = 1"""
        )
    body = "\nUNION ALL".join(probes)
    return f"""
WITH hist AS (
  SELECT {group_col}, CAST({col} - ((({col} % {bin_width}) + {bin_width})
                           % {bin_width}) AS BIGINT) AS bin_lo,
         CAST(count(*) AS BIGINT) AS cnt
  FROM {table} GROUP BY 1, 2
),
cum AS (
  SELECT {group_col}, bin_lo, cnt,
         sum(cnt) OVER (PARTITION BY {group_col} ORDER BY bin_lo ASC
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (PARTITION BY {group_col}) AS total
  FROM hist
)
{body}
"""


# ---------------------------------------------------------------------------
# KMV / theta-sketch set algebra
# ---------------------------------------------------------------------------


def kmv_union_intersection(
    a: DataFrame, a_col: str, b: DataFrame, b_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """(op, estimate) for op in ('union', 'intersection') — the
    theta-sketch set algebra (Dasgupta et al.) over the deterministic
    KMV hashes:

    * union: the k smallest hashes of A union B ARE the union's KMV
      sketch (mergeability), so n̂_union = (k-1)/f_k as usual;
    * intersection: with theta = f_k from the UNION sketch, every
      distinct hash < theta is a uniform sample of the union, so
      n̂_inter = |{common hashes < theta}| / theta.

    Both estimates derive from the same two distinct-hash tables; all
    thresholds are the deterministic md5 fractions, so the estimates
    hash-match the oracle exactly.  Scale shape: two distinct-by-hash
    aggregates, a TakeOrdered k-row union merge, one broadcast
    semi-join for the common-hash count."""
    fa = a.select(hash_frac(a_col).alias("f")).distinct()
    fb = b.select(hash_frac(b_col).alias("f")).distinct()
    union_k = (
        fa.unionByName(fb).distinct().orderBy(F.col("f").asc()).limit(k)
    )
    theta_row = union_k.agg(
        F.max("f").alias("theta"), F.count(F.lit(1)).alias("kk")
    ).first()
    kk = int(theta_row["kk"])
    spark = a.sparkSession
    if kk == 0:
        # both inputs empty: max() is NULL — the sketch of the empty set
        # estimates 0 for both ops (the oracle's CASE takes the kk<k arm
        # with count 0, so the two engines agree)
        return spark.createDataFrame(
            [("union", 0.0), ("intersection", 0.0)], ["op", "estimate"]
        )
    theta = float(theta_row["theta"])
    if kk < k:
        # fewer than k distinct hashes: the sketch IS the exact union
        union_est = float(kk)
        inter = fa.join(fb, "f", "left_semi").count()
        inter_est = float(inter)
    else:
        union_est = float(k - 1) / theta
        common_below = (
            fa.where(F.col("f") < theta)
            .join(fb.where(F.col("f") < theta), "f", "left_semi")
            .count()
        )
        inter_est = common_below / theta
    return spark.createDataFrame(
        [("union", round(union_est, 6)), ("intersection", round(inter_est, 6))],
        ["op", "estimate"],
    )


def sql_kmv_union_intersection(
    a_table: str, a_col: str, b_table: str, b_col: str, k: int = DEFAULT_K
) -> str:
    """DuckDB oracle mirroring :func:`kmv_union_intersection`."""
    def frac(col):
        return (
            f"(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8))::BIGINT"
            f" / 4294967296.0)"
        )

    return f"""
WITH fa AS (SELECT DISTINCT {frac(a_col)} AS f FROM {a_table}),
fb AS (SELECT DISTINCT {frac(b_col)} AS f FROM {b_table}),
uk AS (SELECT f FROM (SELECT f FROM fa UNION SELECT f FROM fb)
       ORDER BY f ASC LIMIT {k}),
t AS (SELECT max(f) AS theta, count(*) AS kk FROM uk),
common AS (
  SELECT count(*) AS c FROM fa
  WHERE f < (SELECT theta FROM t)
    AND f IN (SELECT f FROM fb WHERE f < (SELECT theta FROM t))
),
common_all AS (SELECT count(*) AS c FROM fa WHERE f IN (SELECT f FROM fb))
SELECT 'union' AS op,
       round(CASE WHEN t.kk < {k} THEN CAST(t.kk AS DOUBLE)
                  ELSE {float(k - 1)} / t.theta END, 6) AS estimate
FROM t
UNION ALL
SELECT 'intersection',
       round(CASE WHEN t.kk < {k} THEN CAST(common_all.c AS DOUBLE)
                  ELSE common.c / t.theta END, 6)
FROM t, common, common_all
"""
