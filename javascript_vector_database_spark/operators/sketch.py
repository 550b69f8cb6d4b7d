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
