"""Scale-path ANN: IVF coarse quantization and random-hyperplane LSH.

The reference's pivot-distance index (5 pivots, range/neighborhood scans)
is a fixed-pivot coarse quantizer.  These two operators are its
100 TB-scale generalizations (SURVEY §2.8 "BucketedRandomProjectionLSH as
the scalable generalization"):

* **IVF**: partition vectors by nearest centroid; a query probes only the
  ``nprobe`` nearest cells.  Centroids are deterministic data rows
  (vec_id % step == 0) so the DuckDB oracle can reproduce the exact
  assignment.  At scale: write the table partitioned by ``ivf_cell`` —
  probing prunes whole partitions before any scan.
* **Hyperplane LSH**: sign-bit bucket of dot products against seeded
  hyperplanes; bucket-equality join gives candidates in one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from javascript_vector_database_spark.functions.vector import dot, euclidean_distance
from javascript_vector_database_spark.operators.knn import _py_euclid, _qvec_lit
from javascript_vector_database_spark.pivots import TOP_K, make_pivots

IVF_STEP = 50  # centroids = rows with vec_id % IVF_STEP == 0
N_PROBE = 2
LSH_SEED = 7
LSH_BITS = 8


def ivf_centroids(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
                  step: int = IVF_STEP) -> DataFrame:
    return emb.where(F.col(id_col) % step == 0).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cemb")
    )


def ivf_assign(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    step: int = IVF_STEP,
) -> DataFrame:
    """Assign every vector to its nearest centroid: broadcast the (small)
    centroid set, per-row argmin via min_by — one pass, no shuffle of the
    big side beyond the final groupBy on (id)."""
    cents = ivf_centroids(emb, id_col, vec_col, step)
    d = euclidean_distance(F.col(vec_col), F.col("cemb"))
    return (
        emb.join(F.broadcast(cents))
        .groupBy(id_col)
        .agg(F.min_by(F.col("cid"), d).alias("ivf_cell"))
    )


def ivf_search(
    emb: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    step: int = IVF_STEP,
    nprobe: int = N_PROBE,
    k: int = TOP_K,
) -> DataFrame:
    """Probe the nprobe nearest cells, exact-rank inside them.  With the
    assignment precomputed and the table partitioned by cell, the WHERE
    ivf_cell IN (...) prunes partitions before any scan."""
    cents = ivf_centroids(emb, id_col, vec_col, step).collect()
    probed = sorted(
        ((_py_euclid(list(r["cemb"]), query_vec), r["cid"]) for r in cents)
    )[:nprobe]
    probe_ids = [cid for _, cid in probed]
    assign = ivf_assign(emb, id_col, vec_col, step)
    return (
        emb.join(assign, id_col)
        .where(F.col("ivf_cell").isin(probe_ids))
        .withColumn(
            "distance",
            F.round(euclidean_distance(F.col(vec_col), _qvec_lit(query_vec)), 6),
        )
        .select(id_col, "distance")
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


def hyperplanes(dim: int, bits: int = LSH_BITS, seed: int = LSH_SEED) -> list[list[float]]:
    return make_pivots(dim, n=bits, seed=seed)


def lsh_bucket(vec: Column | str, planes: list[list[float]]) -> Column:
    """Sign-bit bucket string: '1' where dot(v, h_j) > 0 else '0'."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    bits = [
        F.when(dot(vec, _qvec_lit(h)) > 0, F.lit("1")).otherwise(F.lit("0"))
        for h in planes
    ]
    return F.concat(*bits)


def lsh_bucket_table(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = LSH_BITS,
    seed: int = LSH_SEED,
    dim: int | None = None,
) -> DataFrame:
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    planes = hyperplanes(dim, bits, seed)
    return emb.select(F.col(id_col), lsh_bucket(F.col(vec_col), planes).alias("bucket"))
