"""Generate fixtures/centroids_384.parquet — the TRAINED coarse-quantizer
centroids for the reference-geometry fixture.

The registered `ann_ivf_384` row originally used the hash-order centroid
SAMPLE (oracle-reproducible in pure SQL, but recall@10 = 0.46 on the
clustered fixture at nprobe=4); MLlib k-means‖ centroids measure 0.88 at
the identical probe width (BENCH r7 extras).  k-means itself is not
SQL-reproducible (the fit depends on partitioning), so this script applies
the same decoupling `tools/make_fixture_384.py` used for the embedding
model: train ONCE, export the centers to a committed parquet, and let BOTH
engines read the identical file — Spark inlines the rows as literals for
the scan-local argmin fold, the DuckDB oracle `read_parquet`s them into
its assignment CTE.  This mirrors the 100 TB deployment shape exactly:
centroids are a write-time artifact persisted beside the table, never
re-derived per query.

Run from the repo root: ``python tools/make_centroids_384.py``.
Output is committed; this script documents its provenance.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

K = 16
SEED = 42
MAX_ITER = 20


def main() -> None:
    from javascript_vector_database_spark import get_spark
    from javascript_vector_database_spark.operators.ann_scale import (
        ivf_kmeans_centroids,
    )
    from javascript_vector_database_spark.registry.ref_geometry import (
        FIXTURE_PATH,
    )

    spark = get_spark(app_name="make_centroids_384")
    emb = spark.read.parquet(FIXTURE_PATH)
    cents = ivf_kmeans_centroids(emb, k=K, seed=SEED, max_iter=MAX_ITER)

    out = os.path.join(os.path.dirname(__file__), "..", "fixtures")
    table = pa.table(
        {
            "cid": pa.array([cid for cid, _ in cents], pa.int64()),
            "cemb": pa.array(
                [c for _, c in cents], pa.list_(pa.float64())
            ),
        }
    )
    path = os.path.join(out, "centroids_384.parquet")
    pq.write_table(table, path, compression="zstd")
    print(f"wrote {path}: {len(cents)} centroids x {len(cents[0][1])} dims")
    spark.stop()


if __name__ == "__main__":
    main()
