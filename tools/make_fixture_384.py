"""Generate fixtures/embeddings_384.parquet — the reference-geometry
embedding fixture (384 dims = the reference's default MiniLM model,
reference src/vector.ts:8-19 `Xenova/all-MiniLM-L6-v2`).

sentence-transformers is not installable in this environment, so the
real-model branch of functions/embedding.py has never executed; this
fixture is the reference's own precomputed-embeddings decoupling
(src/database.ts:147-158 loads `embeddings.json` instead of embedding at
import time) applied to tests: unit-L2 384-dim float32 vectors with
MiniLM-like cluster structure (semantic corpora are clustered, not iid),
deterministic from a fixed seed.

Run from the repo root: ``python tools/make_fixture_384.py``.
Output is committed; this script only documents its provenance.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_ROWS = 2000
DIM = 384
N_CLUSTERS = 16
#: within-cluster noise scale — chosen so nearest-neighbor structure is
#: dominated by cluster membership (like sentence embeddings of topical
#: documents) while pivot distances still spread enough for the ±0.3%
#: compat range bands to select non-trivial candidate sets
SIGMA = 0.35
SEED = 7


def main() -> None:
    rng = np.random.RandomState(SEED)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, N_CLUSTERS, size=N_ROWS)
    pts = centers[assign] + SIGMA * rng.standard_normal((N_ROWS, DIM))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts = pts.astype(np.float32)

    out = os.path.join(os.path.dirname(__file__), "..", "fixtures")
    os.makedirs(out, exist_ok=True)
    table = pa.table(
        {
            "vec_id": pa.array(range(N_ROWS), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in pts], pa.list_(pa.float32())
            ),
            "label": pa.array(assign.tolist(), pa.int32()),
        }
    )
    path = os.path.join(out, "embeddings_384.parquet")
    pq.write_table(table, path, compression="zstd")
    print(f"wrote {path}: {N_ROWS} rows x {DIM} dims")


if __name__ == "__main__":
    main()
