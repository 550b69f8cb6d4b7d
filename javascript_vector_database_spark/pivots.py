"""Deterministic pivot vectors for the distance-to-pivot ANN index.

The reference hard-codes 10 unit-norm pivot vectors valid only for its
default embedding model and uses the first 5 (reference src/vector.ts:41-43,
src/search.ts:24).  Our pivots are model-free: seeded Gaussian unit vectors
(seed 42), a function of (dim, n, seed) so Spark plans and DuckDB oracle SQL
derive bit-identical literals.  At cluster scale pivots are tiny and are
inlined as literals / broadcast — never a join.
"""

from __future__ import annotations

import numpy as np

N_PIVOTS_TOTAL = 10  # reference hard-codes 10 ...
N_PIVOTS_USED = 5  # ... and uses 5 (src/search.ts:24,61)
PIVOT_SEED = 42

#: ANN range width: ± distance * 0.003 (reference src/search.ts:20,27)
INDEX_DISTANCE = 0.003
#: ANN neighborhood: 100 docs per side per pivot (src/search.ts:57)
DOCS_PER_INDEX_SIDE = 100
#: top-k (src/search.ts:14,51,107)
TOP_K = 10


def make_pivots(dim: int, n: int = N_PIVOTS_TOTAL, seed: int = PIVOT_SEED) -> list[list[float]]:
    """n unit-L2 pivot vectors of the given dimension, deterministic.

    float64 end-to-end so the Python literals embedded into Spark and
    DuckDB expressions are the same bits.
    """
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        v = rng.standard_normal(dim)
        v = v / np.sqrt((v * v).sum())
        out.append([float(x) for x in v])
    return out


def pivot_sql_literal(vec: list[float]) -> str:
    """A DuckDB/Spark SQL array literal with full round-trip precision."""
    return "[" + ", ".join(repr(x) for x in vec) + "]"
