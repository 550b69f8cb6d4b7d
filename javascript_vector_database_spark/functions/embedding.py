"""Text -> embedding column (reference getVectorFromText, src/vector.ts:24-39).

The reference runs `Xenova/all-MiniLM-L6-v2` (tokenize -> transformer ->
mean-pool -> L2-normalize) in a pool of Web Workers.  On Spark the executor
fleet IS the worker pool: a vectorized pandas UDF embeds whole Arrow
batches per partition; parallelism = partitions, exactly replacing the
reference's round-robin worker scheduler (src/worker-scheduler.ts:5-26).

The transformer runtime is not available in this container, so the model
call is stubbed with a DETERMINISTIC fake: md5(text)-seeded Gaussian unit
vector.  The Spark-side plumbing — Arrow batching, schema, normalization,
determinism — is real and tested; swap ``_fake_model_batch`` for a
sentence-transformers call (same public weights as the reference) to get
real embeddings.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DIM = 64  # test-data dimension; the reference model uses 384


def _fake_model_batch(texts: pd.Series, dim: int) -> list[list[float]]:
    """Deterministic stand-in for the MiniLM feature-extraction pipeline.
    Replace with: model.encode(texts.tolist(), normalize_embeddings=True).
    """
    out = []
    for t in texts:
        seed = int.from_bytes(hashlib.md5((t or "").encode()).digest()[:4], "big")
        rng = np.random.RandomState(seed)
        v = rng.standard_normal(dim)
        v = v / np.sqrt((v * v).sum())
        out.append([float(x) for x in v])
    return out


def embed_udf(dim: int = DEFAULT_DIM):
    """Arrow-batched embedding UDF returning unit-norm array<float>."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        return pd.Series(_fake_model_batch(texts, dim))

    return _embed
