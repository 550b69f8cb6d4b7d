"""Text -> embedding column (reference getVectorFromText, src/vector.ts:24-39).

The reference runs `Xenova/all-MiniLM-L6-v2` (tokenize -> transformer ->
mean-pool -> L2-normalize) in a pool of Web Workers.  On Spark the executor
fleet IS the worker pool: a vectorized pandas UDF embeds whole Arrow
batches per partition; parallelism = partitions, exactly replacing the
reference's round-robin worker scheduler (src/worker-scheduler.ts:5-26).

Model resolution: if ``sentence-transformers`` is importable the real
MiniLM path is used (same public weights as the reference's
`Xenova/all-MiniLM-L6-v2`, src/vector.ts:8-19) whenever the requested
dimension matches the model's 384.  Otherwise — as in this container,
where the transformer runtime is absent — the model call falls back to a
DETERMINISTIC fake: md5(text)-seeded Gaussian unit vector.  The
Spark-side plumbing (Arrow batching, schema, normalization, determinism)
is identical on both branches and fully tested.

Install attempts (the round checklist item): r1-r9 all failed — the
container has no package-index network route (pip: "Name or service not
known", re-verified round 9 for both sentence-transformers and pillow;
round 10 re-probed without side effects: getaddrinfo(pypi.org, 443) and
getaddrinfo(files.pythonhosted.org, 443) both raise "Name or service not
known", and both modules remain unimportable).
Same gate class as PIL for operators/multimodal.py's real decode branch.

VENDORED-WHEEL RECIPE (r11, the no-network unblock path): drop wheels
into a directory and point ``SPARK_GRAFT_WHEEL_DIR`` at it —
``_try_vendored_install()`` below runs exactly
``pip install --no-index --find-links $SPARK_GRAFT_WHEEL_DIR sentence-transformers``
before the import probe, so provisioning the dir is the ONLY step.  The
wheel list (one command on any networked machine of the same
platform/python):

    pip download --dest wheels/ sentence-transformers torch \\
        transformers tokenizers safetensors huggingface-hub numpy

plus the model weights themselves (the reference's checkpoint,
src/vector.ts:8): ``huggingface-cli download
sentence-transformers/all-MiniLM-L6-v2 --local-dir $SPARK_GRAFT_WHEEL_DIR/minilm``
and set ``HF_HUB_OFFLINE=1`` — ``REFERENCE_MODEL`` resolves a local path
first.  Re-probed round 13 (as every round): no SPARK_GRAFT_WHEEL_DIR
present, getaddrinfo still fails for pypi.org and
files.pythonhosted.org, sentence_transformers/PIL still unimportable;
the gate stays warm.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _try_vendored_install() -> None:  # pragma: no cover - env-gated
    """No-network install from a local wheel dir, if provisioned (see
    module docstring).  Silent no-op when the dir is absent — this is
    the one-command unblock path for the real-model branch."""
    wheel_dir = os.environ.get("SPARK_GRAFT_WHEEL_DIR")
    if not wheel_dir or not os.path.isdir(wheel_dir):
        return
    import subprocess
    import sys

    subprocess.run(
        [
            sys.executable, "-m", "pip", "install", "--no-index",
            "--find-links", wheel_dir, "sentence-transformers",
        ],
        check=False,
        capture_output=True,
    )


try:  # pragma: no cover - not installed in this container
    from sentence_transformers import SentenceTransformer

    _HAS_ST = True
except Exception:  # pragma: no cover
    _try_vendored_install()
    try:
        from sentence_transformers import SentenceTransformer

        _HAS_ST = True
    except Exception:
        _HAS_ST = False

DEFAULT_DIM = 64  # test-data dimension; the reference model uses 384
#: the reference's model, public weights (src/vector.ts:8 'Xenova/
#: all-MiniLM-L6-v2' is the transformers.js port of this checkpoint)
REFERENCE_MODEL = "sentence-transformers/all-MiniLM-L6-v2"
REFERENCE_DIM = 384

#: the reference's full selectable model set (src/vector.ts:8-19) with
#: each checkpoint's embedding width (public model cards).  The
#: reference hard-codes its index pivots for the DEFAULT model only
#: (src/vector.ts:41-44, "only for 'Xenova/all-MiniLM-L6-v2'");
#: pivots.make_pivots(dim) here is dim-parametric, so every listed
#: geometry gets a working pivot index for free.  The real-weights
#: branch is wired for the default checkpoint (the only one with a
#: sentence-transformers mirror we can name); the other entries run
#: the deterministic fake at their true width, seeded per (model,
#: text) so distinct models emit distinct spaces — exactly the
#: property a multi-model deployment has to handle (vectors from
#: different models never mix in one index).
MODELS: dict[str, int] = {
    "Xenova/all-MiniLM-L6-v2": 384,
    "Supabase/gte-small": 384,
    "mixedbread-ai/mxbai-embed-large-v1": 1024,
    "jinaai/jina-embeddings-v2-base-zh": 768,
    "Xenova/paraphrase-multilingual-mpnet-base-v2": 768,
    "jinaai/jina-embeddings-v2-base-code": 768,
    "Xenova/multilingual-e5-large": 1024,
    "WhereIsAI/UAE-Large-V1": 1024,
    "jinaai/jina-embeddings-v2-base-de": 768,
}
DEFAULT_MODEL = "Xenova/all-MiniLM-L6-v2"

_model_cache: dict[str, object] = {}


def _real_model_batch(texts: pd.Series, dim: int) -> list[list[float]]:
    """MiniLM mean-pool + L2-normalize, exactly the reference's
    getVectorFromText (src/vector.ts:24-39); executor-local model cache —
    the executor fleet is the worker pool."""
    if REFERENCE_MODEL not in _model_cache:
        # vendored weights first (no-network path, module docstring),
        # hub checkout otherwise; the env var must be SET — otherwise a
        # stray ./minilm dir in the worker cwd would load as the model
        wheel_dir = os.environ.get("SPARK_GRAFT_WHEEL_DIR")
        local = os.path.join(wheel_dir, "minilm") if wheel_dir else ""
        _model_cache[REFERENCE_MODEL] = SentenceTransformer(
            local if local and os.path.isdir(local) else REFERENCE_MODEL
        )
    model = _model_cache[REFERENCE_MODEL]
    vecs = model.encode(
        [t or "" for t in texts], normalize_embeddings=True
    )
    return [[float(x) for x in v] for v in vecs]


def _fake_model_batch(
    texts: pd.Series, dim: int, model: str | None = None
) -> list[list[float]]:
    """Deterministic stand-in for the feature-extraction pipeline.
    Replace with: model.encode(texts.tolist(), normalize_embeddings=True).
    Seeded per (model, text) when a non-default model is named, so each
    checkpoint emits its own space (no model name keeps the historical
    md5(text) seed — every committed fixture stays valid)."""
    prefix = f"{model}|" if model and model != DEFAULT_MODEL else ""
    out = []
    for t in texts:
        seed = int.from_bytes(
            hashlib.md5((prefix + (t or "")).encode()).digest()[:4], "big"
        )
        rng = np.random.RandomState(seed)
        v = rng.standard_normal(dim)
        v = v / np.sqrt((v * v).sum())
        out.append([float(x) for x in v])
    return out


def embed_udf(
    dim: int = DEFAULT_DIM,
    use_real_model: bool | None = None,
    model: str | None = None,
):
    """Arrow-batched embedding UDF returning unit-norm array<float>.

    ``model`` selects one of the reference's 9 checkpoints (``MODELS``,
    src/vector.ts:8-19) and fixes ``dim`` to that checkpoint's width.
    ``use_real_model=None`` (default) auto-selects: the real MiniLM
    branch when sentence-transformers is importable AND the geometry is
    the default checkpoint's 384, else the deterministic fake."""
    if model is not None:
        if model not in MODELS:
            raise ValueError(
                f"unknown model {model!r}; reference set: {sorted(MODELS)}"
            )
        dim = MODELS[model]
    if use_real_model is None:
        use_real_model = (
            _HAS_ST
            and dim == REFERENCE_DIM
            and model in (None, DEFAULT_MODEL)
        )
    elif use_real_model and (
        model not in (None, DEFAULT_MODEL) or dim != REFERENCE_DIM
    ):
        # only the default checkpoint (384-wide) has real weights
        # wired; silently encoding another model's — or another
        # width's — rows with MiniLM would mix spaces
        raise ValueError(
            f"real weights are wired for {DEFAULT_MODEL!r}"
            f" (dim={REFERENCE_DIM}) only;"
            f" model={model!r} dim={dim} runs the deterministic fake"
        )

    if use_real_model:
        def batch_fn(texts: pd.Series) -> list[list[float]]:
            return _real_model_batch(texts, dim)
    else:
        def batch_fn(texts: pd.Series) -> list[list[float]]:
            return _fake_model_batch(texts, dim, model)

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        return pd.Series(batch_fn(texts))

    return _embed
