"""Pluggable embedder seam — the production model path behind a config flag.

Reference parity: the reference embeds with a lazily-initialized
sentence-transformers model per process (src/embeddings/
sentence_transformer_embedder.py:85-164 — model loaded on first use,
``encode`` in batches of 32, ``normalize_embeddings=True``, empty text
short-circuited to a zero vector without a model call at :95-97, 126-137).
The model weights cannot run in this sandbox, so the DEFAULT implementation
stays the deterministic, oracle-paired stub (``search.stub_embed``); a real
deployment swaps the model in with ONE setting instead of a rewrite:

  * ``SPARK_GRAFT_EMBEDDER=my_pkg.embedders:load_model`` — a zero-arg
    factory importable on every executor, returning an object with
    ``encode(list[str]) -> (n, dim) array-like`` (exactly the
    sentence-transformers surface), or
  * ``embed_documents(docs, spec=my_factory)`` — a callable factory
    (shipped by cloudpickle; how tests inject fakes).

Scale shape: one narrow Arrow-batched ``pandas_udf`` — no shuffle, no
per-row Python.  The model is initialized LAZILY once per python worker
(module-global cache) and reused across every Arrow batch that worker
processes — model load cost amortizes over the partition stream exactly
like the reference's per-process singleton.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import contract as C

# reference batch size: sentence_transformer_embedder.py (batch_size=32)
DEFAULT_BATCH = 32

# per-python-worker model cache: first Arrow batch pays the load, every
# later batch in the same worker reuses it
_MODELS: dict = {}


def _factory(spec):
    if callable(spec):
        return spec
    import importlib

    mod, _, attr = str(spec).partition(":")
    if not attr:
        raise ValueError(
            f"embedder spec {spec!r} must be 'module:factory' or a callable"
        )
    return getattr(importlib.import_module(mod), attr)


def embed_documents(
    docs: DataFrame,
    spec=None,
    dim: int = C.EMBED_DIM,
    batch_size: int = DEFAULT_BATCH,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, embedding array<double>) — the reference's embed operator
    with a pluggable model.  ``spec`` defaults to ``$SPARK_GRAFT_EMBEDDER``
    then ``"stub"`` (the deterministic hash embedder, oracle-paired via the
    ``stub_embed`` gate query).  Contract mirrored from the reference:
    L2-normalized output, empty/whitespace text -> zero vector without a
    model call, encode in ``batch_size`` micro-batches."""
    if spec is None:
        spec = os.environ.get("SPARK_GRAFT_EMBEDDER", "stub")
    if spec == "stub":
        from .search import stub_embed

        return stub_embed(docs, dim)

    key = spec if isinstance(spec, str) else (
        f"callable:{getattr(spec, '__module__', '?')}."
        f"{getattr(spec, '__qualname__', repr(spec))}"
    )
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def emb(texts: pd.Series) -> pd.Series:
        model = _MODELS.get(key)
        if model is None:
            model = _factory(spec)()  # lazy per-worker init
            _MODELS[key] = model
        out = np.zeros((len(texts), dim), dtype=np.float64)
        t = texts.fillna("")
        idx = np.flatnonzero((t.str.strip().str.len() > 0).to_numpy())
        for s in range(0, len(idx), batch_size):
            chunk = idx[s : s + batch_size]
            vecs = np.asarray(
                model.encode([t.iloc[int(i)] for i in chunk]), dtype=np.float64
            )
            if vecs.shape != (len(chunk), dim):
                raise ValueError(
                    f"embedder returned shape {vecs.shape}, expected "
                    f"({len(chunk)}, {dim})"
                )
            out[chunk] = vecs
        nrm = np.linalg.norm(out, axis=1, keepdims=True)
        nrm[nrm == 0.0] = 1.0  # zero vectors stay zero
        return pd.Series(list(out / nrm))

    return docs.select("doc_id", emb(F.col(text_col)).alias("embedding"))
