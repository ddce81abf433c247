"""Pluggable document quality classifier — the model-scored filter seam.

Production pipelines score documents with a LEARNED quality model before
training (CCNet's fastText linear classifiers, FineWeb-Edu's educational
scorer — public literature); this is the third quality signal next to the
heuristic (`textstats.text_quality`) and LM (`textstats.lm_fluency`)
filters.  No model runtime exists in this sandbox, so the DEFAULT
implementation is a deterministic hashed-linear stub (bag-of-words,
per-token md5-derived weights, fixed-point mean — exactly a linear text
classifier with frozen random weights) that is oracle-paired end-to-end.
A real deployment swaps the model in through the same config seam as
`operators/embedder.py`:

  * ``SPARK_GRAFT_CLASSIFIER=my_pkg.models:load_classifier`` — a zero-arg
    factory importable on every executor, returning an object with
    ``predict(list[str]) -> (n,) array-like of float scores`` (the
    fastText / sklearn surface), or
  * ``quality_classify(docs, spec=my_factory)`` — a callable factory
    (shipped by cloudpickle; how tests inject fakes).

Scale shape (stub): tokens explode NARROW (no shuffle), the per-token
weight is pure JVM codegen (md5 + conv — no Python, no interpreted
higher-order function), then ONE doc-keyed hash agg with map-side combine.
Scale shape (model): one Arrow-batched ``pandas_udf``, model lazily
initialized once per python worker (the embedder's ``_MODELS`` cache),
no shuffle.  Documents with zero tokens emit no row in both paths
(nothing to score — the lm_fluency drop rule).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import contract as C
from .embedder import _MODELS, _factory
from .util import fan_out

# fastText-style prediction batch; amortizes model-call overhead per
# Arrow batch exactly like the embedder's encode batches
DEFAULT_BATCH = 64


def _stub_scored(
    docs: DataFrame, prepared: DataFrame | None = None
) -> DataFrame:
    """(doc_id, lang, n_tokens, score_e6) under the frozen-random-weight
    linear stub — contract arithmetic (`contract.CLS_*`), cross-engine
    exact.  Weights stay non-negative through the mean; the symmetric
    score shifts by -CLS_W after the division (see contract.py)."""
    from .repetition import _words

    w = (
        prepared.select("doc_id", "lang", "words")
        if prepared is not None
        else fan_out(docs).select(
            "doc_id", "lang", _words(F.col("text")).alias("words")
        )
    )
    t = w.select("doc_id", "lang", F.explode("words").alias("token"))
    w_raw = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(C.CLS_SALT), F.col("token"))), 1, 12),
            16,
            10,
        ).cast("long")
        % (2 * C.CLS_W + 1)
    )
    return (
        t.select("doc_id", "lang", w_raw.alias("w_raw"))
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            (F.expr("sum(w_raw) div count(*)") - C.CLS_W)
            .cast("long")
            .alias("score_e6"),
        )
    )


def _model_scored(docs: DataFrame, spec, batch_size: int) -> DataFrame:
    """(doc_id, lang, n_tokens, score_e6) through a real model: one narrow
    Arrow pass, per-worker lazy init (embedder._MODELS), scores scaled to
    fixed-point e6 (floor) for the shared downstream contract."""
    from pyspark.sql.functions import pandas_udf

    from .repetition import _words

    key = spec if isinstance(spec, str) else (
        f"callable:{getattr(spec, '__module__', '?')}."
        f"{getattr(spec, '__qualname__', repr(spec))}"
    )

    @pandas_udf("double")
    def score(texts: pd.Series) -> pd.Series:
        model = _MODELS.get(key)
        if model is None:
            model = _MODELS.setdefault(key, _factory(spec)())
        out = np.empty(len(texts), dtype=np.float64)
        for i in range(0, len(texts), batch_size):
            chunk = texts.iloc[i : i + batch_size].tolist()
            out[i : i + len(chunk)] = np.asarray(
                model.predict(chunk), dtype=np.float64
            )
        return pd.Series(out)

    w = fan_out(docs).select(
        "doc_id", "lang", "text", F.size(_words(F.col("text"))).alias("n_tokens")
    )
    return w.where(F.col("n_tokens") >= 1).select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.floor(score(F.col("text")) * C.FIXED_POINT).cast("long").alias("score_e6"),
    )


def quality_classify(
    docs: DataFrame,
    spec=None,
    thresh_e6: int = C.CLS_THRESH_E6,
    batch_size: int = DEFAULT_BATCH,
    prepared: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, lang, n_tokens, score_e6, label) — the model-scored quality
    filter.  ``spec`` defaults to ``$SPARK_GRAFT_CLASSIFIER`` then
    ``"stub"`` (the deterministic hashed-linear scorer, oracle-paired via
    the ``quality_classify`` gate query); label = 'keep' iff
    ``score_e6 >= thresh_e6``.  ``prepared``: optional shared
    ``(doc_id, lang, words)`` tokenized projection (stub path only — the
    model path scores raw text; see textstats.lm_fluency)."""
    if spec is None:
        spec = os.environ.get("SPARK_GRAFT_CLASSIFIER", "stub")
    scored = (
        _stub_scored(docs, prepared)
        if spec == "stub"
        else _model_scored(docs, spec, batch_size)
    )
    return scored.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        "n_tokens",
        "score_e6",
        F.when(F.col("score_e6") >= F.lit(int(thresh_e6)), F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("label"),
    )


def quality_classify_stats(docs: DataFrame, spec=None) -> DataFrame:
    """Per-(lang, label) rollup of :func:`quality_classify` — the
    keep/drop report a curation run logs per wave.  One tiny hash-agg
    past the scoring plan."""
    return (
        quality_classify(docs, spec=spec)
        .groupBy("lang", "label")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("score_e6").alias("min_score_e6"),
            F.max("score_e6").alias("max_score_e6"),
        )
    )
