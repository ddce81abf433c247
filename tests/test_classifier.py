"""Quality-classifier seam (operators/classifier.py) — stub arithmetic
hand-checked against hashlib, the zero-token drop rule, the keep/drop
threshold, and the pluggable-model path (fake model injected through the
factory seam, fastText-style predict surface).  Cross-engine values are
pinned by the quality_classify / quality_classify_stats oracle pairs."""

from __future__ import annotations

import hashlib
import sys

import pytest
from pyspark import cloudpickle

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators.classifier import (
    quality_classify,
    quality_classify_stats,
)

# ship THIS module's functions/classes to executors by value — the test
# module is not importable from spark workers (test_embedder.py pattern)
cloudpickle.register_pickle_by_value(sys.modules[__name__])


def _w(token: str) -> int:
    h = hashlib.md5((C.CLS_SALT + token).encode()).hexdigest()[:12]
    return int(h, 16) % (2 * C.CLS_W + 1)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta alpha", "en"),
        (1, "gamma", "en"),
        (2, "   ", "fr"),  # zero tokens -> no row
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_stub_matches_hashlib(docs):
    out = {r.doc_id: r for r in quality_classify(docs, spec="stub").collect()}
    s0 = (2 * _w("alpha") + _w("beta")) // 3 - C.CLS_W
    s1 = _w("gamma") - C.CLS_W
    assert (out[0].n_tokens, out[0].score_e6) == (3, s0)
    assert (out[1].n_tokens, out[1].score_e6) == (1, s1)
    for d, s in ((0, s0), (1, s1)):
        assert out[d].label == ("keep" if s >= C.CLS_THRESH_E6 else "drop")
    assert 2 not in out


def test_stats_rollup(docs):
    per_doc = quality_classify(docs, spec="stub").collect()
    stats = {
        (r.lang, r.label): (r.n_docs, r.min_score_e6, r.max_score_e6)
        for r in quality_classify_stats(docs, spec="stub").collect()
    }
    assert sum(n for n, _, _ in stats.values()) == len(per_doc) == 2
    for r in per_doc:
        n, lo, hi = stats[(r.lang, r.label)]
        assert lo <= r.score_e6 <= hi


def _fake_factory():
    # defined INSIDE the factory so cloudpickle ships the class by value
    # (a module-level class would pickle as a test-module reference the
    # executors can't import — same pattern as tests/test_embedder.py)
    class FakeModel:
        """fastText-style surface: predict(list[str]) -> list[float]."""

        def predict(self, texts):
            return [0.75 if "alpha" in t else -0.25 for t in texts]

    return FakeModel()


def test_model_seam_injection(docs):
    out = {
        r.doc_id: r
        for r in quality_classify(docs, spec=_fake_factory).collect()
    }
    # floor(0.75e6) / floor(-0.25e6) — exactly representable doubles
    assert (out[0].score_e6, out[0].label) == (750_000, "keep")
    assert (out[1].score_e6, out[1].label) == (-250_000, "drop")
    assert out[0].n_tokens == 3 and out[1].n_tokens == 1
    assert 2 not in out  # zero-token docs drop in the model path too


def test_threshold_parameter(docs):
    out = {r.doc_id: r.label for r in quality_classify(
        docs, spec="stub", thresh_e6=-(C.CLS_W + 1)).collect()}
    assert set(out.values()) == {"keep"}  # everything clears a floor below min
