"""kcenter_coreset (greedy farthest-point) and vocab_growth (Heaps-law
curve) contracts — each pinned against an independent pure-numpy/Python
replay of the published algorithm."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators import kmeans as KM
from pdf_extraction_and_query_spark.operators import textstats as TX

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _kcenter_np(X: np.ndarray, ids: np.ndarray, k: int):
    """Independent replay: plain O(k n) incremental-min farthest-point
    traversal (the textbook form — NOT the operator's stateless
    full-matrix recompute)."""
    order = np.argsort(ids)
    X, ids = X[order], ids[order]
    chosen = [(0, int(ids[0]), 0)]
    mind = np.full(len(ids), np.iinfo(np.int64).max, dtype=np.int64)
    taken = np.zeros(len(ids), dtype=bool)
    taken[0] = True
    last = X[0]
    for rank in range(1, k):
        d = ((X - last) ** 2).sum(axis=1)
        mind = np.minimum(mind, d)
        cand = np.where(~taken)[0]
        best = cand[np.lexsort((ids[cand], -mind[cand]))][0]
        chosen.append((rank, int(ids[best]), int(mind[best])))
        taken[best] = True
        last = X[best]
    return chosen


def test_kcenter_matches_numpy_replay(emb):
    out = KM.kcenter_coreset(emb).orderBy("rank").collect()
    pdf = emb.toPandas()
    X = np.stack(
        [np.round(np.asarray(v[: C.EMBED_DIM], dtype=np.float64) * C.FIXED_POINT)
         for v in pdf.embedding]
    ).astype(np.int64)
    replay = _kcenter_np(X, pdf.vec_id.to_numpy().astype(np.int64), C.KC_K)
    got = [(r["rank"], r["vec_id"], r["d2"]) for r in out]
    assert got == replay
    # greedy invariant: selection distances are non-increasing after the
    # seed (each pick is the current farthest point)
    d2s = [r["d2"] for r in out][1:]
    assert d2s == sorted(d2s, reverse=True)
    assert len({r["vec_id"] for r in out}) == C.KC_K


def test_vocab_growth_matches_python_replay(docs):
    out = {
        r["threshold"]: r
        for r in TX.vocab_growth(docs).collect()
    }
    pdf = docs.select("doc_id", "text").toPandas()
    for t in C.VG_THRESHOLDS:
        sub = pdf[pdf.doc_id < t]
        toks = [
            w
            for txt in sub.text
            for w in txt.strip().lower().split()
            if w != ""
        ]
        assert out[t]["n_docs"] == len(sub)
        assert out[t]["n_tokens"] == len(toks)
        assert out[t]["n_vocab"] == len(set(toks))
    # the curve is monotone non-decreasing in every column
    rows = sorted(out.values(), key=lambda r: r["threshold"])
    for a, b in zip(rows, rows[1:]):
        assert b["n_docs"] >= a["n_docs"]
        assert b["n_tokens"] >= a["n_tokens"]
        assert b["n_vocab"] >= a["n_vocab"]
