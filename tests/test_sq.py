"""SQ8 scalar-quantization unit contract (operators/sq.py) — hand-computed
codes, the constant-dimension guard, frozen-bounds seam, and the
rerank-everything == brute-force equality.  Cross-engine values pinned by
the sq_codes / sq_topk / sq_recall oracle pairs."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators import search as S
from pdf_extraction_and_query_spark.operators import sq as Q

D_ = C.EMBED_DIM


def _vec(*pairs):
    v = [0.0] * D_
    for i, x in pairs:
        v[i] = x
    return v


@pytest.fixture(scope="module")
def emb(spark):
    # dim0 spans [-1e6, 1e6]; dim1 spans [0, 5e5]; every other dim constant 0
    return spark.createDataFrame(
        [
            (0, _vec((0, -1.0))),
            (1, _vec((0, 1.0), (1, 0.5))),
            (2, _vec((0, 0.0), (1, 0.25))),
        ],
        "vec_id long, embedding array<float>",
    )


def test_hand_computed_codes(emb):
    codes = {(r.vec_id, r.dim): r.code for r in Q.sq_codes(emb).collect()}
    # dim0: mn=-1e6, mx=1e6, range 2e6
    assert codes[(0, 0)] == 0                      # x = mn
    assert codes[(1, 0)] == C.SQ_LEVELS            # x = mx -> exactly 255
    assert codes[(2, 0)] == (10**6) * C.SQ_LEVELS // (2 * 10**6)  # 127
    # dim1: mn=0, mx=5e5
    assert codes[(1, 1)] == C.SQ_LEVELS
    assert codes[(2, 1)] == (25 * 10**4) * C.SQ_LEVELS // (5 * 10**5)  # 127
    # constant dims quantize to 0 (divide-by-zero guard)
    assert codes[(0, 5)] == 0 and codes[(1, 63)] == 0
    assert len(codes) == 3 * D_


def test_frozen_bounds_seam(emb):
    mn = np.zeros(D_, dtype=np.int64)
    mx = np.full(D_, 2 * 10**6, dtype=np.int64)
    out = {r.vec_id: list(r.codes) for r in Q.sq_assign(emb, (mn, mx)).collect()}
    # against [0, 2e6] bounds: x=1e6 -> 127, x=-1e6 clamps... no clamp by
    # contract: (x - mn) may be negative only when x < build-time mn; here
    # floor division of a negative numerator truncates in numpy int64 //
    # toward -inf — build bounds MUST cover inserts, this pins the seam
    assert out[1][0] == (10**6) * C.SQ_LEVELS // (2 * 10**6)
    assert out[2][0] == 0


def test_score_is_exact_scaled_recon_dot(emb):
    mn, mx = Q.sq_bounds_np(emb)
    qv = Q._qv_np(emb, 0)
    codes = {r.vec_id: np.array(r.codes, dtype=np.int64)
             for r in Q.sq_assign(emb, (mn, mx)).collect()}
    w = qv * (mx - mn)
    b = int((C.SQ_LEVELS * qv * mn).sum())
    for vid, q in codes.items():
        # score == SQ_LEVELS * <qv, mn + code*(mx-mn)/SQ_LEVELS> without loss
        recon_scaled = C.SQ_LEVELS * mn + q * (mx - mn)
        assert int(q @ w + b) == int(qv @ recon_scaled)


def test_rerank_everything_equals_brute(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = Q.sq_topk(emb, rerank=emb.count()).collect()
    brute = S.vector_topk(emb).collect()
    assert [(r.vec_id, r.dot_e12, r.rank) for r in got] == [
        (r.vec_id, r.dot_e12, r.rank) for r in brute
    ]


def test_recall_report_shape(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    r = Q.sq_recall(emb).collect()[0]
    assert r.k == C.TOPK and 0 <= r.n_hits <= r.k
    assert r.recall_e6 == r.n_hits * C.FIXED_POINT // r.k
