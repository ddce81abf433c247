"""SemDeDup unit contract (operators/dedup.py:semdedup) — hand-computed
fixture: two clusters, a byte-identical pair, graded near-mates, an
orthogonal straggler.  The cross-engine value contract is pinned by the
semdedup/semdedup_stats oracle pairs (tests/test_oracle_parity.py)."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators import dedup as D

D_ = C.EMBED_DIM


def _vec(*pairs):
    v = [0.0] * D_
    for i, x in pairs:
        v[i] = x
    return v


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (0, _vec((0, 1.0))),            # centroid A (cluster best: self-dot)
        (1, _vec((1, 1.0))),            # centroid B
        (2, _vec((0, 1.0))),            # = vec0 -> cluster A, cos 1.0, tie on
                                        #   cent_dot -> vec0 wins, vec2 drops
        (3, _vec((0, 0.8), (1, 0.6))),  # cluster A (0.8 > 0.6), cos(.,v0)=0.8
        (4, _vec((1, 0.6), (2, 0.8))),  # cluster B (0.6 > 0), cos(.,v1)=0.6
        (5, _vec((63, 1.0))),           # dots 0 with both cents -> tie ->
                                        #   cluster A (smaller cent_id); cos 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _collect(emb, eps):
    out = D.semdedup(emb, n_clusters=2, eps=eps).collect()
    return {r.vec_id: r for r in out}


def test_assignment_and_better_mate_values(emb):
    r = _collect(emb, eps=0.5)
    assert {v: r[v].cent_id for v in range(6)} == {0: 0, 1: 1, 2: 0, 3: 0, 4: 1, 5: 0}
    # cluster bests carry the -1.0 no-better-mate sentinel
    assert r[0].max_better_cos_r6 == -1.0
    assert r[1].max_better_cos_r6 == -1.0
    # vec2 ties vec0 on cent_dot -> vec0 (smaller id) is better; cos = 1.0
    assert r[2].max_better_cos_r6 == 1.0
    assert r[3].max_better_cos_r6 == 0.8
    assert r[4].max_better_cos_r6 == 0.6
    # vec5 is orthogonal to every better mate in cluster A
    assert r[5].max_better_cos_r6 == 0.0


@pytest.mark.parametrize(
    "eps,kept",
    [
        (0.5, {0, 1, 5}),        # 0.6 and 0.8 mates drop
        (0.7, {0, 1, 4, 5}),     # only >=0.7 drops: vec3 (0.8), vec2 (1.0)
        (0.99, {0, 1, 3, 4, 5}), # exact duplicate still drops at 1.0 >= eps
    ],
)
def test_eps_threshold(emb, eps, kept):
    r = _collect(emb, eps)
    assert {v for v in r if r[v].kept} == kept


def test_exactly_one_exemplar_per_duplicate_neighborhood(emb):
    # the byte-identical pair (0, 2): exactly one survives at any eps < 1.0
    r = _collect(emb, eps=0.5)
    assert r[0].kept and not r[2].kept


def test_frozen_centroids_seam(emb):
    # external (e.g. kmeans-trained) centroids: axis-2 and axis-63 planes —
    # vec4 (0.8 on axis 2) and vec5 (axis 63) now anchor the clusters
    cents = np.zeros((2, D_), dtype=np.int64)
    cents[0, 2] = C.FIXED_POINT
    cents[1, 63] = C.FIXED_POINT
    out = {r.vec_id: r for r in D.semdedup(emb, eps=0.5, cents=cents).collect()}
    assert out[4].cent_id == 0 and out[5].cent_id == 1
    # everything with zero dot on both axes ties -> cluster 0
    assert out[0].cent_id == 0 and out[1].cent_id == 0


def test_stats_rollup(emb, spark):
    full = D.semdedup(emb, n_clusters=2).collect()
    stats = {
        r.cent_id: r
        for r in D.semdedup(emb, n_clusters=2)
        .groupBy("cent_id")
        .count()
        .collect()
    }
    assert stats[0]["count"] == 4 and stats[1]["count"] == 2
    # module-level stats query (contract constants) is internally consistent
    s = D.semdedup_stats(_driver_emb(spark)).collect()
    assert all(r.n_kept + r.n_dropped == r.n_vecs for r in s)
    assert sum(r.n_vecs for r in s) == _driver_emb(spark).count()


def _driver_emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
