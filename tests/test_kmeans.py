"""Lloyd k-means unit contract (operators/kmeans.py) — hand-computed
rounds, tie-breaks, empty-cluster carry, and the probe-everything ==
brute-force equality.  Cross-engine values are pinned by the
kmeans_centroids / ivf_topk_trained oracle pairs."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators import kmeans as KM
from pdf_extraction_and_query_spark.operators import search as S

D_ = C.EMBED_DIM
E6 = C.FIXED_POINT


def _vec(*pairs):
    v = [0.0] * D_
    for i, x in pairs:
        v[i] = x
    return v


def test_one_round_hand_computed(spark):
    emb = spark.createDataFrame(
        [
            (0, _vec((0, 1.0))),
            (1, _vec((1, 1.0))),
            (2, _vec((0, 0.5))),
            (3, _vec((1, 0.5))),
        ],
        "vec_id long, embedding array<float>",
    )
    cents = KM.kmeans_np(emb, k=2, iters=1)
    # cluster 0 = {v0, v2} -> mean (1e6 + 0.5e6) / 2 on axis 0
    assert cents[0, 0] == 750_000 and cents[0, 1] == 0
    assert cents[1, 1] == 750_000 and cents[1, 0] == 0
    assert (cents[:, 2:] == 0).all()


def test_iters_zero_is_first_k_init(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert (KM.kmeans_np(emb, k=4, iters=0) == KM._init_np(emb, 4)).all()


def test_assignment_tie_breaks_to_smaller_cent_id_and_empty_carry(spark):
    # all three vectors identical: every assignment distance ties -> all go
    # to cent 0; cent 1 goes EMPTY and must carry its previous position
    emb = spark.createDataFrame(
        [(i, _vec((0, 1.0))) for i in range(3)],
        "vec_id long, embedding array<float>",
    )
    cents = KM.kmeans_np(emb, k=2, iters=2)
    assert cents[0, 0] == E6 and cents[1, 0] == E6  # carried, not zeroed
    assert (cents[:, 1:] == 0).all()


def test_negative_component_floor_matches_float64_floor(spark):
    # mean of (-1e6, 0) = -500000; mean of (-1e6, -0.5e6) = floor(-750000)
    emb = spark.createDataFrame(
        [
            (0, _vec((0, -1.0))),
            (1, _vec((1, 1.0))),
            (2, _vec((0, 0.0))),   # ties to cent 0 on d (both 0 vs c1: 1e12)
        ],
        "vec_id long, embedding array<float>",
    )
    cents = KM.kmeans_np(emb, k=2, iters=1)
    assert cents[0, 0] == -500_000


def test_probe_all_clusters_equals_brute_force(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    trained = KM.ivf_topk_trained(emb, n_probe=C.KM_K).collect()
    brute = S.vector_topk(emb).collect()
    assert [(r.vec_id, r.dot_e12, r.rank) for r in trained] == [
        (r.vec_id, r.dot_e12, r.rank) for r in brute
    ]


def test_training_moves_centroids_on_gate_corpus(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert (KM.kmeans_np(emb) != KM._init_np(emb, C.KM_K)).any()


def test_cluster_topics_shape_and_consistency(spark):
    """Cluster topic labels: ranks contiguous per cluster, df counts the
    clusters (never the docs) a term appears in, and every labeled
    cluster exists in the assignment."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = KM.cluster_topics(emb, docs).toPandas()
    assert len(got) > 0
    per = got.groupby("cluster_id")["rank"].agg(["min", "max", "count"])
    assert (per["min"] == 1).all()
    assert (per["max"] == per["count"]).all()
    assert (per["count"] <= C.TFIDF_TOPK).all()
    n_clusters = (
        KM.cluster_assign(emb).select("cent_id").distinct().count()
    )
    assert got["df"].between(1, n_clusters).all()
    assert set(got["cluster_id"]) <= set(
        r.cent_id for r in KM.cluster_assign(emb).select("cent_id").distinct().collect()
    )


def test_cluster_summary_totals_match_corpus(spark):
    """Summary partitions the corpus: n_docs sums to the embedding count,
    n_tokens to the corpus token total (empty-text docs contribute 0)."""
    from pdf_extraction_and_query_spark.operators.fulltext import _tokens

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = KM.cluster_summary(emb, docs).toPandas()
    assert got["n_docs"].sum() == emb.count()
    n_emb_docs = docs.join(
        emb.selectExpr("vec_id as doc_id"), "doc_id"
    )
    assert got["n_tokens"].sum() == _tokens(n_emb_docs).count()
