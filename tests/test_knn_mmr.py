"""kNN-graph join + MMR diversified re-ranking.

Beyond the DuckDB oracle (tests/test_oracle_parity.py runs both pairs),
these pin the SEMANTIC claims: the IVF-blocked kNN join really
approximates the brute-force graph (recall floor on the deterministic
fixture), its output is a well-formed graph (contiguous ranks, no
self-pairs, every vector covered), and the MMR greedy matches an
independent numpy replay of Carbonell & Goldstein's recurrence — plus
the plan shapes that make both scale (no cartesian product anywhere in
knn_join; the MMR shortlist compiles to TakeOrderedAndProject).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators.search import (
    _dot_vec,
    fixed_point_vec,
    knn_join,
    mmr_topk,
    vector_topk,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _brute_knn(emb, k):
    c = emb.select("vec_id", fixed_point_vec(F.col("embedding")).alias("ev"))
    a = c.select(F.col("vec_id").alias("q_id"), F.col("ev").alias("qv"))
    pairs = a.join(c, a.q_id != c.vec_id).select(
        "q_id",
        F.col("vec_id").alias("nb_id"),
        _dot_vec(F.col("qv"), F.col("ev")).alias("dot"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("dot"), F.asc("nb_id"))
    return pairs.withColumn("r", F.row_number().over(w)).where(F.col("r") <= k)


def test_knn_join_graph_shape(spark):
    emb = _emb(spark)
    n = emb.count()
    got = knn_join(emb).toPandas()

    # every vector is a query with exactly KNN_K neighbors, ranks 1..k
    assert len(got) == n * C.KNN_K
    per_q = got.groupby("q_id")["rank"].agg(["count", "min", "max"])
    assert (per_q["count"] == C.KNN_K).all()
    assert (per_q["min"] == 1).all() and (per_q["max"] == C.KNN_K).all()
    assert (got["q_id"] != got["nb_id"]).all()
    # dot non-increasing with rank within each query
    s = got.sort_values(["q_id", "rank"])
    assert (
        s.groupby("q_id")["dot_e12"].apply(lambda d: (d.diff().dropna() <= 0).all())
    ).all()


def test_knn_join_recall_vs_brute_force(spark):
    """IVF blocking is approximate BY CONTRACT — but it must stay an
    approximation of the true graph, not noise.  Deterministic fixture →
    deterministic recall (measured 0.5744 with stub first-N centroids
    over near-uniform vectors; floor pinned with slack)."""
    emb = _emb(spark)
    n = emb.count()
    got = knn_join(emb)
    brute = _brute_knn(emb, C.KNN_K)
    hits = got.join(brute.select("q_id", "nb_id"), ["q_id", "nb_id"]).count()
    assert hits / (n * C.KNN_K) >= 0.5


def test_knn_join_plan_no_cartesian(spark):
    """The only corpus-width joins are broadcast (centroids) and the
    cent_id equi-join — a CartesianProduct would be the O(n^2) brute
    force sneaking back in."""
    plan = (
        knn_join(_emb(spark))._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def _mmr_replay(emb_pdf, k, pool, lam_n, lam_c):
    """Independent numpy replay of the greedy recurrence."""
    vecs = {
        int(r.vec_id): np.round(
            np.asarray(r.embedding[: C.EMBED_DIM], dtype=np.float64)
            * C.FIXED_POINT
        ).astype(np.int64)
        for r in emb_pdf.itertuples()
    }
    q = vecs[0]
    rel = {vid: int(v @ q) for vid, v in vecs.items()}
    shortlist = sorted(rel, key=lambda vid: (-rel[vid], vid))[:pool]
    cand = set(shortlist)
    picked, sel = [], []
    for rank in range(1, k + 1):
        best = None
        for vid in sorted(cand):
            ms = max((int(vecs[vid] @ vecs[s]) for s in sel), default=0)
            score = lam_n * rel[vid] - lam_c * ms
            if best is None or score > best[4]:
                best = (rank, vid, rel[vid], ms, score)
        picked.append(best)
        sel.append(best[1])
        cand.remove(best[1])
    return picked


def test_mmr_matches_numpy_replay(spark):
    emb = _emb(spark)
    got = [
        (int(r["rank"]), int(r.vec_id), int(r.rel_e12), int(r.max_sim_e12),
         int(r.mmr_score))
        for r in mmr_topk(emb).collect()
    ]
    want = _mmr_replay(
        emb.toPandas(), C.MMR_K, C.MMR_POOL, C.MMR_LAMBDA_NUM, C.MMR_LAMBDA_COMP
    )
    assert got == want


def test_mmr_first_pick_is_pure_relevance(spark):
    emb = _emb(spark)
    got = mmr_topk(emb).where("rank = 1").collect()[0]
    top1 = vector_topk(emb).where("rank = 1").collect()[0]
    assert got.vec_id == top1.vec_id
    assert got.max_sim_e12 == 0
    assert got.mmr_score == C.MMR_LAMBDA_NUM * got.rel_e12


def test_mmr_picks_distinct_and_scored(spark):
    got = mmr_topk(_emb(spark)).toPandas()
    assert len(got) == C.MMR_K
    assert got["vec_id"].nunique() == C.MMR_K
    assert (
        got["mmr_score"]
        == C.MMR_LAMBDA_NUM * got["rel_e12"] - C.MMR_LAMBDA_COMP * got["max_sim_e12"]
    ).all()


def test_mmr_shortlist_plan_is_take_ordered(spark):
    """The distributed half — the relevance shortlist — must be a
    per-partition partial top-pool, never a global sort."""
    from pdf_extraction_and_query_spark.operators.search import with_query

    emb = _emb(spark)
    short = (
        with_query(emb)
        .select("vec_id", _dot_vec(F.col("ev"), F.col("qv")).alias("rel_e12"))
        .orderBy(F.desc("rel_e12"), F.asc("vec_id"))
        .limit(C.MMR_POOL)
    )
    plan = short._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_knn_classify_coverage_and_vote_bounds(spark):
    emb = _emb(spark)
    from pdf_extraction_and_query_spark.operators.search import knn_classify

    n_unlabeled = emb.where(F.col("vec_id") % C.KNN_SEED_MOD != 0).count()
    got = knn_classify(emb).toPandas()
    # this fixture's probe lists always hold seeds -> full coverage
    assert len(got) == n_unlabeled
    assert got["vec_id"].nunique() == len(got)
    assert got["n_votes"].between(1, C.KNN_CLASSIFY_K).all()
    # no seed ever appears as a query
    assert (got["vec_id"] % C.KNN_SEED_MOD != 0).all()
    labels = {r.label for r in emb.select("label").distinct().collect()}
    assert set(got["pred_label"]).issubset(labels)


def test_knn_classify_accuracy_rollup_consistent(spark):
    emb = _emb(spark)
    from pdf_extraction_and_query_spark.operators.search import (
        knn_classify,
        knn_classify_accuracy,
    )

    cls = knn_classify(emb).toPandas()
    acc = knn_classify_accuracy(emb).toPandas()
    want = (
        cls.groupby("true_label")
        .agg(n_classified=("correct", "size"), n_correct=("correct", "sum"))
        .reset_index()
    )
    merged = acc.merge(want, on="true_label", suffixes=("", "_w"))
    assert (merged["n_classified"] == merged["n_classified_w"]).all()
    assert (merged["n_correct"] == merged["n_correct_w"]).all()
    assert (
        merged["accuracy_micro"]
        == merged["n_correct"] * 1_000_000 // merged["n_classified"]
    ).all()


def test_knn_classify_strong_signal_propagates_perfectly(spark):
    """On a corpus where embedding clusters == labels, clusters map to
    distinct IVF lists (cluster c owns centroids c and c+4, so every
    query's probe set contains its whole cluster), and every cluster
    holds 4 seeds (majority of K=5 guaranteed), propagation must be
    100% correct — the semantics test the gate fixture can't provide
    (its labels are near-random w.r.t. the embeddings; measured 11%
    overall there, i.e. chance).  seed_mod=3 so seeds land in every
    cluster (vid%4 and vid%3 are independent cycles)."""
    from pdf_extraction_and_query_spark.operators.search import knn_classify

    dim, n = C.EMBED_DIM, 48
    rows = []
    for vid in range(n):
        c = vid % 4
        v = [0.0] * dim
        v[c] = 1.0
        v[16 + vid] = 0.001  # unique tiny component -> self-dot is unique
        rows.append((vid, v, c))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = knn_classify(emb, seed_mod=3).toPandas()
    assert len(got) == n - n // 3
    assert (got["correct"] == 1).all()
    assert (got["pred_label"] == got["vec_id"] % 4).all()
    # 4 same-cluster seed votes out of 5 (the 5th is a cross-cluster fill)
    assert (got["n_votes"] == 4).all()


def test_mutual_pairs_are_exactly_the_reciprocal_edges(spark):
    """Independent replay: build the directed kNN edge set, intersect
    with its transpose in pandas, compare."""
    from pdf_extraction_and_query_spark.operators.search import mutual_knn_pairs

    emb = _emb(spark)
    g = knn_join(emb).toPandas()
    directed = {(int(r.q_id), int(r.nb_id)): int(r.dot_e12) for r in g.itertuples()}
    want = sorted(
        (a, b, d)
        for (a, b), d in directed.items()
        if a < b and (b, a) in directed
    )
    got = sorted(
        (int(r.vec_a), int(r.vec_b), int(r.dot_e12))
        for r in mutual_knn_pairs(emb).toPandas().itertuples()
    )
    assert got == want and got


def test_knn_dedup_clusters_match_union_find_replay(spark):
    """The component partition over reciprocal-NN pairs must equal a
    driver-side union-find on the same edge set."""
    from pdf_extraction_and_query_spark.operators.dedup import knn_dedup_clusters
    from pdf_extraction_and_query_spark.operators.search import mutual_knn_pairs

    emb = _emb(spark)
    pairs = [
        (int(r.vec_a), int(r.vec_b))
        for r in mutual_knn_pairs(emb, k=C.KNN_DEDUP_K).collect()
    ]
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    # canonical rep = min member of each component
    comp: dict[int, list[int]] = {}
    for x, r in want.items():
        comp.setdefault(r, []).append(x)
    rep = {x: min(members) for r, members in comp.items() for x in members}

    got = {
        int(r.doc_id): (int(r.cluster_rep), bool(r.is_keeper))
        for r in knn_dedup_clusters(emb).collect()
    }
    assert got == {x: (rep[x], rep[x] == x) for x in rep} and got


def test_knn_grouped_kernel_equals_rowwise_twin(spark):
    """PLANS.md #14 family: the grouped-matmul block kernel must be
    bit-identical to the row-wise join spec on the full gate fixture."""
    from pdf_extraction_and_query_spark.operators.search import _knn_join_rowwise

    emb = _emb(spark)
    got = sorted(map(tuple, knn_join(emb).collect()))
    want = sorted(map(tuple, _knn_join_rowwise(emb).collect()))
    assert got == want and got


def test_mmr_multi_equals_per_query_runs(spark):
    """Batch MMR == mmr_topk run independently per query, every query."""
    from pdf_extraction_and_query_spark.operators.search import mmr_topk_multi

    emb = _emb(spark)
    got = {
        (int(r.q_id), int(r["rank"])): (
            int(r.vec_id), int(r.rel_e12), int(r.max_sim_e12), int(r.mmr_score)
        )
        for r in mmr_topk_multi(emb).collect()
    }
    for q in range(C.MULTI_QUERY_N):
        single = mmr_topk(emb, query_vec_id=q).collect()
        assert len(single) == C.MMR_K
        for r in single:
            assert got[(q, int(r["rank"]))] == (
                int(r.vec_id), int(r.rel_e12), int(r.max_sim_e12),
                int(r.mmr_score),
            )
    assert len(got) == C.MULTI_QUERY_N * C.MMR_K
