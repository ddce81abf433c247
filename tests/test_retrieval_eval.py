"""Hand-computed pins for the retrieval-quality eval conventions
(operators/search.py retrieval_eval / retrieval_eval_by_label):

* ranks are positions in the returned top-k INCLUDING the self-hit;
* relevance = label equality AND vec_id != q_id (self never relevant);
* no relevant hit -> first_rel_rank = 0, mrr_micro = 0;
* all metrics exact integers (1e6 div rank / sum div count floors).

The oracle-parity suite checks the same semantics against DuckDB at corpus
scale; this file pins the arithmetic on a frame small enough to verify by
hand.
"""

from __future__ import annotations

from pdf_extraction_and_query_spark.operators import search as S

SCHEMA = "vec_id long, embedding array<double>, label long"


def _emb(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_retrieval_eval_hand_computed(spark):
    # query 0 = [1, 0]; candidates ranked by exact dot: self (1.0),
    # v1 (.9, rel), v2 (.8), v3 (.7, rel) | v5 (.6) outside k=4
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 0),
            (2, [0.8, 0.2], 1),
            (3, [0.7, 0.3], 0),
            (4, [0.0, 1.0], 1),
            (5, [0.6, 0.4], 1),
        ],
    )
    [r] = S.retrieval_eval(emb, n_queries=1, k=4).collect()
    assert r["q_id"] == 0 and r["label"] == 0
    assert r["n_rel"] == 2
    assert r["first_rel_rank"] == 2  # self-hit holds rank 1
    assert r["mrr_micro"] == 500_000  # 1e6 div 2
    assert r["precision_micro"] == 500_000  # 2 * 1e6 div 4


def test_retrieval_ndcg_hand_computed(spark):
    # same frame as test_retrieval_eval_hand_computed: relevant hits sit
    # at ranks 2 and 4 -> dcg = disc[2] + disc[4] = 630930 + 430677;
    # idcg (2 rel) = 1000000 + 630930 = 1630930
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 0),
            (2, [0.8, 0.2], 1),
            (3, [0.7, 0.3], 0),
            (4, [0.0, 1.0], 1),
            (5, [0.6, 0.4], 1),
        ],
    )
    [r] = S.retrieval_ndcg(emb, n_queries=1, k=4).collect()
    assert r["n_rel"] == 2
    assert r["dcg_e6"] == 630_930 + 430_677
    assert r["idcg_e6"] == 1_630_930
    assert r["ndcg_e6"] == 1_061_607 * 1_000_000 // 1_630_930  # 650921


def test_retrieval_ndcg_no_relevant_is_zero(spark):
    emb = _emb(
        spark,
        [(i, [1.0 - 0.1 * i, 0.1 * i], i) for i in range(5)],
    )
    [r] = S.retrieval_ndcg(emb, n_queries=1, k=3).collect()
    assert (r["n_rel"], r["dcg_e6"], r["idcg_e6"], r["ndcg_e6"]) == (0, 0, 0, 0)


def test_retrieval_ndcg_perfect_ranking_is_one(spark):
    # both relevant hits at ranks 2 and 3 (right behind the self-hit),
    # and n_rel = 2 -> but idcg assumes ranks 1 and 2... perfect only if
    # dcg == idcg; here relevant CAN'T hold rank 1 (self-hit does), so
    # assert the exact discounted value instead of 1e6 — the convention
    # (ranks include the self-hit) is pinned by retrieval_eval's oracle
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 0),
            (2, [0.8, 0.2], 0),
            (3, [0.0, 1.0], 1),
        ],
    )
    [r] = S.retrieval_ndcg(emb, n_queries=1, k=3).collect()
    assert r["n_rel"] == 2
    assert r["dcg_e6"] == 630_930 + 500_000
    assert r["ndcg_e6"] == (630_930 + 500_000) * 1_000_000 // 1_630_930


def test_retrieval_eval_no_relevant_hit(spark):
    # every vector carries a unique label -> nothing is ever relevant
    emb = _emb(
        spark,
        [(i, [1.0 - 0.1 * i, 0.1 * i], i) for i in range(5)],
    )
    [r] = S.retrieval_eval(emb, n_queries=1, k=3).collect()
    assert r["n_rel"] == 0
    assert r["first_rel_rank"] == 0
    assert r["mrr_micro"] == 0
    assert r["precision_micro"] == 0


def test_retrieval_eval_by_label_integer_means(spark):
    # two queries, same label: q0 first relevant at rank 2 (mrr 500000),
    # q1 first relevant at rank 3 (mrr 333333) -> mean floors to 416666
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.0], 0),
            (1, [0.0, 1.0], 0),
            (2, [0.9, 0.1], 0),   # q0 rank 2 (rel); q1 rank 3 (rel)
            (3, [0.85, 0.3], 1),  # q1 rank 2 (dot .3 > .1), not rel
            (4, [0.2, 0.05], 1),
        ],
    )
    [r] = S.retrieval_eval_by_label(emb, n_queries=2, k=3).collect()
    assert r["label"] == 0
    assert r["n_queries"] == 2
    assert r["n_rel_total"] == 2
    assert r["n_queries_hit"] == 2
    assert r["mean_mrr_micro"] == (500_000 + 333_333) // 2
    assert r["mean_precision_micro"] == 333_333  # (333333+333333) div 2


def test_label_separation_hand_computed(spark):
    """label 0 centroid = mean([1,0],[0,1]) = [.5,.5]; label 1 = [1,0];
    label 2 = [-1,0] -> cos(0,1) = +0.707107, cos(0,2) = -0.707107,
    cos(1,2) = -1.0 (round 6, the _pair_cos_r6 contract)."""
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.0], 0),
            (1, [0.0, 1.0], 0),
            (2, [1.0, 0.0], 1),
            (3, [-1.0, 0.0], 2),
        ],
    )
    rows = {
        (r["label_a"], r["label_b"]): r
        for r in S.label_separation(emb).collect()
    }
    assert set(rows) == {(0, 1), (0, 2), (1, 2)}
    assert (rows[(0, 1)]["n_a"], rows[(0, 1)]["n_b"]) == (2, 1)
    assert rows[(0, 1)]["cos_r6"] == 0.707107
    assert rows[(0, 2)]["cos_r6"] == -0.707107
    assert rows[(1, 2)]["cos_r6"] == -1.0


def test_isotropy_hand_computed(spark):
    """Identical vectors -> iso 1e6; antipodal pair -> iso 0; orthogonal
    pair -> centroid [.5,.5], iso = 0.5e12/1e12 = 500000."""
    S_ = S.isotropy_report
    same = _emb(spark, [(i, [1.0, 0.0], 0) for i in range(4)])
    [r] = S_(same).collect()
    assert (r["n"], r["iso_e6"]) == (4, 1_000_000)
    assert r["mean_sq_norm_e12"] == 10**12
    anti = _emb(spark, [(0, [1.0, 0.0], 0), (1, [-1.0, 0.0], 0)])
    [r] = S_(anti).collect()
    assert (r["centroid_sq_norm_e12"], r["iso_e6"]) == (0, 0)
    orth = _emb(spark, [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 0)])
    [r] = S_(orth).collect()
    assert r["centroid_sq_norm_e12"] == 500_000_000_000
    assert r["iso_e6"] == 500_000


def test_hard_negatives_skips_same_label_and_self(spark):
    """The nearest candidate overall shares the query's label (and the
    self-hit trivially does) — neither may appear; ranks count only
    cross-label candidates, ordered by exact dot then vec_id."""
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.0], 0),   # query
            (1, [0.95, 0.05], 0),  # nearest overall, same label -> excluded
            (2, [0.9, 0.1], 1),   # hardest negative
            (3, [0.8, 0.2], 2),
            (4, [0.0, 1.0], 1),
        ],
    )
    rows = S.hard_negatives(emb, n_queries=1, k=2).collect()
    assert [(r["vec_id"], r["rank"]) for r in sorted(rows, key=lambda r: r["rank"])] == [
        (2, 1),
        (3, 2),
    ]
    assert all(r["q_id"] == 0 and r["q_label"] == 0 and r["neg_label"] != 0 for r in rows)


def test_triplet_mining_hand_computed(spark):
    """Hardest positive = nearest same-label non-self; hardest negative =
    nearest cross-label; margin = pos_dot - neg_dot with sign flag. A
    query whose label is unique has NULL positive columns and margin_ok 0."""
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.0], 0),    # anchor A (label 0)
            (1, [0.0, 1.0], 7),    # anchor B (unique label 7)
            (2, [0.9, 0.1], 0),    # A's hardest positive (dot .9)
            (3, [0.95, 0.05], 1),  # A's hardest negative (dot .95 > .9)
            (4, [0.5, 0.5], 0),    # nearer to B than 2/3 per-label? not used for A
        ],
    )
    rows = {r["q_id"]: r for r in S.triplet_mining(emb, n_queries=2).collect()}
    a = rows[0]
    assert (a["pos_id"], a["neg_id"]) == (2, 3)
    assert a["margin_e12"] == a["pos_dot_e12"] - a["neg_dot_e12"] < 0
    assert a["margin_ok"] == 0
    b = rows[1]  # unique label: no positive exists
    assert b["pos_id"] is None and b["pos_dot_e12"] is None
    assert b["neg_id"] is not None
    assert b["margin_e12"] is None and b["margin_ok"] == 0


def test_triplet_mining_plan_shape(spark):
    """Broadcast query side; the explicit q_id repartition is the ONLY
    hash exchange — it satisfies both the (q_id, is_pos) window and the
    final fold via the subset rule (PLANS.md #37)."""
    emb = _emb(spark, [(i, [float(i), 1.0], i % 2) for i in range(8)])
    plan = (
        S.triplet_mining(emb, n_queries=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_hard_negatives_plan_shape(spark):
    """Query side broadcast, same-label pairs dropped map-side, ONE q_id
    hash exchange for the ranking window."""
    emb = _emb(spark, [(i, [float(i), 1.0], i % 2) for i in range(8)])
    plan = (
        S.hard_negatives(emb, n_queries=2, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
