"""Hand-computed pins for margin-based bitext mining
(operators/search.py bitext_margin_pairs — the CCMatrix/LASER
distance-margin criterion, all-integer form):

* sides = label % 2; output anchors are side 0, candidates side 1;
* per direction: top-k cross-side neighbors inside the IVF blocking,
  fwd/bwd stats are SUMS over min(k, available) neighbors;
* margin2k_e12 = 2k*dot - fwd_sum - bwd_sum (avg margin scaled by 2k);
* is_mutual = the anchor is also its candidate's best reverse match;
* a candidate with no reverse cross-side neighborhood -> NULL bwd
  columns, NULL margin, is_mutual false.

The oracle-parity suite replays the identical blocking in DuckDB at
corpus scale; this file pins the arithmetic on frames small enough to
verify by hand.
"""

from __future__ import annotations

from pdf_extraction_and_query_spark.operators import search as S

SCHEMA = "vec_id long, embedding array<double>, label long"

E12 = 10**12


def _emb(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_bitext_hand_computed_margins(spark):
    # one shared IVF list (n_centroids=1, probe=1): blocking is exact.
    # side 0 = {v0, v2, v4}, side 1 = {v1, v3}; k=2 cross neighborhoods:
    #   fwd sums: v0 -> .9+.0, v2 -> .5+.5, v4 -> .75+.3
    #   bwd sums: v1 -> .9+.75 (top2 of .9/.5/.75), v3 -> .5+.3
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 1),
            (2, [0.5, 0.5], 2),
            (3, [0.0, 1.0], 3),
            (4, [0.8, 0.3], 4),
        ],
    )
    rows = {
        r["src_id"]: r
        for r in S.bitext_margin_pairs(emb, k=2, n_centroids=1, n_probe=1).collect()
    }
    assert set(rows) == {0, 2, 4}
    r0 = rows[0]
    assert (r0["tgt_id"], r0["dot_e12"]) == (1, 900_000_000_000)
    assert r0["fwd_sum_e12"] == 900_000_000_000
    assert r0["bwd_sum_e12"] == 1_650_000_000_000
    # 2k*dot - fwd - bwd = 3.6e12 - 0.9e12 - 1.65e12
    assert r0["margin2k_e12"] == 1_050_000_000_000
    assert r0["is_mutual"] is True  # v1's best reverse match IS v0
    r2 = rows[2]
    # v2's dots to v1 and v3 tie at .5 -> nb_id asc picks v1
    assert (r2["tgt_id"], r2["dot_e12"]) == (1, 500_000_000_000)
    assert r2["margin2k_e12"] == -650_000_000_000  # 2e12 - 1e12 - 1.65e12
    assert r2["is_mutual"] is False
    r4 = rows[4]
    assert r4["margin2k_e12"] == 300_000_000_000  # 3e12 - 1.05e12 - 1.65e12
    assert r4["is_mutual"] is False


def test_bitext_null_bwd_neighborhood(spark):
    """Candidate v1 probes lists {c1, c2} which hold only side-1 vectors
    (v2's label is odd ON PURPOSE), so its reverse neighborhood is empty:
    the anchor keeps NULL bwd/margin and is_mutual coalesces to false."""
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.0], 0),    # side 0, centroid 0, probes {c0, c1}
            (1, [0.0, 1.0], 1),    # side 1, centroid 1, probes {c1, c2}
            (2, [-1.0, 0.5], 3),   # side 1, centroid 2 (odd label)
        ],
    )
    [r] = S.bitext_margin_pairs(emb, k=2, n_centroids=3, n_probe=2).collect()
    assert (r["src_id"], r["tgt_id"], r["dot_e12"]) == (0, 1, 0)
    assert r["fwd_sum_e12"] == 0
    assert r["bwd_sum_e12"] is None
    assert r["margin2k_e12"] is None
    assert r["is_mutual"] is False


def test_bitext_plan_shape(spark):
    """Two grouped-matmul cogroups (one per direction), broadcast
    centroid scoring, and each direction's per-anchor fold reuses its
    q_id window exchange (subset rule) — no extra hash exchange between
    window and groupBy."""
    emb = _emb(
        spark, [(i, [float(i % 7), 1.0 + (i % 3)], i) for i in range(24)]
    )
    plan = (
        S.bitext_margin_pairs(emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FlatMapCoGroupsInPandas") == 2, plan
    # each direction: ONE q_id exchange serves both the ranking window
    # and the per-anchor fold (subset rule) — the broadcast centroid
    # scoring sits behind the localCheckpoint RDD boundary
    assert plan.count("Exchange hashpartitioning(q_id") == 2, plan
