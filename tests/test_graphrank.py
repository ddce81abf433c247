"""Link-graph PageRank: hand-computed fixed-point values, edge-list
semantics, and the iterative plan discipline."""

import pdf_extraction_and_query_spark.contract as C
from pdf_extraction_and_query_spark.operators.graphrank import (
    link_edges,
    pagerank,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_link_edges_weights_and_self_loops(spark):
    out = {
        (r["src"], r["dst"]): r["n"]
        for r in link_edges(
            _pairs(
                spark,
                [("A", "B"), ("A", "B"), ("A", "A"), ("B", "C")],
            )
        ).collect()
    }
    # self-loop dropped; duplicate occurrences weight the edge
    assert out == {("A", "B"): 2, ("B", "C"): 1}


def test_pagerank_hand_computed_three_iterations(spark):
    """A -> B, A -> C, B -> A; C dangling. pr0 = 10^6 everywhere.

    iter1: s(A)=10^6, s(B)=s(C)=5*10^5
           pr1(A)=150000+850000=1000000, pr1(B)=pr1(C)=575000
    iter2: s(A)=575000, s(B)=s(C)=500000
           pr2(A)=638750, pr2(B)=pr2(C)=575000
    iter3: s(A)=575000, s(B)=s(C)=638750 div 2 = 319375
           pr3(A)=638750, pr3(B)=pr3(C)=150000+(85*319375) div 100=421468
    """
    edges = link_edges(
        _pairs(spark, [("A", "B"), ("A", "C"), ("B", "A")])
    )
    assert C.PR_ITERS == 3  # the hand computation above unrolls exactly 3
    got = {r["node"]: r["pr"] for r in pagerank(edges).collect()}
    assert got == {"A": 638750, "B": 421468, "C": 421468}


def test_pagerank_sink_only_node_gets_base_plus_inflow(spark):
    """A node with inlinks but no outlinks still ranks (it appears in the
    node set via dst) and dangling mass vanishes — one iteration on a
    single edge: pr(B) = BASE + (85 * 10^6) div 100."""
    got = {
        r["node"]: r["pr"]
        for r in pagerank(
            link_edges(_pairs(spark, [("A", "B")])), iters=1
        ).collect()
    }
    assert got == {
        "A": C.PR_BASE,
        "B": C.PR_BASE + (C.PR_DAMP_NUM * C.PR_SCALE) // C.PR_DAMP_DEN,
    }


def test_pagerank_plan_is_lineage_truncated(spark):
    """Per-iteration localCheckpoint keeps the final plan O(1) deep: the
    last round's physical plan must reference checkpointed scans, not the
    unrolled join tree (no exponential re-parse of the upstream source —
    PLANS.md #11 / the connected-components precedent)."""
    edges = link_edges(
        _pairs(spark, [("A", "B"), ("B", "C"), ("C", "A")])
    )
    df = pagerank(edges, iters=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one round = one join pr x edges + one agg + one join back to nodes;
    # a non-truncated 4-round unroll would nest >= 8 joins in ONE plan
    assert plan.count("Join") <= 3, plan
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan, plan


def test_pagerank_is_partitioning_invariant(spark):
    """Cross-cluster determinism: the fixed-point arithmetic has no
    order-dependent step, so the result is identical under any input
    partitioning (the property that makes the resumable/two-cluster-size
    story sound) — and every node's score is bounded below by the PR_BASE
    damping floor."""
    pairs = [
        (f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(60)
    ] + [("n1", "n2")] * 5
    edges = link_edges(_pairs(spark, pairs))
    a = sorted(map(tuple, pagerank(edges).collect()))
    b = sorted(map(tuple, pagerank(edges.repartition(7)).collect()))
    assert a == b and a
    assert all(pr >= C.PR_BASE for _n, pr in a)


def test_frontier_schedule_politeness_waves(spark):
    from pdf_extraction_and_query_spark.operators.graphrank import frontier_schedule

    f = spark.createDataFrame(
        [
            ("https://a.com/p1", 100),
            ("https://a.com/p2", 300),
            ("https://a.com/p3", 200),
            ("https://a.com/p0", 200),  # ties p3 -> canonical asc wins
            ("https://b.org/x", 50),
            ("http://c.net/only", 1),
        ],
        "canonical string, priority long",
    )
    out = {r.canonical: r for r in frontier_schedule(f, max_depth=3).collect()}
    # hosts parsed from the URL; waves independent per host
    assert out["https://a.com/p2"].host == "a.com"
    assert out["https://b.org/x"].wave == 1 and out["http://c.net/only"].wave == 1
    # a.com sequencing: p2 (300) -> p0 (200, tie canonical asc) -> p3 (200)
    assert out["https://a.com/p2"].wave == 1
    assert out["https://a.com/p0"].wave == 2
    assert out["https://a.com/p3"].wave == 3
    # depth cap: p1 (lowest priority on the busiest host) waits next cycle
    assert "https://a.com/p1" not in out and len(out) == 5


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, n long")


def test_hits_hand_computed_two_iterations(spark):
    """1->2, 3->2, 2->4 (unit weights), HITS_ITERS=2.

    Round 1: araw(2)=2e6, araw(4)=1e6, max 2e6 -> auth 2:1e6, 4:5e5;
    hraw(1)=hraw(3)=1e6, hraw(2)=5e5, max 1e6 -> hub 1:1e6, 3:1e6,
    2:5e5, 4:0.  Round 2: araw(2)=2e6, araw(4)=5e5 -> auth 2:1e6,
    4:25e4; hraw 1:1e6, 3:1e6, 2:25e4 -> hub 1:1e6, 3:1e6, 2:25e4."""
    from pdf_extraction_and_query_spark.operators.graphrank import link_hits

    out = {
        r["node"]: (r["hub"], r["auth"])
        for r in link_hits(
            _edges(spark, [("1", "2", 1), ("3", "2", 1), ("2", "4", 1)]),
            iters=2,
        ).collect()
    }
    assert out == {
        "1": (1_000_000, 0),
        "2": (250_000, 1_000_000),
        "3": (1_000_000, 0),
        "4": (0, 250_000),
    }


def test_hits_weighted_edges_one_iteration(spark):
    """1->2 (n=3), 3->2 (n=1): the weight triples 1's hub evidence."""
    from pdf_extraction_and_query_spark.operators.graphrank import link_hits

    out = {
        r["node"]: (r["hub"], r["auth"])
        for r in link_hits(
            _edges(spark, [("1", "2", 3), ("3", "2", 1)]), iters=1
        ).collect()
    }
    assert out == {
        "1": (1_000_000, 0),
        "2": (0, 1_000_000),
        "3": (333_333, 0),
    }
