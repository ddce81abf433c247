"""Connected-components cluster resolution: chain graphs (the case LSH
cliques never exercise at gate scale) must converge to one component via
multi-round label propagation, and the fixpoint guard must trip when the
diameter exceeds max_iters."""

import pytest

from pdf_extraction_and_query_spark.operators.dedup import connected_components


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_chain_collapses_to_one_component(spark):
    # 0-1-2-3-4-5: diameter 5, needs several propagation rounds
    got = {
        (r["doc_id"], r["cluster_rep"], r["is_keeper"])
        for r in connected_components(
            _pairs(spark, [(i, i + 1) for i in range(5)])
        ).collect()
    }
    assert got == {(i, 0, i == 0) for i in range(6)}


def test_disjoint_components_keep_separate_reps(spark):
    got = {
        (r["doc_id"], r["cluster_rep"])
        for r in connected_components(
            _pairs(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)])
        ).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_max_iters_guard_trips_on_long_chains(spark):
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(
            _pairs(spark, [(i, i + 1) for i in range(8)]), max_iters=2
        ).collect()
