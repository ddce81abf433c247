"""Binary-quantization search (operators/bq.py): Hamming shortlist over
the shared SRP sketch + exact re-rank.

Pins: (1) with a shortlist that covers the whole corpus the result is
EXACTLY brute force (the re-rank stage is exact); (2) the query's own
sketch is at Hamming 0 and every distance is within [0, SRP_BITS];
(3) rerank=1 degenerates to the self hit; (4) the shortlist stage is
TakeOrderedAndProject (per-partition partial top-R), not a global sort.
"""

from __future__ import annotations

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators import bq as B
from pdf_extraction_and_query_spark.operators import search as S

SCHEMA = "vec_id long, embedding array<double>, label long"


def _emb(spark, n=20):
    # full EMBED_DIM vectors: the SRP kernel matmuls against the 64-plane
    # contract matrix
    rows = [
        (
            i,
            [((i * 37 + d * 11) % 19 - 9) / 10.0 for d in range(C.EMBED_DIM)],
            i % 3,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_bq_full_shortlist_equals_brute(spark):
    emb = _emb(spark)
    bq = B.bq_topk(emb, k=5, rerank=64).select("vec_id", "dot_e12", "rank")
    brute = S.vector_topk(emb, k=5).select("vec_id", "dot_e12", "rank")
    assert sorted(map(tuple, bq.collect())) == sorted(map(tuple, brute.collect()))


def test_bq_hamming_bounds_and_self(spark):
    emb = _emb(spark)
    rows = B.bq_topk(emb, k=10, rerank=64).collect()
    by_id = {r["vec_id"]: r for r in rows}
    assert by_id[0]["hamming"] == 0  # query vs itself
    assert all(0 <= r["hamming"] <= C.SRP_BITS for r in rows)


def test_bq_rerank_one_is_self_hit(spark):
    emb = _emb(spark)
    [r] = B.bq_topk(emb, k=5, rerank=1).collect()
    assert (r["vec_id"], r["hamming"], r["rank"]) == (0, 0, 1)


def test_bq_prebuilt_matches_inline_and_scans_sketches_only(
    spark, tmp_path_factory
):
    """The persisted index must equal the inline path exactly AND the
    sketch scan must read only (vec_id, srp) — never a vector column."""
    import re

    emb = _emb(spark)
    path = str(tmp_path_factory.mktemp("bqidx"))
    B.bq_build(emb, path)
    pre = B.bq_topk_prebuilt(spark, emb, path, k=5)
    inline = B.bq_topk(emb, k=5)
    assert sorted(map(tuple, pre.collect())) == sorted(
        map(tuple, inline.collect())
    )
    plan = pre._jdf.queryExecution().executedPlan().toString()
    scans = [
        s
        for s in re.findall(r"ReadSchema: (struct<[^>]*>)", plan)
        if "srp" in s
    ]
    assert scans, plan
    for s in scans:
        assert "embedding" not in s and "ev" not in s, s
    assert "TakeOrderedAndProject" in plan, plan


def test_ivfbq_full_probe_equals_bq(spark):
    """Probing every list removes the IVF pruning: ivfbq must then equal
    plain bq_topk exactly (same sketch, same shortlist, same re-rank)."""
    emb = _emb(spark)
    ivf = B.ivfbq_topk(emb, k=5, n_centroids=4, n_probe=4)
    plain = B.bq_topk(emb, k=5)
    assert sorted(map(tuple, ivf.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_ivfbq_pruning_restricts_candidates(spark):
    """With 1 probed list of 4, every hit must come from the probed
    list's membership — assert the result is a subset of that list."""
    from pdf_extraction_and_query_spark.operators.search import _ivf_assign

    emb = _emb(spark)
    assigned = {
        r["vec_id"]: r["cent_id"]
        for r in _ivf_assign(emb, 4).select("vec_id", "cent_id").collect()
    }
    hits = B.ivfbq_topk(emb, k=10, n_centroids=4, n_probe=1).collect()
    probed_cents = {assigned[r["vec_id"]] for r in hits}
    assert len(probed_cents) == 1  # all hits from the single probed list


def test_bq_plan_shape(spark):
    plan = (
        B.bq_topk(_emb(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastExchange" in plan, plan
