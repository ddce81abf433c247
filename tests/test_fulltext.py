"""BM25 / hybrid-retrieval operator contracts: hand-computed integer scores,
idf capping for unknown terms, N counting empty docs, RRF fusion equality
against the two component retrievers, broadcast query-term prune, and the
fts_build bucketed index layout."""

import glob

from pyspark.sql import functions as F

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators.fulltext import (
    bm25_topk_multi,
    fts_build,
    hybrid_rrf,
    postings,
    term_stats,
)
from pdf_extraction_and_query_spark.operators.search import vector_topk


def _idf_e6(n_docs: int, df: int) -> int:
    return min((1_000_000 * (2 * n_docs - 2 * df + 1)) // (2 * df + 1), C.FTS_IDF_CAP_E6)


def _tf_e6(tf: int, dl: int, avgdl_e3: int) -> int:
    tfc = min(tf, C.FTS_TF_CAP)
    return (1_000_000 * 22 * tfc * avgdl_e3) // (
        10 * tfc * avgdl_e3 + 3 * avgdl_e3 + 9000 * dl
    )


def _score_e9(terms: list[tuple[int, int, int]], n_docs: int, avgdl_e3: int) -> int:
    """terms = [(tf, df, dl)] for each matched query term in one doc."""
    return sum(
        (_idf_e6(n_docs, df) * _tf_e6(tf, dl, avgdl_e3)) // 1000
        for tf, df, dl in terms
    )


_DOCS = [
    (0, "apple banana apple"),
    (1, "banana cherry"),
    (2, "cherry cherry cherry"),
    (3, ""),  # empty: counts toward N, can never match
]


def test_bm25_hand_computed_scores(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    out = bm25_topk_multi(docs, queries={0: ("apple", "cherry")}, k=10)
    rows = {r["doc_id"]: r for r in out.collect()}

    n_docs, sum_dl = 4, 8
    avgdl_e3 = (1000 * sum_dl) // n_docs
    # doc 0: apple tf=2 df=1 dl=3; doc 1: cherry tf=1 df=2 dl=2;
    # doc 2: cherry tf=3 df=2 dl=3
    exp = {
        0: _score_e9([(2, 1, 3)], n_docs, avgdl_e3),
        1: _score_e9([(1, 2, 2)], n_docs, avgdl_e3),
        2: _score_e9([(3, 2, 3)], n_docs, avgdl_e3),
    }
    assert set(rows) == set(exp), "empty doc must not match"
    for d, s in exp.items():
        assert rows[d]["score_e9"] == s, f"doc {d}"
    # apple is rarer (df=1) -> its doc outranks both cherry docs
    assert rows[0]["rank"] == 1
    ranked = sorted(rows.values(), key=lambda r: r["rank"])
    assert [r["score_e9"] for r in ranked] == sorted(
        (r["score_e9"] for r in ranked), reverse=True
    )


def test_bm25_tie_breaks_on_doc_id(spark):
    docs = spark.createDataFrame(
        [(5, "zebra"), (2, "zebra"), (9, "other")], "doc_id long, text string"
    )
    out = bm25_topk_multi(docs, queries={0: ("zebra",)}, k=10).collect()
    got = [(r["doc_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got == [(2, 1), (5, 2)]  # equal scores -> doc_id asc


def test_term_stats_unknown_term_hits_idf_cap(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    rows = {
        r["token"]: r
        for r in term_stats(docs, queries={0: ("apple", "nosuchtoken")}).collect()
    }
    assert rows["apple"]["df"] == 1
    assert rows["apple"]["idf_e6"] == _idf_e6(4, 1)
    assert rows["nosuchtoken"]["df"] == 0
    # at N=4 the raw df=0 idf (1e6 * (2N+1)) is below the cap …
    assert rows["nosuchtoken"]["idf_e6"] == _idf_e6(4, 0) == 9_000_000
    # … the cap binds once N > (cap/1e6 - 1)/2 (e.g. the sf0.001 corpus)
    assert _idf_e6(500, 0) == C.FTS_IDF_CAP_E6


def test_bm25_query_terms_broadcast(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    plan = (
        bm25_topk_multi(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, "query-term prune must broadcast"


def _emb_fixture(spark):
    """EMBED_DIM-dim unit-ish vectors: vec 0 is the query; vec 1 closest,
    then 2, then 3."""
    dim = C.EMBED_DIM

    def vec(main, leak):
        v = [0.0] * dim
        v[0] = main
        v[1] = leak
        return v

    rows = [
        (0, vec(1.0, 0.0)),
        (1, vec(0.9, 0.1)),
        (2, vec(0.5, 0.5)),
        (3, vec(0.0, 1.0)),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_hybrid_rrf_equals_python_fusion_of_components(spark):
    docs = spark.createDataFrame(
        [
            (0, "table scan fast table"),
            (1, "table scan"),
            (2, "nothing relevant here"),
            (3, "fast fast fast"),
        ],
        "doc_id long, text string",
    )
    emb = _emb_fixture(spark)
    pool, k = 3, 4

    vec = {r["vec_id"]: r["rank"] for r in vector_topk(emb, k=pool).collect()}
    kw = {
        r["doc_id"]: r["rank"]
        for r in bm25_topk_multi(docs, queries={0: C.FTS_QUERIES[0]}, k=pool).collect()
    }
    exp = {}
    for i in set(vec) | set(kw):
        exp[i] = (1_000_000 // (C.RRF_K + vec[i]) if i in vec else 0) + (
            1_000_000 // (C.RRF_K + kw[i]) if i in kw else 0
        )

    got = hybrid_rrf(emb, docs, k=k, pool=pool).collect()
    assert len(got) == min(k, len(exp))
    for r in got:
        assert r["rrf_e6"] == exp[r["doc_id"]]
        assert r["vec_rank"] == vec.get(r["doc_id"], 0)
        assert r["kw_rank"] == kw.get(r["doc_id"], 0)
    # output ordered by fused score desc, id asc
    keys = [(-r["rrf_e6"], r["doc_id"]) for r in sorted(got, key=lambda r: r["rank"])]
    assert keys == sorted(keys)


def test_fts_build_bucketed_layout_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    path = str(tmp_path / "fts")
    fts_build(docs, path, n_buckets=4)

    buckets = glob.glob(f"{path}/postings/bucket=*")
    assert buckets, "postings must be partitioned by token bucket"
    back = spark.read.parquet(f"{path}/postings")
    assert back.count() == postings(docs).count()
    # every (token) lives in exactly one bucket -> a term reader prunes
    n_multi = (
        back.groupBy("token")
        .agg(F.count_distinct("bucket").alias("n"))
        .where("n > 1")
        .count()
    )
    assert n_multi == 0
    stats = spark.read.parquet(f"{path}/_stats").collect()[0]
    assert stats["n_docs"] == 4 and stats["sum_dl"] == 8


def test_bm25_prebuilt_prunes_and_matches_inline(spark, tmp_path):
    import re

    from pdf_extraction_and_query_spark.operators.fulltext import (
        bm25_topk_prebuilt,
    )

    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    path = str(tmp_path / "fts")
    fts_build(docs, path, n_buckets=8)

    qs = {0: ("apple", "cherry"), 1: ("banana", "nosuchtoken")}
    got = bm25_topk_prebuilt(spark, path, queries=qs)
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the postings scan must carry a bucket PartitionFilter (pruned read)
    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("bucket" in f for f in pf), plan
    # and only the buckets the 4 query terms hash to survive (< n_buckets)
    from pyspark.sql import functions as SF

    n_query_buckets = (
        spark.createDataFrame([(t,) for ts in qs.values() for t in ts], "token string")
        .select(SF.pmod(SF.xxhash64("token"), SF.lit(8)).alias("b"))
        .distinct()
        .count()
    )
    assert n_query_buckets < 8

    want = bm25_topk_multi(docs, queries=qs)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
