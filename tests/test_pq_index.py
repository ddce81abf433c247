"""PQ prebuilt index: build-once/search-many over the 64x-compressed code
table. The scale claims under test: (1) the prebuilt literal-LUT search is
EXACTLY equal to the inline join-based ADC path, (2) the index scan reads
only (vec_id, codes) — the 8-small-ints projection, never the vectors, and
(3) encoding is total and in-range."""

from pyspark.sql import functions as F

import pdf_extraction_and_query_spark.contract as C
from pdf_extraction_and_query_spark.operators.pq import (
    pq_assign,
    pq_build,
    pq_topk,
    pq_topk_prebuilt,
)

SF = "/root/testdata/sf0.001"


def test_prebuilt_matches_inline_and_reads_codes_only(spark, tmp_path_factory):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path_factory.mktemp("pq") / "index")

    pq_build(emb, path)
    got = pq_topk_prebuilt(spark, emb, path)
    want = pq_topk(emb)
    assert [r.asDict() for r in got.collect()] == [r.asDict() for r in want.collect()]

    # the ADC scan must project only the compressed codes, not vectors
    plan = got._jdf.queryExecution().executedPlan().toString()
    import re

    scans = re.findall(r"ReadSchema: (struct<[^>]*>)", plan)
    code_scans = [s for s in scans if "codes" in s]
    assert code_scans, plan
    for s in code_scans:
        assert "ev" not in s and "embedding" not in s, s


def test_ivfpq_prebuilt_matches_inline_with_both_prunings(spark, tmp_path_factory):
    """IVFADC: the persisted index must (a) equal the inline declarative
    form exactly, (b) prune to the probed partition directories
    (PartitionFilters on cent_id), and (c) read only (vec_id, codes)
    inside them — the two scan savings that multiply at 10^12 vectors."""
    import re

    from pdf_extraction_and_query_spark.operators.pq import (
        ivfpq_build,
        ivfpq_topk,
        ivfpq_topk_prebuilt,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path_factory.mktemp("ivfpq") / "index")
    ivfpq_build(emb, path)
    got = ivfpq_topk_prebuilt(spark, emb, path)
    want = ivfpq_topk(emb)
    assert [r.asDict() for r in got.collect()] == [r.asDict() for r in want.collect()]

    plan = got._jdf.queryExecution().executedPlan().toString()
    pfs = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("cent_id" in p for p in pfs), plan
    code_scans = [s for s in re.findall(r"ReadSchema: (struct<[^>]*>)", plan) if "codes" in s]
    assert code_scans, plan
    for s in code_scans:
        assert "ev" not in s and "embedding" not in s, s


def test_rebuild_idempotent_and_codes_total(spark, tmp_path_factory):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path_factory.mktemp("pq") / "index")
    pq_build(emb, path)
    pq_build(emb, path)
    idx = spark.read.parquet(f"{path}/codes")
    n = emb.count()
    assert idx.count() == n
    # every vector coded with PQ_M codes, all in [0, PQ_K)
    bad = idx.where(
        (F.size("codes") != C.PQ_M)
        | F.exists("codes", lambda c: (c < 0) | (c >= C.PQ_K))
    ).count()
    assert bad == 0
    # first PQ_K vectors encode to their own codewords (distance 0)
    own = pq_assign(emb).where(F.col("vec_id") < C.PQ_K).collect()
    for r in own:
        assert list(r["codes"]) == [r["vec_id"]] * C.PQ_M
