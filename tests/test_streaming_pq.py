"""Streaming PQ maintenance: incremental encodes against the frozen
codebook must reproduce the one-shot quantized search exactly, replays must
be exactly-once, and compaction must not change any ranking."""

import os

from pdf_extraction_and_query_spark.operators.pq import pq_topk
from pdf_extraction_and_query_spark.streaming.pq import (
    make_pq_batch_processor,
    pq_compact,
    pq_stream_init,
    pq_topk_merged,
)

SF = "/root/testdata/sf0.001"


def _split(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    cut = n - 100  # the streamed batch is the 100 HIGHEST vec_ids, so the
    # base holds the first PQ_K vectors and the frozen codebook equals the
    # full-corpus codebook — merged must == one-shot pq_topk
    base = emb.where(f"vec_id < {cut}")
    batch = emb.where(f"vec_id >= {cut}")
    return emb, base, batch


def test_merged_equals_one_shot_quantized_search(spark, tmp_path):
    emb, base, batch = _split(spark)
    root = str(tmp_path / "pq")
    pq_stream_init(base, root)
    make_pq_batch_processor(root)(batch, 0)
    got = sorted(map(tuple, pq_topk_merged(spark, emb, root).collect()))
    want = sorted(map(tuple, pq_topk(emb).collect()))
    assert got == want and got


def test_replay_exactly_once_and_compact(spark, tmp_path):
    emb, base, batch = _split(spark)
    root = str(tmp_path / "pq")
    pq_stream_init(base, root)
    proc = make_pq_batch_processor(root)
    proc(batch, 0)
    once = sorted(map(tuple, pq_topk_merged(spark, emb, root).collect()))
    proc(batch, 0)  # crash replay
    assert sorted(map(tuple, pq_topk_merged(spark, emb, root).collect())) == once
    pq_compact(spark, root)
    assert not os.path.exists(f"{root}/delta")
    assert sorted(map(tuple, pq_topk_merged(spark, emb, root).collect())) == once
    pq_compact(spark, root)  # idempotent when nothing to fold


def test_ivfpq_merged_equals_one_shot_and_replay(spark, tmp_path):
    """Streaming IVFADC: frozen-centroid assignment + frozen-codebook
    encode per batch must reproduce the one-shot ivfpq_topk exactly; replay
    is exactly-once; compaction preserves every ranking."""
    from pdf_extraction_and_query_spark.operators.pq import ivfpq_topk
    from pdf_extraction_and_query_spark.streaming.pq import (
        ivfpq_compact,
        ivfpq_stream_init,
        ivfpq_topk_merged,
        make_ivfpq_batch_processor,
    )

    emb, base, batch = _split(spark)
    root = str(tmp_path / "ivfpq")
    ivfpq_stream_init(base, root)
    proc = make_ivfpq_batch_processor(root)
    proc(batch, 0)
    got = sorted(map(tuple, ivfpq_topk_merged(spark, emb, root).collect()))
    want = sorted(map(tuple, ivfpq_topk(emb).collect()))
    assert got == want and got
    proc(batch, 0)  # crash replay
    assert sorted(map(tuple, ivfpq_topk_merged(spark, emb, root).collect())) == got
    ivfpq_compact(spark, root)
    assert not os.path.exists(f"{root}/delta")
    assert sorted(map(tuple, ivfpq_topk_merged(spark, emb, root).collect())) == got
