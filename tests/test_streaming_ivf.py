"""Streaming IVF maintenance: incremental inserts against frozen centroids
must reproduce the one-shot index exactly, replays must be exactly-once,
and compaction must not change any ranking."""

from pdf_extraction_and_query_spark.operators.search import ivf_topk
from pdf_extraction_and_query_spark.streaming.ivf import (
    ivf_compact,
    ivf_stream_init,
    ivf_topk_merged,
    make_ivf_batch_processor,
)

import os

SF = "/root/testdata/sf0.001"


def _split(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    cut = n - 100  # the streamed batch is the 100 HIGHEST vec_ids, so the
    # base holds the first IVF_CENTROIDS vectors and the frozen centroids
    # equal the full-corpus centroids — merged must == one-shot ivf_topk
    base = emb.where(f"vec_id < {cut}")
    batch = emb.where(f"vec_id >= {cut}")
    return emb, base, batch


def test_merged_equals_one_shot_index(spark, tmp_path):
    emb, base, batch = _split(spark)
    root = str(tmp_path / "ivf")
    ivf_stream_init(base, root)
    make_ivf_batch_processor(root)(batch, 0)
    got = sorted(map(tuple, ivf_topk_merged(spark, root).collect()))
    want = sorted(map(tuple, ivf_topk(emb).collect()))
    assert got == want and got


def test_replay_exactly_once_and_compact(spark, tmp_path):
    emb, base, batch = _split(spark)
    root = str(tmp_path / "ivf")
    ivf_stream_init(base, root)
    proc = make_ivf_batch_processor(root)
    proc(batch, 0)
    once = sorted(map(tuple, ivf_topk_merged(spark, root).collect()))
    proc(batch, 0)  # crash replay
    assert sorted(map(tuple, ivf_topk_merged(spark, root).collect())) == once
    ivf_compact(spark, root)
    assert not os.path.exists(f"{root}/delta")
    assert sorted(map(tuple, ivf_topk_merged(spark, root).collect())) == once
    ivf_compact(spark, root)  # idempotent when nothing to fold
