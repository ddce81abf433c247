"""Streaming ingest: drain a directory of span-document files with
availableNow, assert output equals the batch pipeline; new files arriving
later are picked up incrementally (streaming checkpoint skips done files)."""

import pytest

from pdf_extraction_and_query_spark.core.docpipe import ExtractConfig
from pdf_extraction_and_query_spark.plans.extract import extract_spans
from pdf_extraction_and_query_spark.sources.corpus import docs_to_df, synth_docs
from pdf_extraction_and_query_spark.streaming.ingest import stream_extract

CFG = ExtractConfig(max_chunk_size=400, chunk_overlap=80)


def _spanset(df):
    return {
        (r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
        for r in df.select("doc_id", "order", "kind", "text", "media_ref").collect()
    }


def test_stream_matches_batch_and_resumes(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")

    first = docs_to_df(spark, synth_docs(12, seed=5))
    first.write.mode("append").parquet(in_dir)

    q = stream_extract(spark, in_dir, out_dir, ckpt, cfg=CFG, available_now=True)
    q.awaitTermination(300)
    got1 = _spanset(spark.read.parquet(out_dir))
    assert got1 == _spanset(extract_spans(first, CFG))

    # late-arriving files: only the delta is processed on the next drain
    more = [(f"late{i}", s) for i, (_, s) in enumerate(synth_docs(5, seed=99))]
    second = docs_to_df(spark, more)
    second.write.mode("append").parquet(in_dir)

    q2 = stream_extract(spark, in_dir, out_dir, ckpt, cfg=CFG, available_now=True)
    q2.awaitTermination(300)
    got2 = _spanset(spark.read.parquet(out_dir))
    assert got2 == got1 | _spanset(extract_spans(second, CFG))


def test_batch_replay_is_idempotent(spark, tmp_path_factory):
    """Exactly-once contract: Spark re-runs a micro-batch when it crashes
    after the data write but before the checkpoint commit. The sink keys the
    write by batch_id with dynamic partition-overwrite, so a replay REPLACES
    the partition — duplicate-sensitive row counts must not change."""
    from pdf_extraction_and_query_spark.streaming.ingest import make_batch_processor

    base = tmp_path_factory.mktemp("replay")
    out_dir = str(base / "out")
    docs = docs_to_df(spark, synth_docs(8, seed=21))

    process = make_batch_processor(out_dir, cfg=CFG)
    process(docs, 0)
    once = spark.read.parquet(out_dir).count()
    assert once > 0

    process(docs, 0)  # replay of the same micro-batch
    df = spark.read.parquet(out_dir)
    assert df.count() == once  # count, not set: duplicates would show here
    # and a replay of a DIFFERENT batch id appends, not overwrites
    process(docs_to_df(spark, synth_docs(3, seed=22)), 1)
    assert spark.read.parquet(out_dir).where("batch_id = 0").count() == once
