"""Streaming exact dedup: duplicates re-delivered within the watermark
horizon (same or later micro-batch) must be dropped; each distinct content
emits exactly once; the emitted keys equal the batch dedup groups; and the
surviving row comes from the first micro-batch that carried the key
(within one micro-batch the representative is unspecified)."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from pdf_extraction_and_query_spark.operators.dedup import exact_dup_groups
from pdf_extraction_and_query_spark.streaming.dedup import dedup_stream

SCHEMA = "doc_id long, text string, ts timestamp"


def _ts(minute):
    return datetime(2024, 1, 1, 12, minute, tzinfo=timezone.utc)


def _drain(spark, in_dir, out_dir, ckpt):
    q = (
        dedup_stream(spark.readStream.schema(SCHEMA).parquet(in_dir))
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_duplicates_within_horizon_emit_once(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sdedup")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")

    batch1 = [
        (0, "alpha beta gamma", _ts(0)),
        (1, "Alpha  beta   GAMMA", _ts(1)),  # dup of 0 after normalization
        (2, "delta epsilon zeta", _ts(2)),
    ]
    batch2 = [
        (3, "alpha beta gamma", _ts(10)),  # cross-batch dup, within horizon
        (4, "eta theta iota", _ts(11)),
        (5, "delta epsilon zeta", _ts(12)),  # cross-batch dup
    ]
    spark.createDataFrame(batch1, SCHEMA).write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, out_dir, ckpt)
    spark.createDataFrame(batch2, SCHEMA).write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, out_dir, ckpt)

    out = spark.read.parquet(out_dir)
    rows = out.collect()
    hashes = [r["grp_hash"] for r in rows]
    assert len(hashes) == len(set(hashes)), "a content hash was emitted twice"
    assert len(rows) == 3  # alpha-group, delta-group, eta-group

    # emitted keys == the batch operator's groups over the full input
    all_docs = spark.createDataFrame(batch1 + batch2, SCHEMA)
    batch_groups = {r["grp_hash"] for r in exact_dup_groups(all_docs).collect()}
    assert set(hashes) == batch_groups

    # survivorship: the FIRST micro-batch containing a key wins (within a
    # micro-batch the representative row is unspecified — documented), so
    # every survivor here comes from batch 1 except the eta group
    got = {r["grp_hash"]: r["doc_id"] for r in rows}
    batch1_ids = {0, 1, 2}
    for h, doc in got.items():
        if doc == 4:  # eta group only exists in batch 2
            continue
        assert doc in batch1_ids, (h, doc)


def test_duplicate_past_horizon_reemits_and_state_expires(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sdedup2")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")

    spark.createDataFrame(
        [(0, "alpha beta gamma", _ts(0))], SCHEMA
    ).write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, out_dir, ckpt)
    # advance the watermark far past 12:00 + 1h allowance, then re-deliver
    spark.createDataFrame(
        [(1, "unrelated filler text", datetime(2024, 1, 1, 18, 0, tzinfo=timezone.utc))],
        SCHEMA,
    ).write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, out_dir, ckpt)
    spark.createDataFrame(
        [(2, "alpha beta gamma", datetime(2024, 1, 1, 18, 1, tzinfo=timezone.utc))],
        SCHEMA,
    ).write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, out_dir, ckpt)

    out = spark.read.parquet(out_dir)
    alpha = [r for r in out.collect() if r["doc_id"] in (0, 2)]
    # horizon semantics: the far-late duplicate re-emits (state for the
    # original expired when the watermark passed) — full-history exactness
    # is the batch operator's job
    assert {r["doc_id"] for r in alpha} == {0, 2}
