"""Kill/resume contract for the checkpointed extraction job:

  * run 1 is killed after one wave (max_waves=1) — the ledger records only
    that wave's buckets;
  * run 2 resumes: skips exactly the completed buckets, finishes the rest;
  * final output == a straight-through (non-checkpointed) extraction;
  * run 3 is a no-op (everything done);
  * ledger carries per-bucket lineage metrics (n_docs / span counts sum to
    the corpus totals).
"""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_and_query_spark.core.docpipe import ExtractConfig
from pdf_extraction_and_query_spark.plans.checkpoint import (
    completed_buckets,
    read_ledger,
    run_checkpointed,
)
from pdf_extraction_and_query_spark.plans.extract import extract_spans
from pdf_extraction_and_query_spark.sources.corpus import docs_to_df, synth_docs

CFG = ExtractConfig(max_chunk_size=400, chunk_overlap=80)
N_BUCKETS = 8
JOB = "ckpt-test"


@pytest.fixture(scope="module")
def spans_df(spark):
    return docs_to_df(spark, synth_docs(30, seed=7))


def _spanset(df):
    return {
        (r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
        for r in df.select("doc_id", "order", "kind", "text", "media_ref").collect()
    }


def test_kill_resume_roundtrip(spark, spans_df, tmp_path_factory):
    base = tmp_path_factory.mktemp("ckpt")
    out_dir, ledger_dir = str(base / "out"), str(base / "ledger")

    r1 = run_checkpointed(
        spark, spans_df, out_dir, ledger_dir, JOB,
        n_buckets=N_BUCKETS, buckets_per_wave=3, max_waves=1, cfg=CFG,
    )
    assert r1.waves_run == 1 and len(r1.processed_buckets) == 3
    assert completed_buckets(spark, ledger_dir, JOB) == sorted(r1.processed_buckets)

    r2 = run_checkpointed(
        spark, spans_df, out_dir, ledger_dir, JOB,
        n_buckets=N_BUCKETS, buckets_per_wave=3, cfg=CFG,
    )
    assert sorted(r2.skipped_buckets) == sorted(r1.processed_buckets)
    assert sorted(r1.processed_buckets + r2.processed_buckets) == list(range(N_BUCKETS))

    expected = _spanset(extract_spans(spans_df, CFG, mode="staged"))
    got = _spanset(spark.read.parquet(out_dir))
    assert got == expected

    r3 = run_checkpointed(
        spark, spans_df, out_dir, ledger_dir, JOB,
        n_buckets=N_BUCKETS, buckets_per_wave=3, cfg=CFG,
    )
    assert r3.processed_buckets == [] and r3.waves_run == 0

    led = read_ledger(spark, ledger_dir).where(F.col("job_id") == JOB)
    assert led.count() == N_BUCKETS  # one done row per bucket, no dupes
    totals = led.agg(
        F.sum("n_docs").alias("docs"), F.sum("n_out_spans").alias("spans")
    ).collect()[0]
    assert totals["spans"] == len(expected)
    assert totals["docs"] == spark.read.parquet(out_dir).select("doc_id").distinct().count()


def test_sink_layout_one_file_per_bucket(spark, spans_df, tmp_path_factory):
    """Round-5 sink fix: the wave output is repartition-aligned to the
    bucket directories, so each bucket holds exactly files_per_bucket
    parquet files — not one file per (upstream task x bucket) pair (the
    small-files commit cost that capped the submitted N->4N run)."""
    import glob
    import os

    base = tmp_path_factory.mktemp("ckpt_layout")
    out_dir, ledger_dir = str(base / "out"), str(base / "ledger")
    run_checkpointed(
        spark, spans_df, out_dir, ledger_dir, "layout-job",
        n_buckets=N_BUCKETS, buckets_per_wave=N_BUCKETS, cfg=CFG,
    )
    bucket_dirs = sorted(glob.glob(os.path.join(out_dir, "bucket=*")))
    assert bucket_dirs  # at least one non-empty bucket
    for d in bucket_dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)


def test_metrics_reread_is_column_pruned(spark, spans_df, tmp_path_factory):
    """The per-wave ledger metrics re-read the just-written wave — cheap
    at any scale only because the scan is column-pruned to (doc_id, kind)
    plus the bucket partition filter, never the text payload.  Pin the
    ReadSchema/PartitionFilters of the exact agg shape checkpoint.py
    builds."""
    import re

    from pdf_extraction_and_query_spark.sources import tables

    base = tmp_path_factory.mktemp("ckpt_prune")
    out_dir, ledger_dir = str(base / "out"), str(base / "ledger")
    run_checkpointed(
        spark, spans_df, out_dir, ledger_dir, "prune-job",
        n_buckets=N_BUCKETS, buckets_per_wave=N_BUCKETS, cfg=CFG,
    )
    agg = (
        tables.read_table(spark, out_dir)
        .where(F.col("bucket").isin([0, 1]))
        .groupBy("bucket")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_out_spans"),
            F.sum((F.col("kind") == "text").cast("long")).alias("n_text"),
        )
    )
    plan = agg._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    rs = re.search(r"ReadSchema: (.*)", plan).group(1)
    assert "text" not in rs.replace("n_text", "") or "kind" in rs, rs
    assert set(re.findall(r"struct<([^>]*)>", rs).pop().split(",")) <= {
        "doc_id:string", "kind:string"
    }, rs
    assert "PartitionFilters: [bucket" in plan or "bucket#" in plan
