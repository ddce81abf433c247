"""Storage-level whale routing: write_spans_routed partitions the corpus by
is_whale, and extract_spans_routed's two branches must each be PARTITION-
PRUNED scans (no read amplification), with output span-equal to the eager
kernel and to in-plan hybrid."""

from pyspark.sql import functions as F

from pdf_extraction_and_query_spark.core.docpipe import ExtractConfig, extract_document
from pdf_extraction_and_query_spark.plans.extract import (
    extract_spans,
    extract_spans_routed,
    write_spans_routed,
)
from pdf_extraction_and_query_spark.sources.corpus import docs_to_df, synth_doc
from tests.test_whale_routing import THRESHOLD, _whale


def _corpus(spark, with_whale=True):
    docs = {f"d{i}": synth_doc(f"d{i}", seed=i) for i in range(6)}
    if with_whale:
        docs["whale"] = _whale("whale", THRESHOLD + 500)
    return docs, docs_to_df(spark, list(docs.items()))


def _eager(docs, cfg):
    out = set()
    for doc_id, spans in docs.items():
        for rec in extract_document(spans, cfg):
            out.add((doc_id, rec["order"], rec["kind"], rec["text"], rec["media_ref"]))
    return out


def test_routed_table_span_equality_and_pruning(spark, tmp_path):
    # no threshold monkeypatch needed: routing is decided at WRITE time
    # (write_spans_routed threshold arg); the read side follows the flag
    cfg = ExtractConfig()
    docs, df = _corpus(spark, with_whale=True)
    path = str(tmp_path / "routed")
    write_spans_routed(df, path, threshold=THRESHOLD)

    # the partition layout is real (two is_whale dirs)
    import os

    parts = {p for p in os.listdir(path) if p.startswith("is_whale=")}
    assert parts == {"is_whale=0", "is_whale=1"}

    out = extract_spans_routed(spark, path, cfg)
    got = {
        (r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
        for r in out.collect()
    }
    assert got == _eager(docs, cfg)

    # both branch scans must carry a partition filter on is_whale
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("PartitionFilters") >= 2
    import re

    pf = re.findall(r"PartitionFilters: \[[^\]]*is_whale[^\]]*\]", plan)
    assert len(pf) >= 2, plan[:2000]


def test_whale_free_corpus_whale_branch_scans_nothing(spark, tmp_path):
    cfg = ExtractConfig()
    docs, df = _corpus(spark, with_whale=False)
    path = str(tmp_path / "routed0")
    write_spans_routed(df, path, threshold=THRESHOLD)

    t = spark.read.parquet(path)
    whale_side = t.where(F.col("is_whale") == 1)
    # partition pruning leaves the whale branch zero files -> zero rows
    # without touching data
    assert whale_side.rdd.getNumPartitions() == 0 or whale_side.isEmpty()

    out = extract_spans_routed(spark, path, cfg)
    got = {
        (r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
        for r in out.collect()
    }
    assert got == _eager(docs, cfg)
