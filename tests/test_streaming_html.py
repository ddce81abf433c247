"""Streaming HTML ingest: drain a directory of (doc_id, html) pages with
availableNow, assert output equals the batch html_chunks composition; late
files are picked up incrementally and micro-batch replay stays
exactly-once (shared make_batch_processor contract)."""

import duckdb

from pdf_extraction_and_query_spark.core.docpipe import ExtractConfig
from pdf_extraction_and_query_spark.operators.htmlextract import (
    html_extract_span_corpus,
)
from pdf_extraction_and_query_spark.plans.extract import extract_spans
from pdf_extraction_and_query_spark.sources.htmlcorpus import html_from_text
from pdf_extraction_and_query_spark.streaming.ingest import stream_extract_html

SF_DIR = "/root/testdata/sf0.001"
CFG = ExtractConfig(max_chunk_size=400, chunk_overlap=80)


def _pages(n, offset=0, tag=""):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        f"ORDER BY doc_id LIMIT {n} OFFSET {offset}"
    ).fetchall()
    return [(f"{tag}{d}", html_from_text(f"{tag}{d}", t or "")) for d, t in rows]


def _html_df(spark, pages):
    return spark.createDataFrame(pages, schema="doc_id string, html string")


def _spanset(df):
    return {
        (r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
        for r in df.select("doc_id", "order", "kind", "text", "media_ref").collect()
    }


def test_html_stream_matches_batch_and_resumes(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("hstream")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")

    first = _html_df(spark, _pages(10))
    first.write.mode("append").parquet(in_dir)

    q = stream_extract_html(spark, in_dir, out_dir, ckpt, cfg=CFG)
    q.awaitTermination(300)
    got1 = _spanset(spark.read.parquet(out_dir))
    assert got1 == _spanset(extract_spans(html_extract_span_corpus(first), CFG))
    assert got1  # non-vacuous

    second = _html_df(spark, _pages(4, offset=10, tag="late"))
    second.write.mode("append").parquet(in_dir)

    q2 = stream_extract_html(spark, in_dir, out_dir, ckpt, cfg=CFG)
    q2.awaitTermination(300)
    got2 = _spanset(spark.read.parquet(out_dir))
    assert got2 == got1 | _spanset(
        extract_spans(html_extract_span_corpus(second), CFG)
    )
