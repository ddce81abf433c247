"""ProcessingResult-shaped report: errors/warnings as columns, never
exceptions (reference src/utils/processing_result.py:9-26 contract)."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_and_query_spark.core.docpipe import ExtractConfig
from pdf_extraction_and_query_spark.plans.extract import extract_spans, process_documents
from pdf_extraction_and_query_spark.sources.corpus import docs_to_df, synth_docs


@pytest.fixture(scope="module")
def report(spark):
    corpus = docs_to_df(spark, synth_docs(25, seed=13))
    rep = process_documents(corpus, ExtractConfig())
    out = extract_spans(corpus, ExtractConfig(), mode="hybrid")
    return rep.toPandas().set_index("doc_id"), out


def test_counts_match_pipeline_output(report, spark):
    rep, out = report
    chunks = {
        r["doc_id"]: r["n"]
        for r in out.where(F.col("kind") == "text").groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    media = {
        r["doc_id"]: r["n"]
        for r in out.where(F.col("kind") != "text").groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    for doc_id, row in rep.iterrows():
        assert row["n_chunks"] == chunks.get(doc_id, 0)
        assert row["n_media"] == media.get(doc_id, 0)


def test_every_input_doc_present_and_no_exceptions(report):
    rep, _ = report
    assert len(rep) == 25
    assert rep["n_spans_in"].gt(0).all()


def test_success_and_warning_semantics(report):
    rep, _ = report
    ok = rep[rep["success"]]
    assert len(ok) > 0
    # warnings are a "|"-joined scalar (array columns break driver-side
    # frame-sort canonicalization)
    for _, row in rep[~rep["success"]].iterrows():
        assert "document produced no chunks" in row["warnings"].split("|")
    # boilerplate-stripped docs legitimately lose content; the warning fires
    # above the reference's 10% threshold
    for _, row in rep.iterrows():
        if row["loss_pct"] > 10.0:
            assert any("content loss" in w for w in row["warnings"].split("|"))


def test_empty_document_does_not_throw(spark):
    df = docs_to_df(spark, [("empty", [])])
    rep = process_documents(df).collect()
    assert rep == [] or not rep[0]["success"]


def test_unknown_span_kind_is_counted_and_warned(spark):
    spans = [
        {"kind": "text", "text": "some ordinary line of text", "media_ref": None,
         "offset": 0, "page": 1, "font_size": 12.0, "bold": False},
        {"kind": "hologram", "text": "???", "media_ref": None,
         "offset": 1, "page": 1, "font_size": None, "bold": None},
    ]
    rep = process_documents(docs_to_df(spark, [("u", spans)])).collect()
    assert len(rep) == 1
    row = rep[0]
    assert row["n_spans_in"] == 2
    assert "unknown span kinds ignored" in row["warnings"].split("|")
    assert row["success"]  # the text line still chunks; never an exception
