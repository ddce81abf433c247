"""Hybrid whale routing: a document above the threshold must take the
staged path, small docs the fused path, and the union must still match the
eager oracle span-for-span. Uses an explicit 20k threshold so the test
whale stays small — the mechanism under test is the routing, not the
default bound (which is a worker-memory ceiling; plans/extract.py)."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_and_query_spark.core.docpipe import ExtractConfig, extract_document
from pdf_extraction_and_query_spark.plans.extract import extract_spans

THRESHOLD = 20_000
from pdf_extraction_and_query_spark.sources.corpus import docs_to_df, synth_doc


def _whale(doc_id: str, min_spans: int):
    """Tile a synthetic doc page-block until it exceeds min_spans, keeping
    offsets/pages globally consistent."""
    base = synth_doc(doc_id, seed=3)
    spans, off, page_shift, rep = [], 0, 0, 0
    while len(spans) < min_spans:
        max_page = 0
        for s in base:
            s2 = dict(s)
            s2["offset"] = off
            if s2.get("page") is not None:
                max_page = max(max_page, s2["page"])
                s2["page"] = s2["page"] + page_shift
            if s2.get("kind") == "page_marker" and s2.get("page") is None:
                pass
            if s2.get("media_ref"):
                s2["media_ref"] = f"{s2['media_ref']}/rep{rep}"
            spans.append(s2)
            off += 1
        page_shift += max_page or 1
        rep += 1
    return spans


@pytest.fixture(scope="module")
def corpus(spark):
    whale = ("whale", _whale("whale", THRESHOLD + 500))
    smalls = [(f"s{i}", synth_doc(f"s{i}", seed=8)) for i in range(5)]
    return [whale] + smalls


def test_whale_exceeds_threshold(corpus):
    assert len(corpus[0][1]) > THRESHOLD


def test_hybrid_routes_and_matches_oracle(spark, corpus):
    cfg = ExtractConfig(max_chunk_size=600, chunk_overlap=100)
    df = docs_to_df(spark, corpus)
    got = {}
    for r in extract_spans(df, cfg, mode="hybrid", hybrid_threshold=THRESHOLD).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["order"], r["kind"], r["text"], r["media_ref"])
        )
    for v in got.values():
        v.sort()
    for doc_id, spans in corpus:
        expected = [
            (r["order"], r["kind"], r["text"], r["media_ref"])
            for r in extract_document(spans, cfg)
        ]
        assert got.get(doc_id, []) == expected, doc_id


def test_routing_split(spark, corpus):
    df = docs_to_df(spark, corpus)
    big = df.where(F.size("spans") > THRESHOLD)
    small = df.where(F.size("spans") <= THRESHOLD)
    assert big.count() == 1 and small.count() == 5
