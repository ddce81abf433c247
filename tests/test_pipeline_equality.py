"""Span-sequence equality: Spark pipeline (staged AND fused) vs the eager
reference-semantics oracle, on the synthetic corpus exercising every
FIXTURES.md §3 trait. This is the graft's correctness contract:
equality on (kind, text, media_ref, order) per document."""

import pytest

from pdf_extraction_and_query_spark.core.docpipe import ExtractConfig, extract_document
from pdf_extraction_and_query_spark.plans.extract import extract_spans
from pdf_extraction_and_query_spark.sources.corpus import docs_to_df, synth_docs

N_DOCS = 40
CFG = ExtractConfig(max_chunk_size=400, chunk_overlap=80)


@pytest.fixture(scope="module")
def corpus():
    return synth_docs(N_DOCS, seed=42)


@pytest.fixture(scope="module")
def oracle_out(corpus):
    return {
        doc_id: [
            (r["order"], r["kind"], r["text"], r["media_ref"])
            for r in extract_document(spans, CFG)
        ]
        for doc_id, spans in corpus
    }


def _collect(df):
    rows = df.collect()
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(
            (r["order"], r["kind"], r["text"], r["media_ref"])
        )
    for v in out.values():
        v.sort()
    return out


def _assert_equal(spark_out, oracle_out):
    assert set(spark_out) == {d for d, v in oracle_out.items() if v}
    for doc_id, expected in oracle_out.items():
        got = spark_out.get(doc_id, [])
        assert got == expected, (
            f"{doc_id}: first divergence at "
            f"{next((i for i, (a, b) in enumerate(zip(got, expected)) if a != b), 'len')} "
            f"(got {len(got)} spans, expected {len(expected)})"
        )


@pytest.mark.parametrize("mode", ["staged", "staged_banded", "fused", "hybrid"])
def test_pipeline_matches_oracle(spark, corpus, oracle_out, mode):
    df = docs_to_df(spark, corpus)
    # low threshold so the hybrid run genuinely routes docs down BOTH paths
    kw = {"hybrid_threshold": 60} if mode == "hybrid" else {}
    if mode == "staged_banded":
        # the whale stage-1 path (distributed prefix scan) must be
        # span-identical to the plain doc_id-window derivation
        mode, kw = "staged", {"banded_stage1": True}
    got = _collect(extract_spans(df, CFG, mode=mode, **kw))
    _assert_equal(got, oracle_out)


def test_traits_covered(corpus):
    """The generated corpus actually exercises the contract traits."""
    kinds = set()
    has_footer_doc = False
    has_no_fonts = False
    has_big = False
    n_media = 0
    for _, spans in corpus:
        kinds.update(s["kind"] for s in spans)
        pages = {s.get("page") for s in spans}
        if len([s for s in spans if s["kind"] == "page_marker"]) >= 4:
            has_footer_doc = True
        if all(s["font_size"] is None for s in spans):
            has_no_fonts = True
        if len(pages) > 50:
            has_big = True
        n_media += sum(1 for s in spans if s["kind"] in ("figure", "table"))
    assert kinds >= {"text", "page_marker", "figure", "table"}
    assert has_footer_doc and has_no_fonts
    assert n_media > 5


def test_oracle_output_is_nonempty(oracle_out):
    assert sum(len(v) for v in oracle_out.values()) > N_DOCS


def test_extract_arrays_shape(spark, corpus, oracle_out):
    """Per-document array form (doc_id, out array<struct<order,kind,text,
    media_ref>>) — the FIXTURES.md §2 equality shape."""
    from pdf_extraction_and_query_spark.plans.extract import extract_arrays

    df = docs_to_df(spark, corpus)
    rows = extract_arrays(df, CFG, mode="hybrid").collect()
    got = {
        r["doc_id"]: [
            (o["order"], o["kind"], o["text"], o["media_ref"]) for o in r["out"]
        ]
        for r in rows
    }
    nonempty = {d: v for d, v in oracle_out.items() if v}
    assert set(got) == set(nonempty)
    for doc_id, expected in nonempty.items():
        assert got[doc_id] == expected, doc_id
