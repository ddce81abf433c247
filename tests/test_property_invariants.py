"""Property-based invariants (hypothesis) for the pure-Python kernels.

The reference pins behavior with hand-written invariant tests
(tests/unit/test_chunking.py, test_text_cleaning.py); these generalize the
same invariants over randomized inputs: size bounds, order/content
preservation, idempotence, and oracle determinism.
"""

import re

from hypothesis import given, settings, strategies as st

from pdf_extraction_and_query_spark.core.chunker import SectionChunker
from pdf_extraction_and_query_spark.core.docpipe import ExtractConfig, extract_document
from pdf_extraction_and_query_spark.core.splitter import (
    DEFAULT_SEPARATORS,
    RecursiveCharacterSplitter,
)
from pdf_extraction_and_query_spark.core.textclean import clean

# words + whitespace + punctuation + unicode, biased toward text-like input
_text = st.text(
    alphabet=st.sampled_from(
        list("abcdefghij XYZ.:!?;,\n\t0123456789-#") + ["é", "日"]
    ),
    max_size=2000,
)


@settings(max_examples=150, deadline=None)
@given(_text, st.integers(50, 400), st.integers(0, 120))
def test_splitter_respects_size_bound(text, size, overlap):
    sp = RecursiveCharacterSplitter(
        chunk_size=size, chunk_overlap=min(overlap, size - 1)
    )
    chunks = sp.split_text(text)
    assert all(len(c) <= size for c in chunks)
    assert all(c == c.strip() and c for c in chunks)


@settings(max_examples=150, deadline=None)
@given(_text, st.integers(50, 400))
def test_splitter_preserves_content_order(text, size):
    sp = RecursiveCharacterSplitter(chunk_size=size, chunk_overlap=0)
    chunks = sp.split_text(text)
    # with zero overlap, chunks appear in order in the original text
    pos = 0
    for c in chunks:
        found = text.find(c, pos)
        assert found >= 0, (c, pos)
        pos = found


@settings(max_examples=100, deadline=None)
@given(_text)
def test_clean_idempotent_and_bounded(text):
    once, _ = clean(text, validate=False)
    twice, _ = clean(once, validate=False)
    assert twice == once  # cleaning is idempotent
    assert "\n\n\n" not in once
    assert not re.search(r"(?i)-+\s*Page\s+\d+\s*-+\s*\n", once)


@settings(max_examples=80, deadline=None)
@given(_text, st.booleans())
def test_chunker_modes_bounded_and_nonempty(text, section_aware):
    ch = SectionChunker(
        max_chunk_size=300, chunk_overlap=60, use_section_awareness=section_aware
    )
    chunks = ch.chunk(text)
    for c in chunks:
        assert 0 < c["chunk_size"] <= 300
        assert c["chunk_size"] == len(c["text"])


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["text", "page_marker", "figure", "table"]),
            st.text(alphabet=list("ab AB.:\n0"), max_size=60),
        ),
        max_size=40,
    )
)
def test_extract_document_total_and_deterministic(kind_texts):
    spans = [
        {
            "kind": k,
            "text": t if k != "figure" else (t or None),
            "media_ref": f"m://{i}" if k in ("figure", "table") else None,
            "offset": i,
            "page": None,
            "font_size": 12.0 if k == "text" else None,
            "bold": False if k == "text" else None,
        }
        for i, (k, t) in enumerate(kind_texts)
    ]
    out1 = extract_document(spans, ExtractConfig())
    out2 = extract_document(list(reversed(spans)), ExtractConfig())
    assert out1 == out2  # input order by offset, not list order
    assert [r["order"] for r in out1] == list(range(len(out1)))
    n_media = sum(1 for k, _ in kind_texts if k in ("figure", "table"))
    assert sum(1 for r in out1 if r["kind"] != "text") == n_media
