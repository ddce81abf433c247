"""Chunker invariants, ported from the reference's
``tests/unit/test_chunking.py`` (TDD-style invariant tests — the reference
has no golden outputs)."""

from pdf_extraction_and_query_spark.core.chunker import SectionChunker
from pdf_extraction_and_query_spark.core.mdsplit import (
    convert_to_markdown,
    is_likely_section_header,
    split_markdown_by_headers,
)
from pdf_extraction_and_query_spark.core.splitter import RecursiveCharacterSplitter


class TestBasicChunking:
    def test_chunk_respects_max_size(self):  # ref :17-28
        chunker = SectionChunker(max_chunk_size=500, chunk_overlap=50)
        chunks = chunker.chunk("This is a sentence. " * 100)
        assert chunks
        for c in chunks:
            assert len(c["text"]) <= 500

    def test_chunk_overlap_applied(self):  # ref :31-54
        chunker = SectionChunker(max_chunk_size=200, chunk_overlap=50)
        chunks = chunker.chunk("Sentence one. Sentence two. Sentence three. " * 20)
        assert len(chunks) > 1
        for i in range(len(chunks) - 1):
            cur_end = chunks[i]["text"][-100:]
            nxt_start = chunks[i + 1]["text"][:100]
            assert any(w in nxt_start for w in cur_end.split()[-10:])

    def test_chunk_returns_list_of_dicts(self):  # ref :57-71
        chunks = SectionChunker(max_chunk_size=1000).chunk("This is test content. " * 50)
        assert isinstance(chunks, list) and chunks
        for c in chunks:
            assert "text" in c and "metadata" in c and "chunk_size" in c
            assert c["chunk_size"] == len(c["text"])

    def test_empty_text_returns_empty(self):  # ref :74-81
        assert SectionChunker().chunk("") == []
        assert SectionChunker().chunk("   \n  ") == []

    def test_short_text_single_chunk(self):  # ref :84-93
        chunks = SectionChunker(max_chunk_size=1000).chunk("This is a short text.")
        assert len(chunks) == 1
        assert chunks[0]["text"].strip() == "This is a short text."


class TestSectionAwareChunking:
    TEXT = """
## Introduction
This is the introduction section with some content.

## Methods
This is the methods section with different content.

## Results
This is the results section.
"""

    def test_chunks_respect_section_boundaries(self):  # ref :100-125
        chunks = SectionChunker(max_chunk_size=500).chunk(self.TEXT)
        assert len(chunks) >= 3
        sections = [c["metadata"].get("section", "") for c in chunks]
        for s in ("Introduction", "Methods", "Results"):
            assert s in sections

    def test_header_line_stripped_from_content(self):
        chunks = SectionChunker(max_chunk_size=500).chunk(self.TEXT)
        for c in chunks:
            assert not c["text"].startswith("##")

    def test_hierarchy_metadata(self):  # ref :128-150 + :258-282 semantics
        text = """
## Section One
Content for section one.

### Deep Subsection
Content for the subsection.

## Section Two
Content for section two.
"""
        chunks = SectionChunker(max_chunk_size=500).chunk(text)
        sub = [c for c in chunks if c["metadata"].get("subsection")]
        assert sub
        assert sub[0]["metadata"]["section"] == "Section One"
        assert sub[0]["metadata"]["section_hierarchy"] == (
            "Section: Section One > Subsection: Deep Subsection"
        )
        # deeper level resets when the next ## appears
        last = [c for c in chunks if c["metadata"].get("section") == "Section Two"]
        assert last and "subsection" not in last[0]["metadata"]

    def test_oversized_section_split_with_parts(self):  # ref :278-294
        text = "\n## Very Long Section\n" + (
            "This is a sentence that makes the section very long. " * 50
        )
        chunks = SectionChunker(max_chunk_size=200, chunk_overlap=20).chunk(text)
        assert len(chunks) > 1
        for c in chunks:
            assert len(c["text"]) <= 200
            assert c["metadata"]["is_split_chunk"] is True
        n = len(chunks)
        assert chunks[0]["metadata"]["chunk_part"] == f"1/{n}"
        assert chunks[-1]["metadata"]["chunk_part"] == f"{n}/{n}"

    def test_only_headers_no_content(self):  # ref :355-371
        chunks = SectionChunker().chunk("\n## Header 1\n\n## Header 2\n\n## Header 3\n")
        assert chunks == []

    def test_unicode_preserved(self):  # ref :374-393
        text = """
## Résumé
This section contains unicode: café, naïve, 日本語.

## Symbols
Special chars: ©, ®, €, £, ¥, §.
"""
        chunks = SectionChunker(max_chunk_size=200).chunk(text)
        assert chunks
        all_text = " ".join(c["text"] for c in chunks)
        assert "café" in all_text and "日本語" in all_text and "€" in all_text


class TestSimpleMode:
    def test_fallback_metadata(self):  # langchain_chunker.py:284-324
        chunks = SectionChunker(
            max_chunk_size=100, chunk_overlap=10, use_section_awareness=False
        ).chunk("word " * 100)
        assert len(chunks) > 1
        for i, c in enumerate(chunks):
            assert c["metadata"]["chunk_index"] == i
            assert c["metadata"]["is_fallback_chunk"] is True
            assert len(c["text"]) <= 100


class TestEdgeCases:
    def test_single_very_long_word(self):  # ref :342-352
        chunks = SectionChunker(max_chunk_size=100, chunk_overlap=20).chunk("a" * 500)
        assert chunks
        for c in chunks:
            assert len(c["text"]) <= 100

    def test_splitter_long_word_hard_cut(self):
        s = RecursiveCharacterSplitter(chunk_size=100, chunk_overlap=20)
        parts = s.split_text("a" * 500)
        assert all(len(p) <= 100 for p in parts)
        assert "".join(p[:80] if i < len(parts) - 1 else p for i, p in enumerate(parts))


class TestMarkdownHelpers:
    def test_convert_numbered_sections(self):  # langchain_chunker.py:134-175
        text = "1. Introduction\nbody text here\n1.1 Scope\n1.1.1 Details\n"
        md = convert_to_markdown(text)
        lines = md.split("\n")
        assert lines[0] == "## 1. Introduction"
        assert lines[1] == "body text here"
        assert lines[2] == "### 1.1 Scope"
        assert lines[3] == "#### 1.1.1 Details"

    def test_convert_skips_unlikely_headers(self):
        md = convert_to_markdown("1. this starts lowercase\n2. " + "x" * 120 + "\n")
        assert "##" not in md

    def test_existing_markdown_passthrough(self):
        assert convert_to_markdown("## Already Marked\n") == "## Already Marked\n"

    def test_header_likelihood(self):  # langchain_chunker.py:177-215
        assert is_likely_section_header("Employee Benefits")
        assert not is_likely_section_header("lowercase start")
        assert not is_likely_section_header("Ends with the")
        assert not is_likely_section_header("Terms and conditions")
        assert not is_likely_section_header("X" * 101)
        assert not is_likely_section_header("")

    def test_split_markdown_metadata_reset(self):
        md = (
            "## A\ncontent a\n### A.1\ncontent a1\n#### A.1.1\ncontent a111\n"
            "## B\ncontent b\n"
        )
        parts = split_markdown_by_headers(md)
        metas = [m for _, m in parts]
        assert metas[0] == {"section": "A"}
        assert metas[1] == {"section": "A", "subsection": "A.1"}
        assert metas[2] == {
            "section": "A",
            "subsection": "A.1",
            "subsubsection": "A.1.1",
        }
        assert metas[3] == {"section": "B"}

    def test_split_markdown_aggregates_same_metadata(self):
        md = "## A\npara one\n\npara two\n"
        parts = split_markdown_by_headers(md)
        assert len(parts) == 1
        assert parts[0][0] == "para one  \npara two"

    def test_preamble_without_header(self):
        parts = split_markdown_by_headers("intro line\n## A\ncontent\n")
        assert parts[0] == ("intro line", {})
        assert parts[1] == ("content", {"section": "A"})
