"""Section-aware / size-based chunker.

Reference semantics: ``src/chunking/langchain_chunker.py:46-324`` of
nahmann/PDF-Extraction-and-Query. Two modes, both product surface
(``src/chunking/factory.py:45-71``):

  * section-aware (``use_section_awareness=True``): numbered-section ->
    markdown conversion, split at ``##/###/####`` headers, recursive
    size-split of oversized sections with ``chunk_part i/n`` labels,
    ``section_hierarchy`` annotation (``:258-282``);
  * simple (``False``): one recursive size split over the whole text with
    ``chunk_index`` + ``is_fallback_chunk`` metadata (``:284-324``).

Defaults mirror ``src/config/settings.py:30-31``: max_chunk_size=1000,
chunk_overlap=200. Empty input -> ``[]`` (``:67-68``); oversized-section
overlap clamps to ``max_chunk_size - 1`` (``:233``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from .mdsplit import convert_to_markdown, split_markdown_by_headers
from .splitter import DEFAULT_SEPARATORS, RecursiveCharacterSplitter

DEFAULT_MAX_CHUNK_SIZE = 1000  # settings.py:30
DEFAULT_CHUNK_OVERLAP = 200  # settings.py:31


class SectionChunker:
    """Chunk cleaned text into size-bounded, section-annotated records."""

    def __init__(
        self,
        max_chunk_size: int = DEFAULT_MAX_CHUNK_SIZE,
        chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
        use_section_awareness: bool = True,
    ) -> None:
        self.max_chunk_size = max_chunk_size
        self.chunk_overlap = chunk_overlap
        self.use_section_awareness = use_section_awareness

    def chunk(
        self, text: str, metadata: Optional[Dict[str, Any]] = None
    ) -> List[Dict[str, Any]]:
        """Return ``[{text, metadata, chunk_size}, ...]`` in document order
        (langchain_chunker.py:46-132)."""
        if not text or not text.strip():
            return []
        base_metadata = dict(metadata or {})

        if not self.use_section_awareness:
            return self._fallback_chunk(text, base_metadata)

        markdown_text = convert_to_markdown(text)
        header_chunks = split_markdown_by_headers(markdown_text)

        final_chunks: List[Dict[str, Any]] = []
        for chunk_text, chunk_meta in header_chunks:
            chunk_metadata = {**base_metadata, **chunk_meta}
            if len(chunk_text) > self.max_chunk_size:
                final_chunks.extend(self._split_large_chunk(chunk_text, chunk_metadata))
            else:
                chunk_metadata["is_split_chunk"] = False
                final_chunks.append(
                    {
                        "text": chunk_text,
                        "metadata": chunk_metadata,
                        "chunk_size": len(chunk_text),
                    }
                )
        return self._add_section_hierarchy(final_chunks)

    def _split_large_chunk(
        self, text: str, base_metadata: Dict[str, Any]
    ) -> List[Dict[str, Any]]:
        """Recursive size split of an oversized section
        (langchain_chunker.py:217-256)."""
        overlap = min(self.chunk_overlap, self.max_chunk_size - 1)
        splitter = RecursiveCharacterSplitter(
            chunk_size=self.max_chunk_size,
            chunk_overlap=overlap,
            separators=DEFAULT_SEPARATORS,
        )
        sub_texts = splitter.split_text(text)
        sub_chunks = []
        for i, sub_text in enumerate(sub_texts):
            meta = dict(base_metadata)
            meta["chunk_part"] = f"{i + 1}/{len(sub_texts)}"
            meta["is_split_chunk"] = True
            sub_chunks.append(
                {"text": sub_text, "metadata": meta, "chunk_size": len(sub_text)}
            )
        return sub_chunks

    @staticmethod
    def _add_section_hierarchy(
        chunks: List[Dict[str, Any]],
    ) -> List[Dict[str, Any]]:
        """Annotate ``section_hierarchy`` (langchain_chunker.py:258-282)."""
        for chunk in chunks:
            meta = chunk["metadata"]
            parts = []
            if "section" in meta:
                parts.append(f"Section: {meta['section']}")
            if "subsection" in meta:
                parts.append(f"Subsection: {meta['subsection']}")
            if "subsubsection" in meta:
                parts.append(f"Sub-subsection: {meta['subsubsection']}")
            if parts:
                meta["section_hierarchy"] = " > ".join(parts)
        return chunks

    def _fallback_chunk(
        self, text: str, base_metadata: Dict[str, Any]
    ) -> List[Dict[str, Any]]:
        """Simple size-based mode (langchain_chunker.py:284-324)."""
        splitter = RecursiveCharacterSplitter(
            chunk_size=self.max_chunk_size,
            chunk_overlap=min(self.chunk_overlap, self.max_chunk_size - 1),
            separators=DEFAULT_SEPARATORS,
        )
        chunks = []
        for i, chunk_text in enumerate(splitter.split_text(text)):
            meta = dict(base_metadata)
            meta["chunk_index"] = i
            meta["is_fallback_chunk"] = True
            chunks.append(
                {"text": chunk_text, "metadata": meta, "chunk_size": len(chunk_text)}
            )
        return chunks
