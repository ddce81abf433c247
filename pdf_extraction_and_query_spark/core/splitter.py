"""Recursive character text splitting with overlap.

The reference delegates to LangChain's ``RecursiveCharacterTextSplitter``
(``src/chunking/langchain_chunker.py:235-242, 303-310`` with separators
``["\\n\\n", "\\n", ". ", " ", ""]`` from ``src/config/constants.py:77``).
LangChain is not a dependency here; this module reimplements the public
algorithm (langchain>=0.1.0 semantics, per the reference's requirements.txt)
from scratch:

  * pick the first separator (in preference order) present in the text; the
    remaining separators are the fallbacks for oversized fragments;
  * split keeping the separator attached to the *start* of the following
    fragment (``keep_separator=True``);
  * greedily re-merge fragments up to ``chunk_size``; when a chunk closes,
    carry back trailing fragments whose total length is <= ``chunk_overlap``;
  * joined chunks are stripped; empty chunks dropped;
  * fragments still longer than ``chunk_size`` recurse with the remaining
    separators; the empty-string separator splits per character (hard cut).

Behavior pinned by the reference's own invariant tests
(``tests/unit/test_chunking.py:17-54, 278-352``): no chunk exceeds
``chunk_size``, consecutive chunks overlap, a 500-char separator-less "word"
still splits.
"""

from __future__ import annotations

import re
from typing import List, Sequence

DEFAULT_SEPARATORS: List[str] = ["\n\n", "\n", ". ", " ", ""]  # constants.py:77


def _split_with_separator(text: str, separator: str) -> List[str]:
    """Split ``text`` on ``separator``, keeping the separator glued to the
    start of the following fragment; drop empty fragments."""
    if separator == "":
        return [c for c in text]
    pieces = re.split(f"({re.escape(separator)})", text)
    # pieces = [p0, sep, p1, sep, p2, ...]
    splits = [pieces[i] + pieces[i + 1] for i in range(1, len(pieces), 2)]
    if len(pieces) % 2 == 0:
        splits += pieces[-1:]
    splits = [pieces[0]] + splits
    return [s for s in splits if s != ""]


class RecursiveCharacterSplitter:
    """Size-bounded splitter with greedy merge + overlap carry-back."""

    def __init__(
        self,
        chunk_size: int,
        chunk_overlap: int,
        separators: Sequence[str] | None = None,
    ) -> None:
        if chunk_overlap >= chunk_size:
            raise ValueError("chunk_overlap must be smaller than chunk_size")
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap
        self.separators = list(separators) if separators is not None else list(
            DEFAULT_SEPARATORS
        )

    # -- public ------------------------------------------------------------

    def split_text(self, text: str) -> List[str]:
        return self._split(text, self.separators)

    # -- internals ----------------------------------------------------------

    def _split(self, text: str, separators: Sequence[str]) -> List[str]:
        final_chunks: List[str] = []

        separator = separators[-1]
        remaining: Sequence[str] = []
        for i, sep in enumerate(separators):
            if sep == "":
                separator = sep
                break
            if sep in text:
                separator = sep
                remaining = separators[i + 1 :]
                break

        splits = _split_with_separator(text, separator)

        good: List[str] = []
        for s in splits:
            if len(s) < self.chunk_size:
                good.append(s)
            else:
                if good:
                    final_chunks.extend(self._merge(good))
                    good = []
                if not remaining:
                    final_chunks.append(s)
                else:
                    final_chunks.extend(self._split(s, remaining))
        if good:
            final_chunks.extend(self._merge(good))
        return final_chunks

    def _merge(self, splits: Sequence[str]) -> List[str]:
        """Greedy accumulate fragments to ``chunk_size``; on flush, retain a
        trailing window of fragments totalling <= ``chunk_overlap`` as the
        start of the next chunk."""
        docs: List[str] = []
        current: List[str] = []
        total = 0
        for frag in splits:
            flen = len(frag)
            if total + flen > self.chunk_size:
                if current:
                    doc = "".join(current).strip()
                    if doc:
                        docs.append(doc)
                    while total > self.chunk_overlap or (
                        total + flen > self.chunk_size and total > 0
                    ):
                        total -= len(current[0])
                        current = current[1:]
            current.append(frag)
            total += flen
        doc = "".join(current).strip()
        if doc:
            docs.append(doc)
        return docs
