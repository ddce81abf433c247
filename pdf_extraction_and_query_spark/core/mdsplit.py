"""Numbered-section -> markdown conversion and markdown header splitting.

Reference semantics: ``src/chunking/langchain_chunker.py`` of
nahmann/PDF-Extraction-and-Query —
  * ``_convert_to_markdown`` ``:134-175`` (first-match-wins cascade
    1.1.1 -> ####, 1.1 -> ###, 1. -> ##, each gated by the header-likelihood
    heuristic; lines already starting ``##`` pass through),
  * ``_is_likely_section_header`` ``:177-215``,
  * markdown header split: the reference delegates to LangChain's
    ``MarkdownHeaderTextSplitter`` on ``[("##","section"),("###",
    "subsection"),("####","subsubsection")]`` (``:87-105``); reimplemented
    here from the public langchain>=0.1.0 semantics: split before each header
    line, header line removed from content, metadata = last seen title per
    level with deeper levels cleared when a shallower-or-equal header
    appears, blank lines flush a paragraph, consecutive paragraphs with
    identical metadata re-aggregate joined by ``"  \\n"``, every content line
    is stripped.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

PATTERN_SUBSUBSECTION = re.compile(r"^(\d+\.\d+\.\d+)\.?\s+(.+)$")  # constants.py:17
PATTERN_SUBSECTION = re.compile(r"^(\d+\.\d+)\.?\s+(.+)$")  # constants.py:16
PATTERN_MAIN_SECTION = re.compile(r"^(\d+)\.\s+(.+)$")  # constants.py:15

# constants.py:80-84 / langchain_chunker.py:87-91
MARKDOWN_HEADERS: List[Tuple[str, str]] = [
    ("##", "section"),
    ("###", "subsection"),
    ("####", "subsubsection"),
]

_HEADER_ENDINGS = (",", "and", "or", "the", "a", "an", "of", "to", "in")
_CONTINUATION_ENDINGS = ("applicable to", "conditions", "procedures", "including")


def is_likely_section_header(text: str) -> bool:
    """Header-likelihood heuristic (langchain_chunker.py:177-215)."""
    text = text.strip()
    if not text:
        return False
    if not text[0].isupper():
        return False
    if len(text) > 100:
        return False
    if text.endswith(_HEADER_ENDINGS):
        return False
    lowered = text.lower()
    if any(lowered.endswith(w) for w in _CONTINUATION_ENDINGS):
        return False
    return True


def convert_to_markdown(text: str) -> str:
    """Convert numbered section headings to markdown headers
    (langchain_chunker.py:134-175)."""
    out: List[str] = []
    for line in text.split("\n"):
        m = PATTERN_SUBSUBSECTION.match(line)
        if m and is_likely_section_header(m.group(2)):
            out.append(f"#### {m.group(1)} {m.group(2)}")
            continue
        m = PATTERN_SUBSECTION.match(line)
        if m and is_likely_section_header(m.group(2)):
            out.append(f"### {m.group(1)} {m.group(2)}")
            continue
        m = PATTERN_MAIN_SECTION.match(line)
        if m and is_likely_section_header(m.group(2)):
            out.append(f"## {m.group(1)}. {m.group(2)}")
            continue
        out.append(line)
    return "\n".join(out)


def split_markdown_by_headers(
    text: str,
    headers_to_split_on: List[Tuple[str, str]] | None = None,
) -> List[Tuple[str, Dict[str, str]]]:
    """Split markdown text at header lines, carrying hierarchical metadata.

    Returns ``[(content, metadata), ...]`` in document order. Content never
    contains the header lines; metadata maps header names (``section`` etc.)
    to the currently-active title at each level.
    """
    headers = headers_to_split_on or MARKDOWN_HEADERS
    # longest separator first so '####' is tested before '##'
    headers = sorted(headers, key=lambda h: len(h[0]), reverse=True)

    lines = text.split("\n")
    paragraphs: List[Tuple[str, Dict[str, str]]] = []
    current_content: List[str] = []
    current_metadata: Dict[str, str] = {}
    header_stack: List[Tuple[int, str]] = []  # (level, name)
    active_metadata: Dict[str, str] = {}

    for line in lines:
        stripped = line.strip()
        matched = False
        for sep, name in headers:
            if stripped.startswith(sep) and (
                len(stripped) == len(sep) or stripped[len(sep)] == " "
            ):
                level = sep.count("#")
                while header_stack and header_stack[-1][0] >= level:
                    _, popped_name = header_stack.pop()
                    active_metadata.pop(popped_name, None)
                header_stack.append((level, name))
                active_metadata[name] = stripped[len(sep) :].strip()
                if current_content:
                    paragraphs.append(
                        ("\n".join(current_content), dict(current_metadata))
                    )
                    current_content = []
                matched = True
                break
        if not matched:
            if stripped:
                current_content.append(stripped)
            elif current_content:
                paragraphs.append(("\n".join(current_content), dict(current_metadata)))
                current_content = []
        current_metadata = dict(active_metadata)

    if current_content:
        paragraphs.append(("\n".join(current_content), dict(current_metadata)))

    # aggregate consecutive paragraphs with identical metadata
    aggregated: List[Tuple[str, Dict[str, str]]] = []
    for content, meta in paragraphs:
        if aggregated and aggregated[-1][1] == meta:
            prev_content, prev_meta = aggregated[-1]
            aggregated[-1] = (prev_content + "  \n" + content, prev_meta)
        else:
            aggregated.append((content, meta))
    return aggregated
