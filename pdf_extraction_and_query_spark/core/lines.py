"""Line-level layout kernel: features, wrapped-line reconstruction, header
re-evaluation.

Reference semantics: ``src/extraction/formatting_extractor.py`` of
nahmann/PDF-Extraction-and-Query —
  * per-line features ``:150-188``,
  * buffer fold for wrapped-line reconstruction ``:192-231``,
  * merge predicate ``:233-283`` (NB: the predicate reads the *grown* buffer
    text, so a lag-window shortcut is not exact — we keep the fold),
  * header re-evaluation scoring ``:285-329``,
  * page font-size mode ``:74-86`` (reference tie-break is CPython set order,
    i.e. undefined; we define: highest count, then smallest size; default 11).

Thresholds from ``src/config/constants.py:33-58,95``.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Any, Dict, Iterable, List, Optional, Sequence

MIN_LINE_LENGTH_FOR_MERGE = 15  # constants.py:38
FONT_SIZE_TOLERANCE = 1.0  # constants.py:39
SHORT_HEADER_LENGTH = 80  # constants.py:35
SENTENCE_TERMINATORS = (".", ":", "!", "?", ";")  # constants.py:49
CONTINUATION_STARTS = (
    "and ", "or ", "the ", "to ", "of ", "in ", "for ", "with ",
)  # constants.py:56-58
DEFAULT_FONT_SIZE = 11.0  # formatting_extractor.py:85 fallback

_STARTS_WORD_RE = re.compile(r"^[\d\w]")
_BULLET_RE = re.compile(r"^-\s+")  # constants.py:24
_NUMBERED_LIST_RE = re.compile(r"^\d+\)\s+")  # constants.py:25
_NAME_TITLE_RE = re.compile(r"^[A-Z][a-z]+\s+[A-Z][a-z]+,\s+")  # constants.py:26


def page_font_mode(sizes: Iterable[float]) -> float:
    """Most common font size on a page; deterministic tie-break (highest
    count, then smallest size); default 11 when the page has no sizes.

    The reference (formatting_extractor.py:83-86) uses
    ``max(set(sizes), key=sizes.count)`` whose tie-break is CPython set
    iteration order — undefined semantics. We pin it down.
    """
    counts = Counter(sizes)
    if not counts:
        return DEFAULT_FONT_SIZE
    return min(counts, key=lambda s: (-counts[s], s))


def line_features(
    text: str,
    page: int,
    font_size: Optional[float],
    is_bold: Optional[bool],
    normal_font_size: float,
) -> Dict[str, Any]:
    """Per-line feature record (formatting_extractor.py:162-188).

    ``font_size``/``is_bold`` may be absent in the corpus; we degrade to
    ``DEFAULT_FONT_SIZE`` / ``False`` deterministically.
    """
    text = text.strip()
    fs = DEFAULT_FONT_SIZE if font_size is None else float(font_size)
    bold = bool(is_bold) if is_bold is not None else False
    is_all_caps = text.isupper() and len(text) > 3
    is_larger = fs > normal_font_size
    is_short = len(text) < SHORT_HEADER_LENGTH
    is_likely_header = (
        (bold and is_all_caps)
        or (bold and is_larger)
        or (bold and is_short and bool(_STARTS_WORD_RE.match(text)))
    )
    return {
        "text": text,
        "page": page,
        "font_size": fs,
        "is_bold": bold,
        "is_all_caps": is_all_caps,
        "is_larger": is_larger,
        "is_likely_header": is_likely_header,
    }


def should_merge_lines(prev: Dict[str, Any], curr: Dict[str, Any]) -> bool:
    """Exact port of the merge predicate (formatting_extractor.py:233-283).

    ``prev`` is the *accumulated buffer* (its text may already be a
    concatenation of several physical lines)."""
    if prev["page"] != curr["page"]:
        return False
    if prev["is_bold"] != curr["is_bold"]:
        return False
    if abs(prev["font_size"] - curr["font_size"]) > FONT_SIZE_TOLERANCE:
        return False

    prev_text = prev["text"].strip()
    curr_text = curr["text"].strip()

    if len(prev_text) < MIN_LINE_LENGTH_FOR_MERGE:
        return False
    if prev_text.endswith(SENTENCE_TERMINATORS):
        return False

    return (curr_text[0].islower() if curr_text else False) or any(
        curr_text.startswith(s) for s in CONTINUATION_STARTS
    )


def reevaluate_header_status(block: Dict[str, Any]) -> Dict[str, Any]:
    """Multi-signal header rescoring after reconstruction
    (formatting_extractor.py:285-329). Mutates and returns ``block``."""
    text = block["text"].strip()

    is_bold = block.get("is_bold", False)
    is_all_caps = block.get("is_all_caps", False)
    if not (is_bold or is_all_caps):
        block["is_likely_header"] = False
        return block

    score = 0
    if block.get("is_larger", False):
        score += 1
    if 15 <= len(text) <= 80:
        score += 1
    if text.endswith(":") or (len(text) < 40 and "," not in text):
        score += 1
    is_list_item = (
        text.count(",") >= 2
        or _BULLET_RE.match(text)
        or _NUMBERED_LIST_RE.match(text)
        or _NAME_TITLE_RE.match(text)
    )
    if not is_list_item:
        score += 1

    block["is_likely_header"] = score >= 2
    return block


def reconstruct_wrapped_lines(
    formatted_blocks: Sequence[Dict[str, Any]],
) -> List[Dict[str, Any]]:
    """Buffer fold merging wrapped lines (formatting_extractor.py:192-231).

    Sequential within a document (or page — the predicate never merges
    across pages, so running this per page is semantics-preserving), and
    embarrassingly parallel across documents/pages.

    Extension for the interleaved-span contract: if a block carries a
    ``seg`` key (media-segment index), a segment change always breaks the
    buffer — text separated by a figure/table never merges.
    """
    if not formatted_blocks:
        return list(formatted_blocks)

    reconstructed: List[Dict[str, Any]] = []
    buffer: Optional[Dict[str, Any]] = None

    for block in formatted_blocks:
        if buffer is None:
            buffer = dict(block)
            continue
        same_seg = buffer.get("seg") == block.get("seg")
        if same_seg and should_merge_lines(buffer, block):
            buffer["text"] += " " + block["text"]
        else:
            reconstructed.append(reevaluate_header_status(buffer))
            buffer = dict(block)

    if buffer:
        reconstructed.append(reevaluate_header_status(buffer))

    return reconstructed


def blocks_to_marked_text(blocks: Sequence[Dict[str, Any]]) -> str:
    """Assemble document text with ``## `` header markup
    (formatting_extractor.py:107-115)."""
    parts: List[str] = []
    for block in blocks:
        if block["is_likely_header"]:
            parts.append(f"\n## {block['text']}\n")
        else:
            parts.append(block["text"] + "\n")
    return "".join(parts)
