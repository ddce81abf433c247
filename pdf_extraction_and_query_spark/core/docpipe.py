"""Eager per-document pipeline — the reference-semantics ORACLE.

This is the single-document, single-threaded composition of the kernels in
this package, mirroring the reference's ingest lifecycle
(``src/api/services/rag_service.py:49-127``: extract -> clean -> chunk) plus
the two graft extensions (media passthrough, boilerplate strip). The Spark
pipeline (``plans/extract.py``) must produce byte-identical span sequences;
``tests/test_pipeline_equality.py`` enforces it.

Interleaved-span contract (documented spec, since the reference drops media
— ``src/extraction/pymupdf_extractor.py:124``):

  * input spans are ordered by ``offset``; ``kind='page_marker'`` spans mark
    page starts and are dropped from content (the reference's marker-removal
    regex remains part of ``clean`` and is exercised by unit tests and the
    page-marker corpus trait);
  * media spans (``figure``/``table``) partition each document into text
    SEGMENTS; each segment runs the full reference text pipeline
    independently (reconstruct -> header markup -> clean -> chunk);
  * output = segment-0 chunks, media-0, segment-1 chunks, media-1, ... with
    a global 0-based ``order``. For media-free documents this is exactly the
    reference pipeline's chunk sequence.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Sequence

from . import boilerplate as bp
from .chunker import DEFAULT_CHUNK_OVERLAP, DEFAULT_MAX_CHUNK_SIZE, SectionChunker
from .lines import (
    DEFAULT_FONT_SIZE,
    blocks_to_marked_text,
    line_features,
    page_font_mode,
    reconstruct_wrapped_lines,
)
from .textclean import clean

MEDIA_KINDS = ("figure", "table")


@dataclass(frozen=True)
class ExtractConfig:
    max_chunk_size: int = DEFAULT_MAX_CHUNK_SIZE
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP
    use_section_awareness: bool = True
    boilerplate_min_pages: int = bp.DEFAULT_MIN_PAGES
    strip_boilerplate: bool = True


def _with_pages_and_segments(
    spans: Sequence[Dict[str, Any]],
) -> List[Dict[str, Any]]:
    """Sort by offset, derive ``page`` (explicit field wins, else running
    page-marker count) and ``seg`` (count of media spans before this span),
    and drop page_marker spans."""
    ordered = sorted(spans, key=lambda s: s["offset"])
    out: List[Dict[str, Any]] = []
    markers_seen = 0
    media_seen = 0
    for s in ordered:
        kind = s.get("kind")
        if kind == "page_marker":
            markers_seen += 1
            continue
        derived_page = max(1, markers_seen)
        page = s.get("page")
        rec = dict(s)
        rec["page"] = int(page) if page is not None else derived_page
        rec["seg"] = media_seen
        if kind in MEDIA_KINDS:
            media_seen += 1
        out.append(rec)
    return out


def extract_lines(
    spans: Sequence[Dict[str, Any]], cfg: ExtractConfig = ExtractConfig()
) -> List[Dict[str, Any]]:
    """Stage 1-2: page/segment derivation, page font mode, boilerplate strip,
    per-line features. Returns feature records (text lines only) plus media
    records untouched, all carrying ``page``/``seg``."""
    prepared = _with_pages_and_segments(spans)
    text_spans = [s for s in prepared if s["kind"] == "text"]

    # page font mode over ALL text spans of the page (reference collects
    # sizes before the empty-line filter, formatting_extractor.py:74-86)
    sizes_by_page: Dict[int, List[float]] = {}
    for s in text_spans:
        if s.get("font_size") is not None:
            sizes_by_page.setdefault(s["page"], []).append(float(s["font_size"]))
    mode_by_page = {p: page_font_mode(v) for p, v in sizes_by_page.items()}

    # boilerplate can only fire for docs spanning >= min_pages pages (spec);
    # for the 1-3-page long tail we skip normalization entirely, and when it
    # does run, each line is normalized ONCE (memoized — footers repeat) and
    # the result reused for the membership test (was ~30% of kernel CPU).
    boiler: set = set()
    norm_memo: Dict[str, str] = {}
    if cfg.strip_boilerplate and len(
        {s["page"] for s in text_spans}
    ) >= cfg.boilerplate_min_pages:

        def _norm(t: str) -> str:
            n = norm_memo.get(t)
            if n is None:
                n = norm_memo[t] = bp.normalize_line(t)
            return n

        boiler = bp.boilerplate_keys_from_norms(
            (
                (_norm((s.get("text") or "").strip()), s["page"])
                for s in text_spans
            ),
            cfg.boilerplate_min_pages,
        )

    out: List[Dict[str, Any]] = []
    for s in prepared:
        if s["kind"] != "text":
            out.append(s)
            continue
        text = (s.get("text") or "").strip()
        if not text:
            continue  # formatting_extractor.py:162-164
        if boiler and norm_memo.get(text, "") in boiler:
            continue
        feats = line_features(
            text,
            s["page"],
            s.get("font_size"),
            s.get("bold"),
            mode_by_page.get(s["page"], DEFAULT_FONT_SIZE),
        )
        feats["kind"] = "text"
        feats["seg"] = s["seg"]
        feats["offset"] = s["offset"]
        feats["media_ref"] = None
        out.append(feats)
    return out


def reconstruct_blocks(
    spans: Sequence[Dict[str, Any]], cfg: ExtractConfig = ExtractConfig()
) -> List[Dict[str, Any]]:
    """Stage 3: wrapped-line reconstruction + header re-eval over the text
    lines (media records pass through in position)."""
    lines = extract_lines(spans, cfg)
    text_lines = [r for r in lines if r["kind"] == "text"]
    media = [r for r in lines if r["kind"] != "text"]
    blocks = reconstruct_wrapped_lines(text_lines)
    merged = blocks + media
    merged.sort(key=lambda r: r["offset"])
    return merged


def extract_document(
    spans: Sequence[Dict[str, Any]], cfg: ExtractConfig = ExtractConfig()
) -> List[Dict[str, Any]]:
    """Full pipeline for one document -> ordered output span sequence
    ``[{kind, text, media_ref, order}, ...]``."""
    records = reconstruct_blocks(spans, cfg)
    n_segs = max((r["seg"] for r in records), default=-1) + 1

    chunker = SectionChunker(
        max_chunk_size=cfg.max_chunk_size,
        chunk_overlap=cfg.chunk_overlap,
        use_section_awareness=cfg.use_section_awareness,
    )

    media_by_seg: Dict[int, Dict[str, Any]] = {}
    blocks_by_seg: Dict[int, List[Dict[str, Any]]] = {}
    for r in records:
        if r["kind"] == "text":
            blocks_by_seg.setdefault(r["seg"], []).append(r)
        else:
            media_by_seg[r["seg"]] = r

    out: List[Dict[str, Any]] = []
    for seg in range(n_segs):
        blocks = blocks_by_seg.get(seg, [])
        if blocks:
            marked = blocks_to_marked_text(blocks)
            cleaned, _ = clean(marked, validate=False)
            for ch in chunker.chunk(cleaned):
                out.append(
                    {"kind": "text", "text": ch["text"], "media_ref": None}
                )
        m = media_by_seg.get(seg)
        if m is not None:
            out.append(
                {
                    "kind": m["kind"],
                    "text": m.get("text"),
                    "media_ref": m.get("media_ref"),
                }
            )
    for i, rec in enumerate(out):
        rec["order"] = i
    return out


def chunk_records(
    spans: Sequence[Dict[str, Any]], cfg: ExtractConfig = ExtractConfig()
) -> List[Dict[str, Any]]:
    """Chunk rows with full metadata (analog of the reference's chunks table,
    ``src/vector_store/schema.py:55-78``): ``{seg, chunk_index, text,
    chunk_size, metadata}`` with doc-global chunk_index."""
    records = reconstruct_blocks(spans, cfg)
    chunker = SectionChunker(
        max_chunk_size=cfg.max_chunk_size,
        chunk_overlap=cfg.chunk_overlap,
        use_section_awareness=cfg.use_section_awareness,
    )
    blocks_by_seg: Dict[int, List[Dict[str, Any]]] = {}
    for r in records:
        if r["kind"] == "text":
            blocks_by_seg.setdefault(r["seg"], []).append(r)

    out: List[Dict[str, Any]] = []
    idx = 0
    for seg in sorted(blocks_by_seg):
        marked = blocks_to_marked_text(blocks_by_seg[seg])
        cleaned, _ = clean(marked, validate=False)
        for ch in chunker.chunk(cleaned):
            out.append(
                {
                    "seg": seg,
                    "chunk_index": idx,
                    "text": ch["text"],
                    "chunk_size": ch["chunk_size"],
                    "metadata": ch["metadata"],
                }
            )
            idx += 1
    return out
