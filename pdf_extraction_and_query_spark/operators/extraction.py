"""Staged Spark extraction operators over the interleaved span corpus.

Input schema (BASELINE.json input_hint):
    documents_spans(doc_id string,
                    spans array<struct<kind,text,media_ref,offset[,page,
                                       font_size,bold]>>)

Stage layout (each stage is independently queryable; shuffle keys noted):

  1. ``explode_spans``     — explode + derive page (explicit field wins, else
                             running page-marker count) + media-segment index;
                             one window shuffle on ``doc_id``.
  2. ``flag_boilerplate``  — repeated-line frequency strip (north rule): a
                             normalized line recurring on >= K distinct pages
                             of a doc is boilerplate; window shuffle on
                             ``(doc_id, norm)`` with ``collect_set(page)``
                             (partial aggregation happens map-side).
  3. ``reconstruct_blocks``— grouped-map Arrow UDF per ``(doc_id, page)``:
                             page font mode, per-line features, buffer fold +
                             header re-eval (core kernels). Page granularity
                             is semantics-preserving (the merge predicate
                             never crosses pages) and is the skew treatment:
                             a 1000-page report becomes 1000 independent
                             tasks instead of one straggler.
  4. ``chunk_blocks``      — grouped-map Arrow UDF per ``(doc_id, seg)``:
                             header markup -> clean -> section-aware chunking.
  5. ``interleave``        — union chunks with media spans, global per-doc
                             ``order`` via one window on ``doc_id``.

Reference parity notes: stages 3-4 run the exact fold/split kernels from
``core`` (ported from src/extraction/formatting_extractor.py and
src/chunking/langchain_chunker.py of the reference); everything else is
native column expressions / windows that Catalyst fully optimizes.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import boilerplate as bp
from ..core.chunker import SectionChunker
from ..core.docpipe import ExtractConfig, MEDIA_KINDS
from ..core.lines import (
    DEFAULT_FONT_SIZE,
    blocks_to_marked_text,
    line_features,
    page_font_mode,
    reconstruct_wrapped_lines,
)
from ..core.textclean import clean

LINES_SCHEMA_FIELDS = (
    "doc_id string, offset int, kind string, text string, media_ref string, "
    "page int, seg int, font_size double, bold boolean"
)

BLOCKS_SCHEMA = (
    "doc_id string, offset int, page int, seg int, text string, "
    "font_size double, is_bold boolean, is_all_caps boolean, "
    "is_larger boolean, is_likely_header boolean"
)

CHUNKS_SCHEMA = (
    "doc_id string, seg int, chunk_seq int, text string, chunk_size int, "
    "section string, subsection string, subsubsection string, "
    "section_hierarchy string, chunk_part string, is_split_chunk boolean"
)

OUT_SCHEMA = "doc_id string, `order` int, kind string, text string, media_ref string"


def explode_spans(spans_df: DataFrame) -> DataFrame:
    """Stage 1: span rows with derived ``page`` and media-segment ``seg``;
    page_marker spans are dropped (they are page-boundary metadata, not
    content — see core/docpipe.py spec)."""
    cols = [f.name for f in spans_df.schema["spans"].dataType.elementType.fields]
    line = F.explode("spans").alias("span")
    df = spans_df.select("doc_id", line).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
        (F.col("span.page") if "page" in cols else F.lit(None)).cast("int").alias("page_field"),
        (F.col("span.font_size") if "font_size" in cols else F.lit(None)).cast("double").alias("font_size"),
        (F.col("span.bold") if "bold" in cols else F.lit(None)).cast("boolean").alias("bold"),
    )
    w = Window.partitionBy("doc_id").orderBy("offset")
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    is_marker = (F.col("kind") == "page_marker").cast("int")
    is_media = F.col("kind").isin(*MEDIA_KINDS).cast("int")
    df = (
        df.withColumn(
            "derived_page",
            F.greatest(
                F.coalesce(F.sum(is_marker).over(w.rowsBetween(Window.unboundedPreceding, 0)), F.lit(0)),
                F.lit(1),
            ),
        )
        .withColumn("seg", F.coalesce(F.sum(is_media).over(w_prev), F.lit(0)).cast("int"))
        .withColumn("page", F.coalesce(F.col("page_field"), F.col("derived_page")).cast("int"))
        .filter(F.col("kind") != "page_marker")
        .drop("page_field", "derived_page")
    )
    return df


def flag_boilerplate(lines_df: DataFrame, min_pages: int = bp.DEFAULT_MIN_PAGES) -> DataFrame:
    """Stage 2: mark text lines whose normalized form recurs on >= min_pages
    distinct pages of the same document (north-rule boilerplate strip).

    Normalization mirrors ``core.boilerplate.normalize_line``: lowercase,
    digit runs -> '0', whitespace runs -> ' ', trimmed. Spark-native: one
    window with ``collect_set(page)`` per (doc_id, norm)."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"\d+", "0"), r"\s+", " "
        )
    )
    df = lines_df.withColumn(
        "norm",
        F.when(F.col("kind") == "text", norm).otherwise(F.lit(None)),
    )
    w = Window.partitionBy("doc_id", "norm")
    n_pages = F.size(F.collect_set("page").over(w))
    is_boiler = (
        (F.col("kind") == "text")
        & (F.col("norm") != "")
        & (F.length("norm") <= bp.MAX_BOILERPLATE_LEN)
        & (n_pages >= F.lit(min_pages))
    )
    return df.withColumn("is_boiler", F.coalesce(is_boiler, F.lit(False))).drop("norm")


def reconstruct_blocks(lines_df: DataFrame) -> DataFrame:
    """Stage 3: grouped-map fold per (doc_id, page) — the exact reference
    reconstruction semantics (formatting_extractor.py:192-329) via the core
    kernel; page font mode computed in-group over ALL text lines of the page
    (including whitespace-only ones, matching formatting_extractor.py:74-86)
    before the empty-line filter."""
    text_lines = lines_df.filter(F.col("kind") == "text")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("offset")
        sizes = [float(s) for s in pdf["font_size"] if pd.notna(s)]
        normal = page_font_mode(sizes) if sizes else DEFAULT_FONT_SIZE
        feats = []
        for row in pdf.itertuples(index=False):
            text = (row.text or "").strip()
            if not text or row.is_boiler:
                continue
            rec = line_features(
                text,
                int(row.page),
                None if pd.isna(row.font_size) else float(row.font_size),
                None if row.bold is None or pd.isna(row.bold) else bool(row.bold),
                normal,
            )
            rec["seg"] = int(row.seg)
            rec["offset"] = int(row.offset)
            feats.append(rec)
        blocks = reconstruct_wrapped_lines(feats)
        if not blocks:
            return pd.DataFrame(
                columns=[
                    "doc_id", "offset", "page", "seg", "text", "font_size",
                    "is_bold", "is_all_caps", "is_larger", "is_likely_header",
                ]
            )
        doc_id = pdf["doc_id"].iloc[0]
        return pd.DataFrame(
            {
                "doc_id": [doc_id] * len(blocks),
                "offset": [b["offset"] for b in blocks],
                "page": [b["page"] for b in blocks],
                "seg": [b["seg"] for b in blocks],
                "text": [b["text"] for b in blocks],
                "font_size": [b["font_size"] for b in blocks],
                "is_bold": [b["is_bold"] for b in blocks],
                "is_all_caps": [b["is_all_caps"] for b in blocks],
                "is_larger": [b["is_larger"] for b in blocks],
                "is_likely_header": [b["is_likely_header"] for b in blocks],
            }
        )

    return text_lines.groupBy("doc_id", "page").applyInPandas(fold, BLOCKS_SCHEMA)


def chunk_blocks(blocks_df: DataFrame, cfg: ExtractConfig = ExtractConfig()) -> DataFrame:
    """Stage 4: grouped-map per (doc_id, seg): header markup -> clean ->
    section-aware chunking (core kernels; reference rag_service.py:73-86
    lifecycle)."""
    chunker = SectionChunker(
        max_chunk_size=cfg.max_chunk_size,
        chunk_overlap=cfg.chunk_overlap,
        use_section_awareness=cfg.use_section_awareness,
    )

    def do_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("offset")
        blocks = [
            {"text": t, "is_likely_header": bool(h)}
            for t, h in zip(pdf["text"], pdf["is_likely_header"])
        ]
        marked = blocks_to_marked_text(blocks)
        cleaned, _ = clean(marked, validate=False)
        chunks = chunker.chunk(cleaned)
        doc_id = pdf["doc_id"].iloc[0]
        seg = int(pdf["seg"].iloc[0])
        meta = [c["metadata"] for c in chunks]
        return pd.DataFrame(
            {
                "doc_id": [doc_id] * len(chunks),
                "seg": [seg] * len(chunks),
                "chunk_seq": list(range(len(chunks))),
                "text": [c["text"] for c in chunks],
                "chunk_size": [c["chunk_size"] for c in chunks],
                "section": [m.get("section") for m in meta],
                "subsection": [m.get("subsection") for m in meta],
                "subsubsection": [m.get("subsubsection") for m in meta],
                "section_hierarchy": [m.get("section_hierarchy") for m in meta],
                "chunk_part": [m.get("chunk_part") for m in meta],
                "is_split_chunk": [bool(m.get("is_split_chunk", False)) for m in meta],
            }
        )

    return blocks_df.groupBy("doc_id", "seg").applyInPandas(do_chunk, CHUNKS_SCHEMA)


def interleave(chunks_df: DataFrame, lines_df: DataFrame) -> DataFrame:
    """Stage 5: text chunks + media spans -> per-doc global order.
    Media span k (k-th media of the doc, == its ``seg``) follows segment k's
    chunks."""
    chunk_rows = chunks_df.select(
        "doc_id",
        "seg",
        F.lit(0).alias("mrank"),
        F.col("chunk_seq").alias("pos"),
        F.lit("text").alias("kind"),
        "text",
        F.lit(None).cast("string").alias("media_ref"),
    )
    media_rows = lines_df.filter(F.col("kind").isin(*MEDIA_KINDS)).select(
        "doc_id",
        "seg",
        F.lit(1).alias("mrank"),
        F.lit(0).alias("pos"),
        "kind",
        "text",
        "media_ref",
    )
    unioned = chunk_rows.unionByName(media_rows)
    w = Window.partitionBy("doc_id").orderBy("seg", "mrank", "pos")
    return (
        unioned.withColumn("order", (F.row_number().over(w) - 1).cast("int"))
        .select("doc_id", "order", "kind", "text", "media_ref")
    )


def fused_extract(spans_df: DataFrame, cfg: ExtractConfig = ExtractConfig()) -> DataFrame:
    """Single-shuffle alternative: the whole eager kernel per document via
    mapInPandas over the nested span arrays (one Arrow batch of docs at a
    time). Minimal shuffle (none — narrow map over the scan), maximal
    per-doc skew exposure; right when documents are small and uniform,
    wrong for 1000-page stragglers. Benchmarked against the staged path."""
    from ..core.docpipe import extract_document

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "order": [], "kind": [], "text": [], "media_ref": []}
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                span_dicts = [
                    s if isinstance(s, dict) else s.asDict() for s in spans
                ]
                for rec in extract_document(span_dicts, cfg):
                    out["doc_id"].append(doc_id)
                    out["order"].append(rec["order"])
                    out["kind"].append(rec["kind"])
                    out["text"].append(rec["text"])
                    out["media_ref"].append(rec["media_ref"])
            yield pd.DataFrame(out)

    return spans_df.mapInPandas(run, OUT_SCHEMA)
