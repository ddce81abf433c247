"""Staged Spark extraction operators over the interleaved span corpus.

Input schema (BASELINE.json input_hint):
    documents_spans(doc_id string,
                    spans array<struct<kind,text,media_ref,offset[,page,
                                       font_size,bold]>>)

Stage layout (each stage is independently queryable; shuffle keys noted):

  1. ``explode_spans``     — explode + derive page (explicit field wins, else
                             running page-marker count) + media-segment index.
                             Default: one doc_id window (single shuffle, one
                             task per doc).  ``banded=True`` switches to a
                             DISTRIBUTED PREFIX SCAN on offset bands so a
                             400k-span whale spreads over ~100 parallel tasks
                             instead of one — hybrid mode routes exactly the
                             whale docs there (PLANS.md §8).
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


# spans per prefix-scan band: offsets are per-doc ordinals, so
# floor(offset / SPAN_BAND) cuts each doc into contiguous offset ranges.
# A 400k-span whale becomes ~100 parallel window tasks; a normal document
# stays a single band (the banding is then a no-op join with a 1-row-per-doc
# totals frame).
SPAN_BAND = 4096


def explode_spans(spans_df: DataFrame, banded: bool = False) -> DataFrame:
    """Stage 1: span rows with derived ``page`` and media-segment ``seg``;
    page_marker spans are dropped (they are page-boundary metadata, not
    content — see core/docpipe.py spec).

    The two running counts (page-marker prefix count -> page, media prefix
    count -> seg) have two implementations, routed by ``banded``:

    * ``banded=False`` (default): one window per doc_id — a single shuffle,
      optimal for corpora of normally-sized documents (inter-doc
      parallelism; each doc is one window task).
    * ``banded=True``: a DISTRIBUTED PREFIX SCAN — local inclusive sums
      inside (doc_id, offset-band) windows plus per-band totals cumulated
      over the tiny band frame and joined back, so a 400k-span whale
      spreads over ~100 tasks instead of one.  Costs a second pass over
      the source (the totals aggregate re-executes the scan: column
      pruning makes the two branch subplans differ, defeating exchange
      reuse), so it is only routed to whale-sized documents — measured
      +30-43% on small-doc corpora, -6x single-whale latency.

    ``plans/extract.py`` hybrid mode picks the banded path exactly for the
    documents above its span threshold; both paths are span-equal."""
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
    is_marker = F.when(F.col("kind") == "page_marker", F.lit(1)).otherwise(F.lit(0))
    is_media = F.when(F.col("kind").isin(*MEDIA_KINDS), F.lit(1)).otherwise(F.lit(0))

    if not banded:
        w = Window.partitionBy("doc_id").orderBy("offset")
        df = (
            df.withColumn(
                "derived_page",
                F.greatest(
                    F.sum(is_marker).over(w.rowsBetween(Window.unboundedPreceding, 0)),
                    F.lit(1),
                ),
            )
            .withColumn(
                "seg",
                F.coalesce(
                    F.sum(is_media).over(w.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0),
                ).cast("int"),
            )
            .withColumn("page", F.coalesce(F.col("page_field"), F.col("derived_page")).cast("int"))
            .filter(F.col("kind") != "page_marker")
            .drop("page_field", "derived_page")
        )
        return df

    df = (
        df.withColumn("band", F.floor(F.col("offset") / SPAN_BAND).cast("int"))
        .withColumn("_m", is_marker)
        .withColumn("_d", is_media)
    )
    w_local = (
        Window.partitionBy("doc_id", "band")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    df = df.withColumn("_m_incl", F.sum("_m").over(w_local)).withColumn(
        "_d_incl", F.sum("_d").over(w_local)
    )
    # band totals = max local inclusive sum; exclusive cumulation over the
    # band frame (one row per SPAN_BAND spans — tiny relative to the data)
    w_bands = (
        Window.partitionBy("doc_id")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    totals = (
        df.groupBy("doc_id", "band")
        .agg(F.max("_m_incl").alias("_mt"), F.max("_d_incl").alias("_dt"))
        .select(
            "doc_id",
            "band",
            F.coalesce(F.sum("_mt").over(w_bands), F.lit(0)).alias("_m_before"),
            F.coalesce(F.sum("_dt").over(w_bands), F.lit(0)).alias("_d_before"),
        )
    )
    df = (
        df.join(totals, ["doc_id", "band"])
        .withColumn(
            "derived_page",
            F.greatest(F.col("_m_before") + F.col("_m_incl"), F.lit(1)),
        )
        .withColumn(
            "seg", (F.col("_d_before") + F.col("_d_incl") - F.col("_d")).cast("int")
        )
        .withColumn("page", F.coalesce(F.col("page_field"), F.col("derived_page")).cast("int"))
        .filter(F.col("kind") != "page_marker")
        .drop(
            "page_field", "derived_page", "band",
            "_m", "_d", "_m_incl", "_d_incl", "_m_before", "_d_before",
        )
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


# pages per grouped-map task: the line-merge fold never crosses a page
# boundary (formatting_extractor.py:247-249), so ANY page-granular grouping
# is semantics-preserving. 16 pages/group keeps a 1000-page report spread
# over ~63 parallel tasks while cutting the per-group Arrow/pandas overhead
# ~16x vs one-group-per-page (which made the staged path 25x slower than
# fused on small-doc corpora).
PAGES_PER_GROUP = 16


def _fold_lines(rows: list) -> list:
    """Reference reconstruction for a run of (page, offset, text, font_size,
    bold, is_boiler, seg) tuples, grouped page-by-page (plain-list hot path
    — pandas row access was ~3x slower than the kernel itself)."""
    from itertools import groupby
    from math import isnan

    blocks = []
    for _, page_rows in groupby(rows, key=lambda r: r[0]):
        page_rows = list(page_rows)
        sizes = [
            float(s)
            for (_, _, _, s, _, _, _) in page_rows
            if s is not None and not isnan(s)
        ]
        normal = page_font_mode(sizes) if sizes else DEFAULT_FONT_SIZE
        feats = []
        for page, offset, text, font_size, bold, is_boiler, seg in page_rows:
            text = (text or "").strip()
            if not text or is_boiler:
                continue
            fs = None if font_size is None or isnan(font_size) else float(font_size)
            rec = line_features(text, int(page), fs, bold, normal)
            rec["seg"] = int(seg)
            rec["offset"] = int(offset)
            feats.append(rec)
        blocks.extend(reconstruct_wrapped_lines(feats))
    return blocks


def _pandas_parallelism(df: DataFrame) -> int:
    """Partition count for grouped-map stages. AQE's byte-based coalescing
    is blind to per-group PYTHON cost — on a small corpus it collapsed the
    grouped-map exchange to 1 partition and serialized every pandas group
    (measured 33s for work 32 cores do in ~1s). An explicit repartition on
    the group keys is AQE-immune and Catalyst elides the duplicate exchange
    the groupBy would otherwise insert.

    Capped at 4x the cluster's core count: an untuned session carries the
    200-partition default, and 200 near-empty Arrow tasks on an 8-core
    driver-gate session paid ~5x pure task-launch overhead (27 s -> ~6 s
    for the chunk pipeline at sf0.01). Four waves per core keeps skew
    headroom without drowning small inputs in task launches."""
    spark = df.sparkSession
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return min(shuffle, 4 * spark.sparkContext.defaultParallelism)


def reconstruct_blocks(lines_df: DataFrame) -> DataFrame:
    """Stage 3: grouped-map fold per (doc_id, page-group) — the exact
    reference reconstruction semantics (formatting_extractor.py:192-329) via
    the core kernel, applied page-by-page inside each group."""
    text_lines = lines_df.filter(F.col("kind") == "text").withColumn(
        "pgrp", F.floor(F.col("page") / PAGES_PER_GROUP).cast("int")
    )
    text_lines = text_lines.repartition(
        _pandas_parallelism(lines_df), "doc_id", "pgrp"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(
            zip(
                pdf["page"].tolist(),
                pdf["offset"].tolist(),
                pdf["text"].tolist(),
                [None if pd.isna(v) else float(v) for v in pdf["font_size"]],
                [None if pd.isna(v) else bool(v) for v in pdf["bold"]],
                pdf["is_boiler"].tolist(),
                pdf["seg"].tolist(),
            ),
            key=lambda r: (r[0], r[1]),
        )
        blocks = _fold_lines(rows)
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

    return text_lines.groupBy("doc_id", "pgrp").applyInPandas(fold, BLOCKS_SCHEMA)


def chunk_blocks(blocks_df: DataFrame, cfg: ExtractConfig = ExtractConfig()) -> DataFrame:
    """Stage 4: grouped-map per doc_id, looping segments inside: header
    markup -> clean -> section-aware chunking (core kernels; reference
    rag_service.py:73-86 lifecycle). Doc granularity is safe here — the
    chunker is one linear pass over the segment's text (no per-page cost
    blowup), and grouping by doc instead of (doc, seg) avoids one tiny
    Arrow group per media span."""
    chunker = SectionChunker(
        max_chunk_size=cfg.max_chunk_size,
        chunk_overlap=cfg.chunk_overlap,
        use_section_awareness=cfg.use_section_awareness,
    )

    def do_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        from itertools import groupby

        doc_id = pdf["doc_id"].iloc[0]
        rows = sorted(
            zip(
                pdf["seg"].tolist(),
                pdf["offset"].tolist(),
                pdf["text"].tolist(),
                pdf["is_likely_header"].tolist(),
            )
        )
        out = {k: [] for k in (
            "seg", "chunk_seq", "text", "chunk_size", "section", "subsection",
            "subsubsection", "section_hierarchy", "chunk_part", "is_split_chunk",
        )}
        for seg, seg_rows in groupby(rows, key=lambda r: r[0]):
            blocks = [
                {"text": t, "is_likely_header": bool(h)}
                for (_, _, t, h) in seg_rows
            ]
            marked = blocks_to_marked_text(blocks)
            cleaned, _ = clean(marked, validate=False)
            for i, c in enumerate(chunker.chunk(cleaned)):
                m = c["metadata"]
                out["seg"].append(int(seg))
                out["chunk_seq"].append(i)
                out["text"].append(c["text"])
                out["chunk_size"].append(c["chunk_size"])
                out["section"].append(m.get("section"))
                out["subsection"].append(m.get("subsection"))
                out["subsubsection"].append(m.get("subsubsection"))
                out["section_hierarchy"].append(m.get("section_hierarchy"))
                out["chunk_part"].append(m.get("chunk_part"))
                out["is_split_chunk"].append(bool(m.get("is_split_chunk", False)))
        out["doc_id"] = [doc_id] * len(out["seg"])
        return pd.DataFrame(out)

    blocks_df = blocks_df.repartition(_pandas_parallelism(blocks_df), "doc_id")
    return blocks_df.groupBy("doc_id").applyInPandas(do_chunk, CHUNKS_SCHEMA)


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
    """Zero-shuffle path: the whole eager kernel per document via mapInPandas
    (one Arrow batch of docs at a time; narrow map over the scan). The span
    structs are projected to PARALLEL PRIMITIVE ARRAYS on the JVM side first
    (codegen'd ``transform(spans, x -> x.field)``) — Arrow's list<struct> →
    pandas dict-per-element conversion measured 2.1x slower than shipping 7
    primitive list columns and zipping dicts back in Python."""
    from ..core.docpipe import extract_document

    present = {f.name for f in spans_df.schema["spans"].dataType.elementType.fields}

    def col_of(field: str, typ: str):
        if field in present:
            return F.transform("spans", lambda x: x[field])
        return F.transform("spans", lambda x: F.lit(None).cast(typ))

    cols = spans_df.select(
        "doc_id",
        col_of("kind", "string").alias("_kinds"),
        col_of("text", "string").alias("_texts"),
        col_of("media_ref", "string").alias("_refs"),
        col_of("offset", "int").alias("_offsets"),
        col_of("page", "int").alias("_pages"),
        col_of("font_size", "double").alias("_sizes"),
        col_of("bold", "boolean").alias("_bolds"),
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        def opt(v):  # arrow nulls in numeric lists arrive as NaN
            return None if v is None or v != v else v

        for pdf in batches:
            out = {"doc_id": [], "order": [], "kind": [], "text": [], "media_ref": []}
            for doc_id, kinds, texts, refs, offsets, pages, sizes, bolds in zip(
                pdf["doc_id"], pdf["_kinds"], pdf["_texts"], pdf["_refs"],
                pdf["_offsets"], pdf["_pages"], pdf["_sizes"], pdf["_bolds"],
            ):
                span_dicts = [
                    {
                        "kind": k, "text": t, "media_ref": r, "offset": int(o),
                        "page": None if (pv := opt(p)) is None else int(pv),
                        "font_size": opt(fs),
                        "bold": None if b is None else bool(b),
                    }
                    for k, t, r, o, p, fs, b in zip(
                        kinds, texts, refs, offsets, pages, sizes, bolds
                    )
                ]
                for rec in extract_document(span_dicts, cfg):
                    out["doc_id"].append(doc_id)
                    out["order"].append(rec["order"])
                    out["kind"].append(rec["kind"])
                    out["text"].append(rec["text"])
                    out["media_ref"].append(rec["media_ref"])
            yield pd.DataFrame(out)

    return cols.mapInPandas(run, OUT_SCHEMA)
