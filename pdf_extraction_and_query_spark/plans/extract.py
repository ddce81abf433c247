"""End-to-end extraction pipeline assembly.

``extract_spans(spans_df, cfg, mode)``:

* ``mode='staged'`` (default): the five-stage vectorized pipeline from
  ``operators/extraction.py``. Shuffles on doc-granular keys only
  (doc_id / (doc_id,norm) / (doc_id,page) / (doc_id,seg)); page-level
  grouping bounds straggler size for 1000-page documents; AQE splits any
  residual skewed partitions.
* ``mode='fused'``: one narrow ``mapInPandas`` pass running the eager kernel
  per document — zero shuffles, best raw throughput when the corpus is
  mostly small documents; no intra-document parallelism.

Both must produce identical span sequences (enforced by
tests/test_pipeline_equality.py against the eager oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.docpipe import ExtractConfig
from ..operators.extraction import (
    chunk_blocks,
    explode_spans,
    flag_boilerplate,
    fused_extract,
    interleave,
    reconstruct_blocks,
)


# docs at or below this span count take the fused (zero-shuffle) path in
# hybrid mode; bigger docs go through the page-parallel staged path.
# Measured: down to ~500 docs/corpus, inter-document parallelism over fine
# input splits beats the staged path even for 400-page reports (fused
# 14.9s vs staged 24.7s on the big-doc subset at 8 cores) — so the staged
# route is reserved for true whales (~2000+ pages), where a single task
# would hold a multi-MB doc string (memory) and pin an executor thread for
# minutes (latency). 20k spans ~= 2MB of text per Arrow row.
HYBRID_SPAN_THRESHOLD = 20000


def extract_spans(
    spans_df: DataFrame,
    cfg: ExtractConfig = ExtractConfig(),
    mode: str = "staged",
    hybrid_threshold: int = HYBRID_SPAN_THRESHOLD,
) -> DataFrame:
    """Ordered output spans (doc_id, order, kind, text, media_ref).

    Modes: ``staged`` (shuffled, page-parallel — survives 1000-page
    stragglers), ``fused`` (zero-shuffle mapInPandas — fastest on uniform
    small docs), ``hybrid`` (size-aware routing: the skew treatment the
    north rule asks for — the long tail of small docs streams through the
    narrow path while oversized docs get intra-document page parallelism;
    per-doc outputs are identical on every path, so the union is safe)."""
    if mode == "fused":
        return fused_extract(spans_df, cfg)
    if mode == "hybrid":
        n = F.size("spans")
        small = fused_extract(spans_df.where(n <= hybrid_threshold), cfg)
        big = extract_spans(spans_df.where(n > hybrid_threshold), cfg, mode="staged")
        return small.unionByName(big)
    if mode != "staged":
        raise ValueError(f"unknown mode: {mode}")
    lines = explode_spans(spans_df)
    lines = flag_boilerplate(lines, cfg.boilerplate_min_pages) if cfg.strip_boilerplate else lines.withColumn(
        "is_boiler", F.lit(False)
    )
    blocks = reconstruct_blocks(lines)
    chunks = chunk_blocks(blocks, cfg)
    return interleave(chunks, lines)


def extract_arrays(
    spans_df: DataFrame, cfg: ExtractConfig = ExtractConfig(), mode: str = "staged"
) -> DataFrame:
    """Per-document ordered array form (the FIXTURES.md §2 equality shape):
    (doc_id, out array<struct<kind,text,media_ref,order>>)."""
    rows = extract_spans(spans_df, cfg, mode)
    return rows.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("order", "kind", "text", "media_ref"))
        ).alias("out")
    )
