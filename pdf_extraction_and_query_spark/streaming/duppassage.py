"""Incremental duplicated-passage evidence under Structured Streaming —
the dup-coverage curation signal maintained live.

Unlike the frozen-model maintainers (IVF centroids, PQ codebook, SQ
bounds, CCNet LM), duplicate evidence needs NO freeze: the per-shingle
document-frequency counts are ASSOCIATIVE (each document arrives in
exactly one micro-batch — the corpus-ingest contract every maintainer in
this package shares — so per-batch distinct-doc counts sum to the global
count), and a document's shingle occurrences are a pure function of its
text.  That makes the signal RETROACTIVE, which no frozen seam can be: a
batch that delivers the second copy of a passage flips the FIRST copy's
coverage too — the merged reader recomputes every affected document from
the stored occurrences (pinned in tests/test_streaming_duppassage.py).

Layout under one index root:
  occ/    (doc_id, nw, start_w, gram) — per-doc k-shingle occurrences,
          written once per document (append-only; static per doc).
          Stored as the gram STRING to keep bit-equality with the batch
          operator and the DuckDB oracle; at 10^12 docs the storage
          variant is a 64-bit gram hash (8 B vs k words — the standard
          ExactSubstr-pipeline tradeoff, collision odds ~n²/2⁶⁴), same
          layout otherwise.
  df/     (gram, dfc) — per-gram distinct-doc counts (shingle-vocabulary-
          sized summaries, NOT corpus-sized).
  occ_delta/, df_delta/  batch_id=N — per-micro-batch occurrences and
          count partials; clear + batch_id partition-overwrite =
          exactly-once on replay.

``dup_passage_stats_merged`` re-derives the evidence set (df base ∪ delta
partials re-summed, >= 2), joins it back onto occ base ∪ deltas, and runs
the SAME gaps-and-islands merge + rollup as the batch operator
(`repetition._merge_islands` / `_stats_from_passages`) — merged == the
one-shot ``dup_passage_stats`` over the union corpus, exactly.
``dup_compact`` folds both delta families.

PARQUET-BACKEND-ONLY like the sibling maintainers (see streaming/pq.py's
module docstring for the Iceberg-native equivalent).
"""

from __future__ import annotations

import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import contract as C
from ..operators.repetition import (
    _merge_islands,
    _shingle_occurrences,
    _stats_from_passages,
)
from ..sources import tables
from ..sources.tables import read_optional as _read_delta

_OCC_COLS = ["doc_id", "nw", "start_w", "gram"]


def dup_stream_init(docs: DataFrame, root: str, k: int = C.DUP_PASSAGE_K) -> None:
    """Index the initial corpus: per-doc occurrences + per-gram counts."""
    sh = _shingle_occurrences(docs, k).select(*_OCC_COLS)
    sh.write.mode("overwrite").parquet(f"{root}/occ")
    (
        sh.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("dfc"))
        .write.mode("overwrite")
        .parquet(f"{root}/df")
    )


def make_dup_batch_processor(
    root: str, k: int = C.DUP_PASSAGE_K
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body: shingle the batch's documents and write
    occurrence + count-partial delta partitions."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bid = int(batch_id)
        sh = _shingle_occurrences(batch_df, k).select(*_OCC_COLS)
        occ = sh.withColumn("batch_id", F.lit(bid).cast("long"))
        tables.clear_partitions(spark, f"{root}/occ_delta", "batch_id", [bid])
        tables.overwrite_partitions(occ, f"{root}/occ_delta", ["batch_id"])
        dfd = (
            sh.groupBy("gram")
            .agg(F.count_distinct("doc_id").alias("dfc"))
            .withColumn("batch_id", F.lit(bid).cast("long"))
        )
        tables.clear_partitions(spark, f"{root}/df_delta", "batch_id", [bid])
        tables.overwrite_partitions(dfd, f"{root}/df_delta", ["batch_id"])

    return process_batch


def _merged_occ(spark: SparkSession, root: str) -> DataFrame:
    occ = spark.read.parquet(f"{root}/occ").select(*_OCC_COLS)
    delta = _read_delta(spark, f"{root}/occ_delta")
    if delta is not None:
        occ = occ.unionByName(delta.select(*_OCC_COLS))
    return occ


def _merged_evidence(spark: SparkSession, root: str) -> DataFrame:
    """Grams with a GLOBAL distinct-doc count >= 2 across base ∪ deltas —
    per-batch partials re-summed (associative under the one-batch-per-doc
    ingest contract)."""
    df = spark.read.parquet(f"{root}/df").select("gram", "dfc")
    delta = _read_delta(spark, f"{root}/df_delta")
    if delta is not None:
        df = df.unionByName(delta.select("gram", "dfc"))
    return (
        df.groupBy("gram")
        .agg(F.sum("dfc").alias("dfc"))
        .where(F.col("dfc") >= 2)
        .select("gram")
    )


def dup_passages_merged(
    spark: SparkSession, root: str, k: int = C.DUP_PASSAGE_K
) -> DataFrame:
    """Maximal duplicated intervals over the LIVE index — the batch
    `_passages` pipeline run from stored occurrences instead of text."""
    occ = _merged_occ(spark, root).join(
        _merged_evidence(spark, root), "gram"
    ).select("doc_id", "nw", "start_w")
    return _merge_islands(occ, k)


def dup_passage_stats_merged(
    spark: SparkSession, root: str, k: int = C.DUP_PASSAGE_K
) -> DataFrame:
    """Per-doc dup coverage over the LIVE index == one-shot
    ``dup_passage_stats`` over the union corpus."""
    return _stats_from_passages(dup_passages_merged(spark, root, k))


def dup_compact(spark: SparkSession, root: str) -> None:
    """Fold both delta families into their base tables (parquet-backend
    non-atomicity caveat as in streaming/fts.fts_compact).  df partials
    re-aggregate on fold so the base stays one row per gram."""
    occ_delta = _read_delta(spark, f"{root}/occ_delta")
    df_delta = _read_delta(spark, f"{root}/df_delta")
    if occ_delta is None and df_delta is None:
        return
    for sub, delta, key in (
        ("occ", occ_delta, None),
        ("df", df_delta, "gram"),
    ):
        if delta is None:
            continue
        base = spark.read.parquet(f"{root}/{sub}")
        if key is None:
            merged = base.select(*_OCC_COLS).unionByName(delta.select(*_OCC_COLS))
        else:
            merged = (
                base.select("gram", "dfc")
                .unionByName(delta.select("gram", "dfc"))
                .groupBy("gram")
                .agg(F.sum("dfc").alias("dfc"))
            )
        tmp = f"{root}/{sub}__compact"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(f"{root}/{sub}")
        shutil.move(tmp, f"{root}/{sub}")
    shutil.rmtree(f"{root}/occ_delta", ignore_errors=True)
    shutil.rmtree(f"{root}/df_delta", ignore_errors=True)
    spark.catalog.refreshByPath(root)
