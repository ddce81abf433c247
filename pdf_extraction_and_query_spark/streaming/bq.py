"""Incremental binary-quantization sketch maintenance under Structured
Streaming — the 1-bit sibling of ``streaming/sq.py``'s LSM shape.

The quantizer (the SRP hyperplanes) is a CONTRACT CONSTANT
(``contract.srp_hyperplanes``), so unlike SQ's bounds or PQ's codebook
there is nothing to freeze at init — a streamed vector's sketch is a
pure function of the vector forever, and merged == one-shot holds with
no seam semantics at all.

Layout under one index root:
  sketches/  (vec_id, srp)  — the compacted 8 B/vector base
  delta/     batch_id=N     — per-micro-batch sketch appends; clear +
             batch_id partition-overwrite = exactly-once on replay.

``bq_topk_merged`` Hamming-ranks base ∪ deltas (sketch-only scan, JVM
popcount) and re-ranks the shortlist against the PRIMARY vector table
the caller passes — the index never stores raw vectors, exactly the
streaming/pq.py split.  ``bq_stream_compact`` folds deltas.

PARQUET-BACKEND-ONLY: like the sibling maintainers, this module manages
its LSM layout directly on the filesystem by design (see
streaming/pq.py's module docstring for the Iceberg-native equivalent).
"""

from __future__ import annotations

import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import contract as C
from ..operators.bq import bq_sketches
from ..operators.dedup import srp_words
from ..operators.search import _dot_vec, _rank_topk, fixed_point_vec
from ..sources import tables
from ..sources.tables import read_optional as _read_delta


def bq_stream_init(embeddings: DataFrame, root: str) -> None:
    """Sketch the initial corpus (no quantizer state to persist — the
    hyperplanes are contract constants)."""
    bq_sketches(embeddings).write.mode("overwrite").parquet(
        f"{root}/sketches"
    )


def make_bq_batch_processor(root: str) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body: sketch the batch's vectors and write them
    as a batch_id delta partition."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bid = int(batch_id)
        out = bq_sketches(batch_df).withColumn(
            "batch_id", F.lit(bid).cast("long")
        )
        tables.clear_partitions(spark, f"{root}/delta", "batch_id", [bid])
        tables.overwrite_partitions(out, f"{root}/delta", ["batch_id"])

    return process_batch


def bq_topk_merged(
    spark: SparkSession,
    vectors: DataFrame,
    root: str,
    k: int = C.TOPK,
    query_vec_id: int = 0,
    rerank: int = C.BQ_RERANK,
) -> DataFrame:
    """Hamming-ranked top-k over base ∪ delta sketches with the exact
    re-rank against ``vectors`` — the primary (vec_id, embedding) table,
    which must cover every indexed vector.  Row-identical to the batch
    :func:`~..operators.bq.bq_topk` over the same corpus."""
    sk = spark.read.parquet(f"{root}/sketches").select("vec_id", "srp")
    delta = _read_delta(spark, f"{root}/delta")
    if delta is not None:
        sk = sk.unionByName(delta.select("vec_id", "srp"))
    qword = int(
        srp_words(vectors.where(F.col("vec_id") == query_vec_id))
        .collect()[0]["srp"]
    )
    shortlist = (
        sk.select(
            "vec_id",
            F.bit_count(F.col("srp").bitwiseXOR(F.lit(qword)))
            .cast("long")
            .alias("hamming"),
        )
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(rerank)
    )
    q = vectors.where(F.col("vec_id") == query_vec_id).select(
        fixed_point_vec(F.col("embedding")).alias("qv")
    )
    cand = vectors.join(F.broadcast(shortlist), "vec_id").select(
        "vec_id", "hamming", fixed_point_vec(F.col("embedding")).alias("ev")
    )
    hits = cand.crossJoin(F.broadcast(q)).select(
        "vec_id",
        "hamming",
        _dot_vec(F.col("ev"), F.col("qv")).alias("dot_e12"),
    )
    return _rank_topk(hits, k).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        "hamming",
        "dot_e12",
        "rank",
    )


def bq_stream_compact(spark: SparkSession, root: str) -> None:
    """Fold delta sketches into the base table and clear them
    (parquet-backend non-atomicity caveat as in streaming/fts)."""
    delta = _read_delta(spark, f"{root}/delta")
    if delta is None:
        return
    base = spark.read.parquet(f"{root}/sketches")
    merged = base.select("vec_id", "srp").unionByName(
        delta.select("vec_id", "srp")
    )
    tmp = f"{root}/sketches__compact"
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(f"{root}/sketches")
    shutil.move(tmp, f"{root}/sketches")
    shutil.rmtree(f"{root}/delta", ignore_errors=True)
    spark.catalog.refreshByPath(root)
