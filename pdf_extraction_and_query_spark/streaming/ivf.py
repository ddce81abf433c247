"""Incremental IVF vector-index maintenance under Structured Streaming —
the vector twin of ``streaming/fts.py``'s LSM shape.

Layout under one index root:
  base/      (vec_id, ev) partitioned by cent_id   — the compacted index
  _centroids (cent_id, cv)                          — FROZEN at init; new
             vectors assign to these (the standard IVF insert rule —
             re-training centroids is a rebuild, not maintenance)
  delta/     batch_id=N/cent_id=M                   — per-micro-batch
             appends; clear + batch_id partition-overwrite = exactly-once
             under replay

``ivf_topk_merged`` probes base ∪ deltas with cent_id pruning on BOTH
sides; ``ivf_compact`` folds deltas into base partitions (partition-
aligned: cent_ids agree by construction).  Append-only on vec_id, same
contract as the FTS maintainer.
"""

from __future__ import annotations

import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import contract as C
from ..operators.search import (
    _centroids,
    _dot,
    _dot_vec,
    _rank_topk,
    assign_to_centroids,
    fixed_point_vec,
)
from ..sources import tables
from ..sources.tables import read_optional as _read_delta


def ivf_stream_init(
    embeddings: DataFrame, root: str, n_centroids: int = C.IVF_CENTROIDS
) -> None:
    """Build the base index + freeze the centroid set."""
    cents = _centroids(embeddings, n_centroids)
    cents.write.mode("overwrite").parquet(f"{root}/_centroids")
    cand = embeddings.select(
        "vec_id", fixed_point_vec(F.col("embedding")).alias("ev")
    )
    assigned = assign_to_centroids(cand, cents)
    tables.overwrite_partitions(assigned, f"{root}/base", ["cent_id"])


def make_ivf_batch_processor(root: str) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body: assign the batch's vectors to the frozen
    centroids and write them as a batch_id delta partition."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bid = int(batch_id)
        cents = spark.read.parquet(f"{root}/_centroids")
        cand = batch_df.select(
            "vec_id", fixed_point_vec(F.col("embedding")).alias("ev")
        )
        out = assign_to_centroids(cand, cents).withColumn(
            "batch_id", F.lit(bid).cast("long")
        )
        tables.clear_partitions(spark, f"{root}/delta", "batch_id", [bid])
        tables.overwrite_partitions(out, f"{root}/delta", ["batch_id", "cent_id"])

    return process_batch


def ivf_topk_merged(
    spark: SparkSession,
    root: str,
    k: int = C.TOPK,
    query_vec_id: int = 0,
    n_probe: int = C.IVF_PROBE,
) -> DataFrame:
    """Top-k over base ∪ deltas, cent_id-pruned on both sides.  The query
    vector is looked up in the index itself (base ∪ delta — a streamed-in
    vector can be the query)."""
    base = spark.read.parquet(f"{root}/base")
    delta = _read_delta(spark, f"{root}/delta")
    allv = base.select("vec_id", "ev", "cent_id")
    if delta is not None:
        allv = allv.unionByName(delta.select("vec_id", "ev", "cent_id"))
    q = allv.where(F.col("vec_id") == query_vec_id).select(
        F.col("ev").alias("qv")
    )
    cents = spark.read.parquet(f"{root}/_centroids")
    probes = (
        cents.crossJoin(F.broadcast(q))
        .select("cent_id", _dot(F.col("cv"), F.col("qv")).alias("qdot"))
        .orderBy(F.desc("qdot"), F.asc("cent_id"))
        .limit(n_probe)
        .select("cent_id")
    )
    pruned = allv.join(F.broadcast(probes), "cent_id")
    hits = pruned.crossJoin(F.broadcast(q)).select(
        "vec_id", _dot_vec(F.col("ev"), F.col("qv")).alias("dot_e12")
    )
    return _rank_topk(hits, k)


def ivf_compact(spark: SparkSession, root: str) -> None:
    """Fold deltas into the base partitions and clear them (parquet-backend
    non-atomicity caveat as in streaming/fts.fts_compact)."""
    delta = _read_delta(spark, f"{root}/delta")
    if delta is None:
        return
    base = spark.read.parquet(f"{root}/base")
    merged = base.select("vec_id", "ev", "cent_id").unionByName(
        delta.select("vec_id", "ev", "cent_id")
    )
    tmp = f"{root}/base__compact"
    merged.write.mode("overwrite").partitionBy("cent_id").parquet(tmp)
    shutil.rmtree(f"{root}/base")
    shutil.move(tmp, f"{root}/base")
    shutil.rmtree(f"{root}/delta", ignore_errors=True)
    spark.catalog.refreshByPath(root)
