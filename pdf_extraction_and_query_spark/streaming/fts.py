"""Incremental full-text index maintenance under Structured Streaming.

LSM shape over the ``fulltext.fts_build`` layout: every micro-batch of new
documents appends its postings / doc-lengths / stats as DELTA partitions
keyed by ``batch_id`` (clear + dynamic partition-overwrite = exactly-once
under micro-batch replay, the ``streaming/ingest`` idiom);
``bm25_topk_merged`` scores against base ∪ deltas with the shared exact
scoring tail; ``fts_compact`` folds the accumulated deltas into the
bucketed base and clears them.

Contract: the corpus is APPEND-ONLY on doc_id (the same assumption the
streaming ingest makes) — a doc_id re-appearing in a later batch would
sum-merge rather than replace.  Document updates belong to the batch
``delete_where`` + re-ingest path, not the streaming appender.

Scale: the base is the bucket-pruned search path; deltas stay small
between compactions, so a merged query reads (pruned base) + (pruned
recent deltas) — classic LSM read amplification bounded by compaction
cadence.  Delta postings are bucketed at write time with the SAME token
hash as the base, so compaction is a partition-aligned fold and the merged
reader prunes both sides.
"""

from __future__ import annotations

import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .. import contract as C
from ..operators.fulltext import (
    corpus_stats,
    doc_lengths,
    postings,
    query_term_buckets,
    score_candidates,
)
from ..sources import tables
from ..sources.tables import read_optional as _read_delta
from ..sources.formats import DOCUMENTS_SCHEMA


def _n_buckets(spark: SparkSession, index_path: str) -> int:
    return int(
        spark.read.parquet(f"{index_path}/_stats").collect()[0]["n_buckets"]
    )


def make_fts_batch_processor(index_path: str) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body: write the batch's postings/doclen/stats as
    batch_id-partitioned deltas.  Clear-then-overwrite makes a crashed
    attempt's partial partition vanish on replay (exactly-once)."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bid = int(batch_id)
        nb = _n_buckets(spark, index_path)
        post = postings(batch_df).withColumn(
            "bucket", F.pmod(F.xxhash64("token"), F.lit(nb))
        )
        bcol = F.lit(bid).cast("long").alias("batch_id")
        for sub, frame, parts in (
            ("delta_postings", post.select("*", bcol), ["batch_id", "bucket"]),
            ("delta_doclen", doc_lengths(post).select("*", bcol), ["batch_id"]),
            ("delta_stats", corpus_stats(batch_df).select("*", bcol), ["batch_id"]),
        ):
            tables.clear_partitions(spark, f"{index_path}/{sub}", "batch_id", [bid])
            tables.overwrite_partitions(frame, f"{index_path}/{sub}", parts)

    return process_batch


def _merged_stats(spark: SparkSession, index_path: str) -> DataFrame:
    """One row (n_docs, sum_dl, avgdl_e3, n_buckets) over base + deltas —
    avgdl is RE-derived from the summed totals, never averaged from the
    per-source averages."""
    base = spark.read.parquet(f"{index_path}/_stats").select(
        "n_docs", "sum_dl", "n_buckets"
    )
    delta = _read_delta(spark, f"{index_path}/delta_stats")
    if delta is not None:
        base = base.unionByName(
            delta.select("n_docs", "sum_dl").withColumn(
                "n_buckets", F.lit(None).cast("int")
            )
        )
    return base.agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("sum_dl").cast("long").alias("sum_dl"),
        F.max("n_buckets").alias("n_buckets"),
    ).withColumn("avgdl_e3", F.expr("(1000 * sum_dl) div n_docs"))


def bm25_topk_merged(
    spark: SparkSession,
    index_path: str,
    queries: dict[int, tuple[str, ...]] | None = None,
    k: int = C.FTS_TOPK,
) -> DataFrame:
    """BM25 over base ∪ deltas, bucket-pruned on BOTH sides; row-identical
    to rebuilding the index over the full corpus (append-only contract)."""
    queries = queries or C.FTS_QUERIES
    stats = _merged_stats(spark, index_path)
    nb = _n_buckets(spark, index_path)
    buckets = query_term_buckets(spark, queries, nb)
    post = (
        spark.read.parquet(f"{index_path}/postings")
        .where(F.col("bucket").isin(buckets))
        .select("doc_id", "token", "tf")
    )
    dl = spark.read.parquet(f"{index_path}/doclen").select("doc_id", "dl")
    dpost = _read_delta(spark, f"{index_path}/delta_postings")
    if dpost is not None:
        post = post.unionByName(
            dpost.where(F.col("bucket").isin(buckets)).select(
                "doc_id", "token", "tf"
            )
        )
        ddl = _read_delta(spark, f"{index_path}/delta_doclen")
        if ddl is not None:
            dl = dl.unionByName(ddl.select("doc_id", "dl"))
    return score_candidates(post, dl, stats, queries, k)


def tfidf_topk_merged(
    spark: SparkSession, index_path: str, k: int = C.TFIDF_TOPK
) -> DataFrame:
    """Per-doc keyword extraction over the LIVE index: base \u222a delta
    postings through the exact inline scoring tail
    (``fulltext.tfidf_from_postings``), n_docs from the merged stats row —
    the maintained index serves a second analytics consumer without any
    page re-tokenized.  Unlike the BM25 readers this is corpus-wide, so no
    bucket pruning applies (keyword extraction has no query terms to prune
    by); it reads every postings bucket but still only summary-sized rows."""
    from ..operators.fulltext import tfidf_from_postings

    stats = _merged_stats(spark, index_path)
    post = spark.read.parquet(f"{index_path}/postings").select(
        "doc_id", "token", "tf"
    )
    dpost = _read_delta(spark, f"{index_path}/delta_postings")
    if dpost is not None:
        post = post.unionByName(dpost.select("doc_id", "token", "tf"))
    return tfidf_from_postings(post, stats.select("n_docs"), k)


def fts_compact(spark: SparkSession, index_path: str) -> None:
    """Fold deltas into the bucketed base (partition-aligned: bucket ids
    already agree) and clear them.  Parquet-backend caveat: the base
    rewrite is not atomic for concurrent readers — same documented
    limitation as ``tables._staged_swap``; the Iceberg backend's
    rewrite_data_files is the production path."""
    dpost = _read_delta(spark, f"{index_path}/delta_postings")
    if dpost is None:
        return
    base = spark.read.parquet(f"{index_path}/postings")
    merged = (
        base.unionByName(dpost.select(*base.columns))
        .groupBy("doc_id", "token", "bucket")
        .agg(F.sum("tf").alias("tf"))
        .select("doc_id", "token", "tf", "bucket")
    )
    tmp = f"{index_path}/postings__compact"
    merged.write.mode("overwrite").partitionBy("bucket").parquet(tmp)

    stats = _merged_stats(spark, index_path).localCheckpoint(eager=True)
    ddl = _read_delta(spark, f"{index_path}/delta_doclen")
    dl = spark.read.parquet(f"{index_path}/doclen")
    if ddl is not None:
        dl = (
            dl.unionByName(ddl.select("doc_id", "dl"))
            .groupBy("doc_id")
            .agg(F.sum("dl").alias("dl"))
        )
    tmp_dl = f"{index_path}/doclen__compact"
    dl.write.mode("overwrite").parquet(tmp_dl)

    shutil.rmtree(f"{index_path}/postings")
    shutil.move(tmp, f"{index_path}/postings")
    shutil.rmtree(f"{index_path}/doclen")
    shutil.move(tmp_dl, f"{index_path}/doclen")
    stats.select("n_docs", "sum_dl", "avgdl_e3", "n_buckets").write.mode(
        "overwrite"
    ).parquet(f"{index_path}/_stats")
    for sub in ("delta_postings", "delta_doclen", "delta_stats"):
        shutil.rmtree(f"{index_path}/{sub}", ignore_errors=True)
    spark.catalog.refreshByPath(index_path)


def stream_fts_maintenance(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Watch ``input_dir`` for new document parquet files and keep the FTS
    index current (delta appends; run ``fts_compact`` on a maintenance
    cadence)."""
    stream = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(input_dir)
    writer = stream.writeStream.foreachBatch(
        make_fts_batch_processor(index_path)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
