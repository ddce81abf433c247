"""Streaming crawl-index maintenance: the incremental twin of
``operators/htmlextract.crawl_keep_latest``.

A live crawl re-fetches URLs continuously; the crawl index (one row per
canonical URL, freshest fetch wins) must stay current without re-parsing
the whole corpus.  Keep-latest summaries are ASSOCIATIVE — merging two
summaries is ``sum(n_crawls)`` + ``max((ts, doc_id))`` per canonical — so
the index maintains exactly like the FTS/IVF/PQ family: per-micro-batch
summaries land in ``batch_id`` delta partitions (clear-then-overwrite =
exactly-once under replay), the merged reader re-aggregates base ∪ deltas
(row-identical to a one-shot build over the full corpus — equality tested),
and compaction folds deltas into the base on a maintenance cadence.

Scale shape: the per-batch parse is one narrow Arrow pass carrying
(doc_id, canonical, fetched_at_ts) — canonical extraction and the fetch
timestamp travel in the SAME pass, no join back to the batch.  The batch
summary is one hash-agg on canonical (micro-batch sized).  The merged
read/compaction is one shuffle keyed on canonical whose input is already
one row per (source, canonical) — never raw pages.  Parquet-backend
caveat: like ``fts_compact``, the base rewrite is not atomic for
concurrent readers; an Iceberg catalog's rewrite is the production path.
"""

from __future__ import annotations

import shutil
from typing import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

from ..sources import tables

PAGES_TS_SCHEMA = "doc_id string, html string, fetched_at_ts long"
_SUMMARY_SCHEMA = "doc_id string, canonical string, fetched_at_ts long"


def _canon_with_ts(pages: DataFrame) -> DataFrame:
    """(doc_id, html, fetched_at_ts) -> (doc_id, canonical, fetched_at_ts)
    in one narrow Arrow pass — the head-metadata parse and the fetch time
    stay in the same row, so no join is needed afterwards."""
    from ..core.htmlmain import parse_page

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": [str(d) for d in pdf["doc_id"]],
                    "canonical": [
                        parse_page(h).canonical for h in pdf["html"]
                    ],
                    "fetched_at_ts": pdf["fetched_at_ts"].astype("int64"),
                }
            )

    return pages.mapInPandas(run, schema=_SUMMARY_SCHEMA)


def _merge_summaries(summaries: DataFrame) -> DataFrame:
    """Re-aggregate keep-latest summary rows (associative merge): counts
    add, the winner is the max (ts, doc_id-string) — the same total order
    as the batch operator, so merge order never changes the result."""
    win = F.max(
        F.struct(
            F.col("latest_fetched_at_ts").alias("ts"),
            F.col("latest_doc_id").alias("doc_id"),
        )
    ).alias("w")
    return (
        summaries.groupBy("canonical")
        .agg(F.sum("n_crawls").cast("long").alias("n_crawls"), win)
        .select(
            "canonical",
            "n_crawls",
            F.col("w.doc_id").alias("latest_doc_id"),
            F.col("w.ts").alias("latest_fetched_at_ts"),
            (F.col("n_crawls") - F.lit(1)).cast("long").alias("n_superseded"),
        )
    )


def _index_cols(df: DataFrame) -> DataFrame:
    return df.select(
        "canonical",
        "n_crawls",
        "latest_doc_id",
        "latest_fetched_at_ts",
        "n_superseded",
    )


def crawl_index_init(pages: DataFrame, root: str) -> None:
    """One-shot base build over an initial corpus of
    (doc_id, html, fetched_at_ts) pages."""
    from ..operators.htmlextract import crawl_keep_latest

    tables.replace_table(
        _index_cols(crawl_keep_latest(_canon_with_ts(pages))), f"{root}/index"
    )


def make_crawl_batch_processor(root: str) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body: summarize the micro-batch's fetches and land
    them as a ``batch_id`` delta partition.  Clear-then-overwrite makes a
    crashed attempt's partial partition vanish on replay (exactly-once)."""
    from ..operators.htmlextract import crawl_keep_latest

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bid = int(batch_id)
        summary = _index_cols(crawl_keep_latest(_canon_with_ts(batch_df)))
        tables.clear_partitions(spark, f"{root}/delta", "batch_id", [bid])
        tables.overwrite_partitions(
            summary.withColumn("batch_id", F.lit(bid).cast("long")),
            f"{root}/delta",
            ["batch_id"],
        )

    return process_batch


def _read_delta(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None  # no batches appended yet


def crawl_index_merged(spark: SparkSession, root: str) -> DataFrame:
    """The current crawl index: base ∪ deltas re-aggregated — row-identical
    to running ``crawl_keep_latest`` over every page ever ingested
    (append-only contract; equality tested in test_streaming_crawl)."""
    base = _index_cols(tables.read_table(spark, f"{root}/index"))
    delta = _read_delta(spark, f"{root}/delta")
    if delta is not None:
        base = base.unionByName(_index_cols(delta))
    return _merge_summaries(base)


def crawl_compact(spark: SparkSession, root: str) -> None:
    """Fold deltas into the base index and clear them; a no-op when no
    deltas exist.  The merged frame is materialized (localCheckpoint)
    before the base is overwritten — never read-and-overwrite in one
    plan."""
    if _read_delta(spark, f"{root}/delta") is None:
        return
    merged = crawl_index_merged(spark, root).localCheckpoint(eager=True)
    tables.replace_table(_index_cols(merged), f"{root}/index")
    shutil.rmtree(f"{root}/delta", ignore_errors=True)
    spark.catalog.refreshByPath(root)


def stream_crawl_maintenance(
    spark: SparkSession,
    input_dir: str,
    root: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Watch ``input_dir`` for new page parquet files (doc_id, html,
    fetched_at_ts) and keep the crawl index current (delta appends; run
    ``crawl_compact`` on a maintenance cadence)."""
    stream = spark.readStream.schema(PAGES_TS_SCHEMA).parquet(input_dir)
    writer = stream.writeStream.foreachBatch(
        make_crawl_batch_processor(root)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
