"""Streaming crawl-index maintenance: the incremental twin of
``operators/htmlextract.crawl_keep_latest``.

A live crawl re-fetches URLs continuously; the crawl index (one row per
canonical URL, freshest fetch wins) must stay current without re-parsing
the whole corpus.  Keep-latest summaries are ASSOCIATIVE — merging two
summaries is ``sum(n_crawls)`` + ``max((ts, doc_id))`` per canonical
(``htmlextract.merge_keep_latest``, the ONE definition the batch operator
also runs) — so the index maintains exactly like the FTS/IVF/PQ family:
per-micro-batch summaries land in ``batch_id`` delta partitions
(clear-then-overwrite = exactly-once under replay), the merged reader
re-aggregates base ∪ deltas (row-identical to a one-shot build over the
full corpus — equality tested), and compaction folds deltas into the base
on a maintenance cadence.

Unlike the max-style indexes, keep-latest COUNTS are not idempotent under
re-merge, so compaction carries a folded-batch watermark: the base index
stores ``folded_max`` (the highest batch_id folded into it) AS A COLUMN,
landing atomically with the folded counts in the same table write.  The
merged reader ignores delta partitions with ``batch_id <= folded_max`` —
a compaction that crashed after the base write but before clearing its
deltas, or a replayed micro-batch re-landing an already-folded delta,
can therefore never double-count (tested by restoring folded deltas).

Scale shape: the per-batch parse is one narrow Arrow pass carrying
(doc_id, canonical, fetched_at_ts) — canonical extraction and the fetch
timestamp travel in the SAME pass, no join back to the batch.  The batch
summary is one hash-agg on canonical (micro-batch sized).  The merged
read/compaction is one shuffle keyed on canonical whose input is already
one row per (source, canonical) — never raw pages.  Parquet-backend
caveat: a crash MID-write of the base rewrite is non-atomic for
concurrent readers — same documented limitation as ``fts_compact``; an
Iceberg catalog's transactional rewrite is the production path.
"""

from __future__ import annotations

import shutil
from typing import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.htmlextract import (
    TS_UNKNOWN,
    crawl_keep_latest,
    merge_keep_latest,
)
from ..sources import tables

PAGES_TS_SCHEMA = "doc_id string, html string, fetched_at_ts long"
_PARSED_SCHEMA = "doc_id string, canonical string, fetched_at_ts long"

_SUMMARY_COLS = [
    "canonical",
    "n_crawls",
    "latest_doc_id",
    "latest_fetched_at_ts",
    "n_superseded",
]


def _canon_with_ts(pages: DataFrame) -> DataFrame:
    """(doc_id, html, fetched_at_ts) -> (doc_id, canonical, fetched_at_ts)
    in one narrow Arrow pass — the head-metadata parse and the fetch time
    stay in the same row, so no join is needed afterwards.  A null fetch
    time becomes TS_UNKNOWN (crawl records without a timestamp must not
    kill the micro-batch, and must never beat a timed fetch)."""
    from ..core.htmlmain import parse_page

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": [str(d) for d in pdf["doc_id"]],
                    "canonical": [
                        parse_page(h).canonical for h in pdf["html"]
                    ],
                    "fetched_at_ts": pdf["fetched_at_ts"]
                    .fillna(TS_UNKNOWN)
                    .astype("int64"),
                }
            )

    return pages.mapInPandas(run, schema=_PARSED_SCHEMA)


def crawl_index_init(pages: DataFrame, root: str) -> None:
    """One-shot base build over an initial corpus of
    (doc_id, html, fetched_at_ts) pages; no batches folded yet."""
    tables.replace_table(
        crawl_keep_latest(_canon_with_ts(pages)).withColumn(
            "folded_max", F.lit(-1).cast("long")
        ),
        f"{root}/index",
    )


def make_crawl_batch_processor(root: str) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body: summarize the micro-batch's fetches and land
    them as a ``batch_id`` delta partition.  Clear-then-overwrite makes a
    crashed attempt's partial partition vanish on replay; the folded_max
    watermark makes a replay of an ALREADY-COMPACTED batch harmless —
    together: exactly-once."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bid = int(batch_id)
        summary = crawl_keep_latest(_canon_with_ts(batch_df))
        tables.clear_partitions(spark, f"{root}/delta", "batch_id", [bid])
        tables.overwrite_partitions(
            summary.withColumn("batch_id", F.lit(bid).cast("long")),
            f"{root}/delta",
            ["batch_id"],
        )

    return process_batch


def _base_and_folded(spark: SparkSession, root: str) -> tuple[DataFrame, int]:
    base = tables.read_table(spark, f"{root}/index")
    row = base.agg(F.max("folded_max").alias("fm")).collect()[0]
    return base.select(*_SUMMARY_COLS), (-1 if row["fm"] is None else int(row["fm"]))


def crawl_index_merged(spark: SparkSession, root: str) -> DataFrame:
    """The current crawl index: base ∪ unfolded deltas re-aggregated —
    row-identical to running ``crawl_keep_latest`` over every page ever
    ingested (append-only contract; equality tested in
    test_streaming_crawl).  Deltas at or below the folded_max watermark
    are already inside the base and are skipped."""
    base, folded = _base_and_folded(spark, root)
    delta = tables.read_optional(spark, f"{root}/delta")
    if delta is not None:
        base = base.unionByName(
            delta.where(F.col("batch_id") > folded).select(*_SUMMARY_COLS)
        )
    return merge_keep_latest(base)


def crawl_compact(spark: SparkSession, root: str) -> None:
    """Fold unfolded deltas into the base index (advancing folded_max in
    the SAME write) and clear them; a no-op when no deltas exist.  The
    merged frame is materialized (localCheckpoint) before the base is
    overwritten — never read-and-overwrite in one plan.  A crash between
    the base write and the delta clear leaves stale deltas that the
    watermark silently ignores — re-running compact (or the merged
    reader) never double-counts them."""
    delta = tables.read_optional(spark, f"{root}/delta")
    if delta is None:
        return
    _, folded = _base_and_folded(spark, root)
    top = delta.agg(F.max("batch_id").alias("m")).collect()[0]["m"]
    new_folded = folded if top is None else max(folded, int(top))
    merged = crawl_index_merged(spark, root).localCheckpoint(eager=True)
    tables.replace_table(
        merged.withColumn("folded_max", F.lit(new_folded).cast("long")),
        f"{root}/index",
    )
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
