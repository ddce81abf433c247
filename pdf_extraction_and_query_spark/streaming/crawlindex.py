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
Compaction folds exactly ONE materialized snapshot of the unfolded
deltas and clears exactly the batch ids present in that snapshot — a
micro-batch landing mid-compact is neither silently folded without being
watermarked nor deleted without being folded (within one checkpoint
lineage, batch ids are monotone, so a mid-compact batch is always above
the new watermark).

Durability contract (the whole foreachBatch index family shares it):
``root`` and the streaming checkpoint directory form ONE durable unit.
Batch ids are only unique within a checkpoint lineage — re-creating the
checkpoint against an existing index restarts them at 0, which the
watermark would read as "already folded" (new fetches silently dropped).
After checkpoint loss, rebuild with :func:`crawl_index_init` (or attach
a FRESH root) — the same recovery rule the fts/ivf/pq maintainers have,
made explicit here because the watermark turns the id collision into a
silent drop instead of a double-count.

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


def _base(spark: SparkSession, root: str) -> DataFrame:
    base = tables.read_table(spark, f"{root}/index")
    if "folded_max" not in base.columns:
        # index written before the watermark existed: nothing folded yet
        base = base.withColumn("folded_max", F.lit(-1).cast("long"))
    return base


def crawl_index_merged(spark: SparkSession, root: str) -> DataFrame:
    """The current crawl index: base ∪ unfolded deltas re-aggregated —
    row-identical to running ``crawl_keep_latest`` over every page ever
    ingested (append-only contract; equality tested in
    test_streaming_crawl).  Deltas at or below the folded_max watermark
    are already inside the base and are skipped — via a broadcast of the
    1-row watermark aggregate, so the reader stays a single LAZY plan
    (no driver-side collect per read; the second base scan is
    column-pruned to folded_max)."""
    base = _base(spark, root)
    out = base.select(*_SUMMARY_COLS)
    delta = tables.read_optional(spark, f"{root}/delta")
    if delta is not None:
        fm = base.agg(
            F.coalesce(F.max("folded_max"), F.lit(-1)).alias("fm")
        )
        unfolded = (
            delta.crossJoin(F.broadcast(fm))
            .where(F.col("batch_id") > F.col("fm"))
            .select(*_SUMMARY_COLS)
        )
        out = out.unionByName(unfolded)
    return merge_keep_latest(out)


def crawl_compact(spark: SparkSession, root: str) -> None:
    """Fold unfolded deltas into the base index (advancing folded_max in
    the SAME write) and clear exactly what was folded; a no-op when no
    deltas exist.

    Race/crash safety: the unfolded deltas are pinned with ONE eager
    materialization; the watermark and the clear list both derive from
    that SAME snapshot.  A micro-batch landing mid-compact gets a batch
    id above every id in the snapshot (ids are monotone within the
    checkpoint lineage), so it stays above the new watermark and its
    partition is not in the clear list — never silently folded, never
    deleted unfolded.  A crash between the base write and the clear
    leaves folded deltas on disk that the watermark ignores forever.
    The merged frame is materialized before the base is overwritten —
    never read-and-overwrite in one plan."""
    delta = tables.read_optional(spark, f"{root}/delta")
    if delta is None:
        return
    base = _base(spark, root)
    row = base.agg(F.max("folded_max").alias("fm")).collect()[0]
    folded = -1 if row["fm"] is None else int(row["fm"])

    unfolded = delta.where(F.col("batch_id") > folded).localCheckpoint(
        eager=True
    )
    fold_bids = [
        int(r["batch_id"])
        for r in unfolded.select("batch_id").distinct().collect()
    ]
    stale_bids = [
        int(r["batch_id"])
        for r in delta.select("batch_id").distinct().collect()
        if int(r["batch_id"]) <= folded
    ]
    if not fold_bids:
        # nothing new — just drop already-folded leftovers from a prior
        # crashed clear
        if stale_bids:
            tables.clear_partitions(
                spark, f"{root}/delta", "batch_id", stale_bids
            )
            spark.catalog.refreshByPath(root)
        return
    merged = merge_keep_latest(
        base.select(*_SUMMARY_COLS).unionByName(
            unfolded.select(*_SUMMARY_COLS)
        )
    ).localCheckpoint(eager=True)
    tables.replace_table(
        merged.withColumn(
            "folded_max", F.lit(max(fold_bids)).cast("long")
        ),
        f"{root}/index",
    )
    tables.clear_partitions(
        spark, f"{root}/delta", "batch_id", fold_bids + stale_bids
    )
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
