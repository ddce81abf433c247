"""Streaming link-graph maintenance: the incremental twin of
``operators/htmlextract.link_in_degree``.

A crawl frontier ranks its queue by inbound citations — and the ranking
must track the crawl as it happens, not wait for a batch recount.  Per-href
in-degree counts are pure sums (fully associative), so the index maintains
like the crawl index (``streaming/crawlindex.py``): per-micro-batch count
summaries land in ``batch_id`` delta partitions, the merged reader
re-aggregates base ∪ unfolded deltas (row-identical to the one-shot batch
operator — equality tested), and compaction folds deltas.

Counts are NOT idempotent under re-merge, so this module reuses the crawl
index's folded-batch watermark verbatim: the base stores ``folded_max`` as
a column (atomic with the folded counts), compaction folds ONE pinned
snapshot of the unfolded deltas and clears exactly that snapshot's
partitions, and the same root+checkpoint durability contract applies
(batch ids are unique only within a checkpoint lineage; after checkpoint
loss rebuild via :func:`linkgraph_init`).

Scale shape: the per-batch link extraction is the same narrow Arrow pass
as the batch operator; the summary is one hash-agg on href (hot targets
combine map-side, so skewed hrefs like '/home' never concentrate raw
rows).  The merged read folds (href, count) summary rows only — never raw
links.  Parquet-backend caveat as the rest of the family: mid-write base
rewrites are not atomic for concurrent readers; Iceberg is the production
path.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.htmlextract import link_in_degree
from ..sources import tables

PAGES_SCHEMA = "doc_id string, html string"

_SUMMARY_COLS = ["href", "n_inlinks", "n_inlinks_main"]


def _merge_counts(summaries: DataFrame) -> DataFrame:
    """Associative merge of in-degree summary rows: counts add."""
    return summaries.groupBy("href").agg(
        F.sum("n_inlinks").cast("long").alias("n_inlinks"),
        F.sum("n_inlinks_main").cast("long").alias("n_inlinks_main"),
    )


def linkgraph_init(pages: DataFrame, root: str) -> None:
    """One-shot base build over an initial corpus of (doc_id, html)
    pages; no batches folded yet."""
    tables.replace_table(
        link_in_degree(pages).withColumn(
            "folded_max", F.lit(-1).cast("long")
        ),
        f"{root}/index",
    )


def make_linkgraph_batch_processor(
    root: str,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body: per-href counts of the micro-batch's links
    into a ``batch_id`` delta partition (clear-then-overwrite; the
    folded_max watermark makes replays of already-compacted batches
    harmless — together: exactly-once)."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bid = int(batch_id)
        summary = link_in_degree(batch_df)
        tables.clear_partitions(spark, f"{root}/delta", "batch_id", [bid])
        tables.overwrite_partitions(
            summary.withColumn("batch_id", F.lit(bid).cast("long")),
            f"{root}/delta",
            ["batch_id"],
        )

    return process_batch


def _base(spark: SparkSession, root: str) -> DataFrame:
    return tables.read_table(spark, f"{root}/index")


def linkgraph_merged(spark: SparkSession, root: str) -> DataFrame:
    """The current in-degree table: base ∪ unfolded deltas re-summed —
    row-identical to ``link_in_degree`` over every page ever ingested
    (equality tested).  Lazy single plan: the folded_max watermark joins
    in as a broadcast 1-row aggregate."""
    base = _base(spark, root)
    out = base.select(*_SUMMARY_COLS)
    delta = tables.read_optional(spark, f"{root}/delta")
    if delta is not None:
        fm = base.agg(
            F.coalesce(F.max("folded_max"), F.lit(-1)).alias("fm")
        )
        out = out.unionByName(
            delta.crossJoin(F.broadcast(fm))
            .where(F.col("batch_id") > F.col("fm"))
            .select(*_SUMMARY_COLS)
        )
    return _merge_counts(out)


def linkgraph_compact(spark: SparkSession, root: str) -> None:
    """Fold unfolded deltas into the base (advancing folded_max in the
    SAME write) and clear exactly the folded snapshot's partitions — the
    same race/crash discipline as ``crawl_compact`` (one pinned snapshot
    feeds the fold, the watermark, and the clear list)."""
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
        if stale_bids:
            tables.clear_partitions(
                spark, f"{root}/delta", "batch_id", stale_bids
            )
            spark.catalog.refreshByPath(root)
        return
    merged = _merge_counts(
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


def stream_linkgraph_maintenance(
    spark: SparkSession,
    input_dir: str,
    root: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Watch ``input_dir`` for new page parquet files (doc_id, html) and
    keep the in-degree table current (delta appends; run
    ``linkgraph_compact`` on a maintenance cadence)."""
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    writer = stream.writeStream.foreachBatch(
        make_linkgraph_batch_processor(root)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
