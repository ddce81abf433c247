"""Watermarked summary-delta index: the shared engine under the
count-carrying incremental indexes (``crawlindex``, ``linkgraph``).

An index whose merge is a pure MAX (ivf/pq rankings) tolerates re-merging
the same delta; an index that carries COUNTS does not — re-merging a
replayed or half-cleared delta inflates them permanently.  This module
owns the discipline that makes count-carrying deltas exactly-once:

* the base table stores ``folded_max`` (the highest batch_id folded into
  it) AS A COLUMN, landing atomically with the folded summaries in the
  same table write;
* the merged reader re-aggregates base ∪ deltas ABOVE the watermark,
  joined in as a broadcast 1-row aggregate (single lazy plan, no driver
  collect per read);
* compaction folds ONE eagerly-pinned snapshot of the unfolded deltas —
  the new watermark AND the partition-exact clear list both derive from
  that same snapshot, so a micro-batch landing mid-compact (always above
  the new watermark: batch ids are monotone within a checkpoint lineage)
  is neither silently folded nor deleted unfolded, and a crash between
  the base write and the clear leaves partitions the watermark ignores
  forever.

Durability contract (family-wide): ``root`` and the streaming checkpoint
directory form ONE durable unit — batch ids are only unique within a
checkpoint lineage, so after checkpoint loss rebuild the index (the
watermark turns an id collision into a silent drop, not a double-count).

Who rides this engine: every maintainer whose merged result would change
under a batch replayed AFTER a compact already folded it (the crash
window between ``foreachBatch`` returning and the checkpoint commit, with
a maintenance compact interleaved) — the count-carrying indexes
(``crawlindex``, ``linkgraph``, ``anchorindex``, ``changestats``,
``duppassage``) and the row-emitting score index (``quality``).  The
simple LSM maintainers (``ivf``/``pq``/``sq``/``fts``/``minhash``) do NOT
carry the watermark; their compactors must run at a COMMITTED stream
boundary (graceful stop, or idle with the last batch committed) — an
interleaved compact + replay would duplicate index rows there (minhash's
PAIR output is immune regardless: the band join ends in ``distinct()``,
and duplicate signatures produce the same pairs).

The caller provides the two index-specific pieces: the summary column
list and the associative ``merge_fn`` (DataFrame of summary rows → one
summary row per key).  Everything here moves summary rows only — never
the raw stream.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tables

MergeFn = Callable[[DataFrame], DataFrame]


def init_index(summary: DataFrame, root: str) -> None:
    """Write the base from a one-shot summary; nothing folded yet."""
    tables.replace_table(
        summary.withColumn("folded_max", F.lit(-1).cast("long")),
        f"{root}/index",
    )


def write_delta(summary: DataFrame, root: str, batch_id: int) -> None:
    """Land one micro-batch's summary as a ``batch_id`` delta partition
    (clear-then-overwrite: a crashed attempt's partial partition vanishes
    on replay; the watermark makes replays of already-FOLDED batches
    harmless — together: exactly-once)."""
    spark = summary.sparkSession
    bid = int(batch_id)
    tables.clear_partitions(spark, f"{root}/delta", "batch_id", [bid])
    tables.overwrite_partitions(
        summary.withColumn("batch_id", F.lit(bid).cast("long")),
        f"{root}/delta",
        ["batch_id"],
    )


def _base(spark: SparkSession, root: str) -> DataFrame:
    base = tables.read_table(spark, f"{root}/index")
    if "folded_max" not in base.columns:
        # index written before the watermark existed: nothing folded yet
        base = base.withColumn("folded_max", F.lit(-1).cast("long"))
    return base


def read_merged(
    spark: SparkSession,
    root: str,
    summary_cols: Sequence[str],
    merge_fn: MergeFn,
) -> DataFrame:
    """Base ∪ unfolded deltas through ``merge_fn`` — row-identical to the
    one-shot summary over everything ingested (append-only contract)."""
    base = _base(spark, root)
    out = base.select(*summary_cols)
    delta = tables.read_optional(spark, f"{root}/delta")
    if delta is not None:
        fm = base.agg(F.coalesce(F.max("folded_max"), F.lit(-1)).alias("fm"))
        out = out.unionByName(
            delta.crossJoin(F.broadcast(fm))
            .where(F.col("batch_id") > F.col("fm"))
            .select(*summary_cols)
        )
    return merge_fn(out)


def compact(
    spark: SparkSession,
    root: str,
    summary_cols: Sequence[str],
    merge_fn: MergeFn,
) -> None:
    """Fold unfolded deltas into the base, advancing ``folded_max`` in the
    SAME write, then clear exactly the folded snapshot's partitions (plus
    stale already-folded leftovers from a crashed prior clear)."""
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
    merged = merge_fn(
        base.select(*summary_cols).unionByName(
            unfolded.select(*summary_cols)
        )
    ).localCheckpoint(eager=True)
    tables.replace_table(
        merged.withColumn("folded_max", F.lit(max(fold_bids)).cast("long")),
        f"{root}/index",
    )
    tables.clear_partitions(
        spark, f"{root}/delta", "batch_id", fold_bids + stale_bids
    )
    spark.catalog.refreshByPath(root)
