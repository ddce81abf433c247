"""Streaming crawl-index maintenance: the incremental twin of
``operators/htmlextract.crawl_keep_latest``.

A live crawl re-fetches URLs continuously; the crawl index (one row per
canonical URL, freshest fetch wins) must stay current without re-parsing
the whole corpus.  Keep-latest summaries are ASSOCIATIVE — merging two
summaries is ``sum(n_crawls)`` + ``max((ts, doc_id))`` per canonical
(``htmlextract.merge_keep_latest_full``, the same winner order the batch
operators run) — so the index maintains incrementally: per-micro-batch
summaries into ``batch_id`` delta partitions, merged reads over base ∪
unfolded deltas (row-identical to a one-shot build over the full corpus —
equality tested), compaction on a maintenance cadence.  The summaries are
FULL (the winner's policy payload rides the max struct), so the live index
answers the indexable-corpus gate too (``crawl_corpus_merged``) — no page
is ever re-parsed to re-derive policy.

Because keep-latest carries COUNTS (non-idempotent under re-merge), the
exactly-once/compaction discipline — the ``folded_max`` watermark column,
the snapshot-pinned partition-exact clear, the root+checkpoint durability
contract — lives in the shared engine ``streaming/deltaindex.py``; this
module contributes only the crawl-specific pieces: the head-metadata parse
and the keep-latest merge.

Scale shape: the per-batch parse is one narrow Arrow pass carrying
(doc_id, canonical, fetched_at_ts) — canonical extraction and the fetch
timestamp travel in the SAME pass, no join back to the batch.  The batch
summary is one hash-agg on canonical (micro-batch sized); merged reads and
compaction move summary rows only, never pages.  Parquet-backend caveat:
a crash MID-write of the base rewrite is non-atomic for concurrent
readers — same documented limitation as ``fts_compact``; an Iceberg
catalog's transactional rewrite is the production path.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.htmlextract import (
    TS_UNKNOWN,
    corpus_gate,
    keep_latest_full_summaries,
    merge_keep_latest_full,
)
from . import deltaindex

PAGES_TS_SCHEMA = "doc_id string, html string, fetched_at_ts long"
_PARSED_SCHEMA = (
    "doc_id string, canonical string, fetched_at_ts long, "
    "noindex boolean, n_chars_main long"
)

# the index persists FULL summaries (winner payload included) so the live
# index answers BOTH the keep-latest listing and the corpus gate
_SUMMARY_COLS = [
    "canonical",
    "n_crawls",
    "latest_doc_id",
    "latest_fetched_at_ts",
    "n_superseded",
    "latest_noindex",
    "latest_n_chars_main",
]

_PUBLIC_COLS = _SUMMARY_COLS[:5]  # crawl_keep_latest's output contract


def _parse_with_ts(pages: DataFrame) -> DataFrame:
    """(doc_id, html, fetched_at_ts) -> (doc_id, canonical, fetched_at_ts,
    noindex, n_chars_main) in one narrow Arrow pass — head metadata, the
    policy payload, and the fetch time stay in the same row, so no join is
    needed afterwards.  A null fetch time becomes TS_UNKNOWN (crawl
    records without a timestamp must not kill the micro-batch, and must
    never beat a timed fetch)."""
    from ..core.htmlmain import parse_page

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "canonical": [],
                "noindex": [],
                "n_chars_main": [],
            }
            for d, h in zip(pdf["doc_id"], pdf["html"]):
                p = parse_page(h)
                out["doc_id"].append(str(d))
                out["canonical"].append(p.canonical)
                out["noindex"].append(p.noindex)
                out["n_chars_main"].append(
                    sum(len(s[1]) for s in p.spans if s[0] == "text")
                )
            out["fetched_at_ts"] = (
                pdf["fetched_at_ts"].fillna(TS_UNKNOWN).astype("int64")
            )
            yield pd.DataFrame(out)

    return pages.mapInPandas(run, schema=_PARSED_SCHEMA)


# the one-shot twin the merged readers are tested against
def _one_shot_summary(pages: DataFrame) -> DataFrame:
    return merge_keep_latest_full(
        keep_latest_full_summaries(_parse_with_ts(pages))
    )


def crawl_index_init(pages: DataFrame, root: str) -> None:
    """One-shot base build over an initial corpus of
    (doc_id, html, fetched_at_ts) pages; no batches folded yet."""
    deltaindex.init_index(_one_shot_summary(pages), root)


def make_crawl_batch_processor(root: str) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body: summarize the micro-batch's fetches and land
    them as a ``batch_id`` delta partition (exactly-once under the shared
    watermark discipline — see ``deltaindex.write_delta``)."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        deltaindex.write_delta(_one_shot_summary(batch_df), root, batch_id)

    return process_batch


def _merged_full(spark: SparkSession, root: str) -> DataFrame:
    return deltaindex.read_merged(
        spark, root, _SUMMARY_COLS, merge_keep_latest_full
    )


def crawl_index_merged(spark: SparkSession, root: str) -> DataFrame:
    """The current crawl index — row-identical to ``crawl_keep_latest``
    over every page ever ingested (equality tested)."""
    return _merged_full(spark, root).select(*_PUBLIC_COLS)


def crawl_corpus_merged(spark: SparkSession, root: str) -> DataFrame:
    """The LIVE indexable corpus: the corpus gate (robots-noindex +
    non-empty main content, on the resolved winner) answered straight
    from the maintained index — no page is re-parsed.  Row-identical to
    the batch ``crawl_corpus`` over every page ever ingested (equality
    tested); same ``corpus_gate`` definition as the batch path."""
    return corpus_gate(_merged_full(spark, root))


def crawl_compact(spark: SparkSession, root: str) -> None:
    """Fold unfolded deltas into the base index; a no-op when no deltas
    exist (race/crash discipline in ``deltaindex.compact``)."""
    deltaindex.compact(spark, root, _SUMMARY_COLS, merge_keep_latest_full)


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
