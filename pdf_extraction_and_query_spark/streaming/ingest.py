"""Streaming ingest surface: continuous arrival of span documents.

The reference has no streaming (SURVEY.md §2.9) — its scale path is a
sequential re-process script (scripts/reprocess_all_documents.py). Here the
same batch-composable operators run under Structured Streaming: a file
source watches the corpus directory, every micro-batch flows through the
IDENTICAL ``extract_spans`` transform chain via ``foreachBatch``, and the
sink is EXACTLY-ONCE per batch: output is partitioned by ``batch_id`` and
written with dynamic partition-overwrite, so when Spark replays a
micro-batch after a crash between the data write and the streaming
checkpoint commit, the replay REPLACES the partial partition instead of
appending a duplicate (see test_streaming replay test).

``trigger(availableNow=True)`` drains the backlog and stops — the pattern
for incremental re-processing jobs; leave the trigger default for a
continuously-running ingest daemon. Event-time watermarks are not needed:
extraction is per-document (no cross-document windows).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..core.docpipe import ExtractConfig
from ..plans.extract import extract_spans
from ..sources import tables
from ..sources.corpus import SPANS_SCHEMA


def make_batch_processor(
    out_dir: str, cfg: ExtractConfig = ExtractConfig(), mode: str = "hybrid"
) -> Callable[[DataFrame, int], None]:
    """The ``foreachBatch`` body, exposed module-level so the replay
    idempotence contract is directly testable: calling it twice with the
    same (batch_df, batch_id) must leave exactly one copy of the batch."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = extract_spans(batch_df, cfg, mode=mode).withColumn(
            "batch_id", F.lit(int(batch_id)).cast("long")
        )
        # clear first: dynamic overwrite only replaces partitions PRESENT in
        # the frame, so a replay whose extract output is legitimately empty
        # (all-empty span arrays) would otherwise leave a stale half-written
        # batch_id partition from the crashed attempt (same hole
        # plans/checkpoint.py clears before its wave writes)
        tables.clear_partitions(batch_df.sparkSession, out_dir, "batch_id", [int(batch_id)])
        tables.overwrite_partitions(out, out_dir, ["batch_id"])

    return process_batch


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: ExtractConfig = ExtractConfig(),
    mode: str = "hybrid",
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
) -> StreamingQuery:
    """Watch ``input_dir`` for span-document parquet files; extract each
    micro-batch with the batch pipeline; write to ``out_dir`` partitioned by
    batch id (idempotent under micro-batch replay)."""
    reader = spark.readStream.schema(SPANS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    writer = stream.writeStream.foreachBatch(
        make_batch_processor(out_dir, cfg, mode)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_extract_html(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: ExtractConfig = ExtractConfig(),
    mode: str = "fused",
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
) -> StreamingQuery:
    """Continuous HTML arrival: watch ``input_dir`` for (doc_id, html)
    parquet; each micro-batch runs the DOM-heuristic main-content parse
    (``operators/htmlextract.html_extract_span_corpus`` — one Arrow pass;
    default mode fused so hybrid's whale probe never re-executes the
    batch's parse just to plan) and then the IDENTICAL span pipeline +
    exactly-once
    batch_id-overwrite sink as :func:`stream_extract` (the composition is
    ``make_batch_processor`` with the adapter prepended, so the replay
    idempotence contract carries over unchanged)."""
    from ..operators.htmlextract import html_extract_span_corpus
    from ..sources.htmlcorpus import HTML_SCHEMA

    reader = spark.readStream.schema(HTML_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    process_spans = make_batch_processor(out_dir, cfg, mode)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        process_spans(html_extract_span_corpus(batch_df), batch_id)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
