"""Streaming ingest surface: continuous arrival of span documents.

The reference has no streaming (SURVEY.md §2.9) — its scale path is a
sequential re-process script (scripts/reprocess_all_documents.py). Here the
same batch-composable operators run under Structured Streaming: a file
source watches the corpus directory, every micro-batch flows through the
IDENTICAL ``extract_spans`` transform chain via ``foreachBatch``, and the
sink append is exactly-once per batch via the streaming checkpoint +
idempotent parquet appends keyed by batch id.

``trigger(availableNow=True)`` drains the backlog and stops — the pattern
for incremental re-processing jobs; leave the trigger default for a
continuously-running ingest daemon. Event-time watermarks are not needed:
extraction is per-document (no cross-document windows).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..core.docpipe import ExtractConfig
from ..plans.extract import extract_spans
from ..sources.corpus import SPANS_SCHEMA


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
    micro-batch with the batch pipeline; append to ``out_dir``."""
    reader = spark.readStream.schema(SPANS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            extract_spans(batch_df, cfg, mode=mode)
            .write.mode("append")
            .parquet(out_dir)
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
