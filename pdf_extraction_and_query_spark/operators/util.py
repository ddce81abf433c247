"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(docs: DataFrame, target: int | None = None) -> DataFrame:
    """Guarantee at least cluster-parallelism input partitions before a
    compute-amplifying narrow stage (n-gram/shingle/posting explodes
    multiply work ~5-10x over input BYTES).

    Spark sizes scan tasks by bytes (``maxPartitionBytes``), so a
    compressed documents table that is physically few files/row-groups
    runs the whole explode + map-side partial aggregation — the expensive
    part of every token-family operator — in that many tasks no matter how
    many cores exist.  Measured on this repo's gate corpus (a SINGLE
    0.6 MB parquet file): repetition_metrics scaled 1.1x from local[2] to
    local[8] before this guard and ~3x after; see PLANS.md #13.

    The repartition is CONDITIONAL: when the scan already yields >= target
    partitions (any real at-scale table), this is a no-op and costs
    nothing.  When it fires, the shuffle moves raw text once — cheaper per
    byte than letting the single task later shuffle the ~6x-amplified gram
    stream from one core.  The explicit partition count keeps AQE from
    coalescing it back down by size."""
    sc = docs.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if docs.rdd.getNumPartitions() >= target:
        return docs
    return docs.repartition(target)
