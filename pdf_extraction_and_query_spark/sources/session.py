"""SparkSession factory with scale-oriented defaults.

Local mode here, but every knob is chosen for the 1000-executor case:
AQE (runtime re-plan + skew splitting + partition coalescing), Arrow for
the pandas-UDF channel, shuffle partitions sized to the parallelism level,
UTC timezone pinned for oracle comparison.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    master: str | None = None,
    app_name: str = "pdf_extraction_and_query_spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = default_parallelism()
    master = master or f"local[{cores}]"
    if shuffle_partitions is None:
        # one shuffle partition per core locally; on a real cluster this
        # would be ~2-3x total executor cores (AQE coalesces the excess)
        shuffle_partitions = cores

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 512 nested docs/batch: streams pandas-UDF input, bounds worker RSS
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # progress bars share the stdout the bench's one-line JSON contract
        # depends on (the driver json-parses the tail of captured output)
        .config("spark.ui.showConsoleProgress", "false")
        # 32m splits: measured sweet spot for the span corpus — 128m gave a
        # single task wave at 32 cores (stragglers pinned the wall), 8m paid
        # ~200ms/task fixed overhead; 32m = ~4 waves of ~1-3s tasks
        .config("spark.sql.files.maxPartitionBytes", "32m")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    from .packaging import attach_package

    attach_package(spark)
    return spark
