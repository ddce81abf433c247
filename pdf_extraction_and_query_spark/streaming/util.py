"""Shared streaming-sidecar helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException


def read_parquet_optional(spark: SparkSession, path: str) -> DataFrame | None:
    """Raw-parquet read of a streaming delta sidecar, or ``None`` when no
    micro-batch has landed yet.  Parquet-backend-only BY DESIGN — the
    fts/ivf/pq index modules read their own shutil-compacted layouts (see
    each module's docstring); the catalog-aware twin for tables written
    through the backend shim is ``sources.tables.read_optional``."""
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None
