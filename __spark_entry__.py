"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship staged extraction pipeline (interleaved
text+media span corpus derived from sf0.001 documents). ``queries`` /
``oracle_sql`` expose every implemented operator with its DuckDB twin (see
pdf_extraction_and_query_spark/plans/registry.py; span-pipeline fold
operators are rows-only by design — their parity gate is the pytest
span-equality suite against the eager Python oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_extraction_and_query_spark.plans.registry import ORACLE_SQL, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: staged span-extraction pipeline over the interleaved
    corpus derived from sf0.001 documents.parquet."""
    from pdf_extraction_and_query_spark.plans.extract import extract_spans
    from pdf_extraction_and_query_spark.sources.corpus import (
        spans_table_from_documents,
    )

    return extract_spans(spans_table_from_documents(spark, SMOKE_SF_DIR), mode="hybrid")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
