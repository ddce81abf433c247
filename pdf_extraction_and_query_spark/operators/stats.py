"""Corpus statistics / rollup operators.

Reference parity: DB stats (pgvector_client.py:379-401,
rag_service.py:302-326) and the evaluation aggregates
(scripts/analyze_results.py:40-60) — re-expressed as single-shuffle hash
aggregates with map-side partial combine.

Determinism: no floating sums across rows (order-dependent) — counts,
integer sums, min/max, and ratios of exact integers only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_stats(documents: DataFrame) -> DataFrame:
    """Per (lang, source): doc count, char sum, avg chars."""
    return (
        documents.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.round(F.sum("n_chars") / F.count("*"), 4).alias("avg_chars"),
        )
    )


def events_rollup(events: DataFrame) -> DataFrame:
    """Hourly per-type rollup over the events table: count + min/max value
    (exact aggregates only; no order-dependent float sums)."""
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH")
    return (
        events.groupBy(F.col("event_type"), hour.alias("hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
    )
