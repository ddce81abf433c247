"""Watermarked windowed aggregation: the streaming twin of
``operators/stats.events_rollup``.

Hourly tumbling windows per event_type with an event-time watermark: late
events inside the ``late_allowance`` still land in their window; once the
watermark (max event time seen − allowance) passes a window's end, the
window is FINALIZED and emitted exactly once (append mode), and later-still
events for it are dropped — the standard bounded-state contract, which is
what keeps state finite on an unbounded 10^12-event stream (state size =
windows within the allowance horizon, not the stream's history).

``n_users`` keeps the batch twin's column present but is APPROXIMATE:
exact COUNT(DISTINCT) is not expressible in a streaming aggregation (it
would need unbounded per-window sets), so the stream carries a HyperLogLog++
``approx_count_distinct`` with relative standard deviation ``n_users_rsd``
(default 0.05 — the sketch is ~1.5 KB of bounded per-window state).  A
consumer needing exact distincts runs the batch operator over the sink;
test_streaming_rollup asserts the approximation lands within tolerance of
the exact batch values on the testdata events.

Emitted rows carry hour_epoch exactly like the batch twin, so finalized
windows are row-for-row comparable (test_streaming_rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def events_rollup_stream(
    events_stream: DataFrame,
    late_allowance: str = "1 hour",
    n_users_rsd: float = 0.05,
) -> DataFrame:
    """readStream(events) -> watermark -> hourly window aggregate.
    Append-mode output: one immutable row per finalized (event_type, hour)."""
    win = F.window("ts", "1 hour")
    # watermarks require TIMESTAMP (ltz); the testdata parquet carries NTZ —
    # the cast interprets it in the session TZ (pinned UTC), matching the
    # batch twin's unix_timestamp arithmetic
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        events_stream.withWatermark("ts", late_allowance)
        .groupBy(F.col("event_type"), win.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
            F.approx_count_distinct("user_id", rsd=n_users_rsd).alias("n_users"),
        )
    )
    return agg.select(
        "event_type",
        F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
        "n_events",
        "min_value",
        "max_value",
        "n_users",
    )
