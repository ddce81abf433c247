"""Stateful streaming sessionization (applyInPandasWithState): sessions
must merge across micro-batches AND across query restarts (the keyed state
lives in the checkpointed state store), and every CLOSED session must equal
the batch twin's row exactly. A user's final session stays open (only a
later event or a processing-time timeout closes it), so the expected closed
set is the batch output minus each user's last session."""

from pyspark.sql import functions as F

from pdf_extraction_and_query_spark.operators.stats import sessionize
from pdf_extraction_and_query_spark.streaming.sessions import (
    sessionize_stream,
    sessionize_stream_event_time,
)

SF = "/root/testdata/sf0.001"
EVENT_COLS = ["user_id", "session_id", "n_events", "start_epoch", "end_epoch"]


def _drain(spark, in_dir, out_dir, ckpt):
    q = (
        sessionize_stream(
            spark.readStream.schema(
                spark.read.parquet(f"{SF}/events.parquet").schema
            ).parquet(in_dir)
        )
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_sessions_merge_across_batches_and_restarts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sess")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")

    base_events = spark.read.parquet(f"{SF}/events.parquet")
    cutoff = int(
        base_events.selectExpr("percentile(unix_timestamp(ts), 0.5)").first()[0]
    )

    # a deterministic STRADDLING user: events 60s either side of the cutoff
    # (one session iff state survives the batch boundary and the restart),
    # then a later event opening session 2 so the merged session closes
    extra = spark.createDataFrame(
        [
            (900001, cutoff - 60, 999999, "click", 1.0, "{}"),
            (900002, cutoff + 60, 999999, "click", 1.0, "{}"),
            (900003, cutoff + 60 + 7200, 999999, "click", 1.0, "{}"),
        ],
        "event_id long, epoch long, user_id long, event_type string, value double, props string",
    ).select(
        "event_id",
        F.timestamp_seconds("epoch").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    events = base_events.unionByName(extra)

    # half the timeline per drop; the straddling session must be merged by
    # carried state, not split at the batch boundary
    events.where(F.unix_timestamp("ts") <= cutoff).write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, out_dir, ckpt)
    events.where(F.unix_timestamp("ts") > cutoff).write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, out_dir, ckpt)  # same checkpoint: state restored

    got = {
        tuple(r[c] for c in EVENT_COLS)
        for r in spark.read.parquet(out_dir).collect()
    }

    batch = sessionize(events).collect()
    last_per_user = {}
    for r in batch:
        if r["session_id"] > last_per_user.get(r["user_id"], 0):
            last_per_user[r["user_id"]] = r["session_id"]
    expected_closed = {
        tuple(r[c] for c in EVENT_COLS)
        for r in batch
        if r["session_id"] != last_per_user[r["user_id"]]
    }

    assert got == expected_closed
    assert len(got) > 0  # non-vacuous: sessions actually closed
    # the straddling user's two boundary events merged into ONE session —
    # carried state, not a split at the batch boundary
    assert (999999, 1, 2, cutoff - 60, cutoff + 60) in got


EVENTS_DDL = (
    "event_id long, epoch long, user_id long, "
    "event_type string, value double, props string"
)


def _mk_events(spark, rows):
    return spark.createDataFrame(rows, EVENTS_DDL).select(
        "event_id",
        F.timestamp_seconds("epoch").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def test_idle_sessions_flush_after_watermark(spark, tmp_path_factory):
    """Event-time-timeout variant: an idle user's open session must be
    EMITTED (and its state dropped) once the watermark passes
    session_end + gap — no later event from that user required."""
    base = tmp_path_factory.mktemp("sess_et")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    t0 = 1_700_000_000

    def drain():
        q = (
            sessionize_stream_event_time(
                spark.readStream.schema(_mk_events(spark, []).schema).parquet(in_dir)
            )
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # drop 1: user 1's whole (future-idle) session
    _mk_events(
        spark, [(1, t0, 1, "click", 1.0, "{}"), (2, t0 + 600, 1, "click", 1.0, "{}")]
    ).write.mode("append").parquet(in_dir)
    drain()
    # drop 2: an unrelated user far in the future advances the watermark
    _mk_events(spark, [(3, t0 + 3 * 3600, 2, "click", 1.0, "{}")]).write.mode(
        "append"
    ).parquet(in_dir)
    drain()
    # drop 3: one more batch so timeouts are evaluated against the advanced
    # watermark (timeout processing uses the watermark carried into the batch)
    _mk_events(spark, [(4, t0 + 4 * 3600, 2, "click", 1.0, "{}")]).write.mode(
        "append"
    ).parquet(in_dir)
    drain()

    got = {
        tuple(r[c] for c in EVENT_COLS)
        for r in spark.read.parquet(out_dir).collect()
    }
    # user 1 never sent another event, yet their session flushed via timeout
    assert (1, 1, 2, t0, t0 + 600) in got, got
