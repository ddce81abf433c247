"""Watermarked windowed rollup: every FINALIZED window emitted by the
stream must equal the batch twin's row exactly (append mode emits a window
once and never revises it), a window must actually finalize across the
incremental drains (non-vacuous), and no window may be emitted twice."""

from pyspark.sql import functions as F

from pdf_extraction_and_query_spark.streaming.rollup import events_rollup_stream

SF = "/root/testdata/sf0.001"
COLS = ["event_type", "hour_epoch", "n_events", "min_value", "max_value"]


def _drain(spark, schema, in_dir, out_dir, ckpt):
    q = (
        events_rollup_stream(spark.readStream.schema(schema).parquet(in_dir))
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_finalized_windows_match_batch_exactly(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("roll")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")

    events = spark.read.parquet(f"{SF}/events.parquet")
    cutoff = int(events.selectExpr("percentile(unix_timestamp(ts), 0.5)").first()[0])

    events.where(F.unix_timestamp("ts") <= cutoff).write.mode("append").parquet(in_dir)
    _drain(spark, events.schema, in_dir, out_dir, ckpt)
    events.where(F.unix_timestamp("ts") > cutoff).write.mode("append").parquet(in_dir)
    _drain(spark, events.schema, in_dir, out_dir, ckpt)

    out = spark.read.parquet(out_dir)
    # schema parity with the batch twin: n_users is PRESENT (approximate —
    # HLL++ rsd 0.05; the batch operator remains the exact-distinct path)
    assert set(out.columns) == set(COLS) | {"n_users"}, out.columns
    emitted = [tuple(r[c] for c in COLS) for r in out.collect()]
    assert len(emitted) == len(set(emitted)), "a finalized window was emitted twice"
    got = set(emitted)

    # batch twin on the same columns (exact COUNT DISTINCT stays batch-only)
    batch = {
        tuple(r[c] for c in COLS)
        for r in (
            events.groupBy(
                "event_type",
                (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
                .cast("long")
                .alias("hour_epoch"),
            )
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.min("value"), 6).alias("min_value"),
                F.round(F.max("value"), 6).alias("max_value"),
            )
            .collect()
        )
    }

    # append mode may only emit FINAL window values — every emitted row must
    # be byte-identical to the batch aggregate of the full input
    assert got <= batch, got - batch
    # non-vacuous: most of the timeline is past the watermark by drain 2
    batch_keys = {(t, h) for (t, h, *_rest) in batch}
    got_keys = {(t, h) for (t, h, *_rest) in got}
    assert len(got_keys) > len(batch_keys) // 2, (len(got_keys), len(batch_keys))
    # and specifically every window ending >1h before the first drop's max
    # event time was finalized no later than the second drain
    finalized_bound = cutoff - 3600
    must_have = {(t, h) for (t, h) in batch_keys if h + 3600 <= finalized_bound}
    assert must_have <= got_keys, must_have - got_keys

    # approximate n_users lands within tolerance of the exact batch distinct
    # count for every finalized window (rsd=0.05 → 3σ ≈ 15%, plus small-count
    # slack; HLL++ is exact-ish at these cardinalities)
    exact = {
        (r["event_type"], r["hour_epoch"]): r["n_users"]
        for r in (
            events.groupBy(
                "event_type",
                (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
                .cast("long")
                .alias("hour_epoch"),
            )
            .agg(F.count_distinct("user_id").alias("n_users"))
            .collect()
        )
    }
    for r in out.collect():
        ex = exact[(r["event_type"], r["hour_epoch"])]
        tol = max(2, 0.15 * ex)
        assert abs(r["n_users"] - ex) <= tol, (r["event_type"], r["hour_epoch"], r["n_users"], ex)
