"""Streaming content dedup over HTML: the same article under DIFFERENT
chrome (different raw bytes!) dedups on extracted main content across
micro-batches; chrome-only pages are never treated as duplicates of each
other."""

from datetime import datetime, timezone

from pdf_extraction_and_query_spark.streaming.dedup import dedup_html_stream

SCHEMA = "doc_id string, html string, ts timestamp"
ARTICLE = "<p>The merger closed after the disclosure schedule review.</p>"


def _ts(minute):
    return datetime(2024, 1, 1, 12, minute, tzinfo=timezone.utc)


def _drain(spark, in_dir, out_dir, ckpt):
    q = (
        dedup_html_stream(spark.readStream.schema(SCHEMA).parquet(in_dir))
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_recrawled_article_under_new_chrome_emits_once(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("hsdedup")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")

    batch1 = [
        ("a", f"<nav><a href='/'>Home</a></nav>{ARTICLE}", _ts(0)),
        ("b", "<p>A different article entirely.</p>", _ts(1)),
        ("c", "<nav><a href='/'>Home</a></nav>", _ts(2)),   # chrome-only
    ]
    spark.createDataFrame(batch1, SCHEMA).write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, out_dir, ckpt)
    got1 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {"a", "b", "c"}

    batch2 = [
        # same article, new chrome -> raw bytes differ, content hash equal
        ("d", f"<header><p>Mirror site</p></header>{ARTICLE}"
              "<footer><p>Other Corp</p></footer>", _ts(10)),
        ("e", "<p>Genuinely new content here.</p>", _ts(11)),
        ("f", "<footer><p>chrome only again</p></footer>", _ts(12)),  # empty
    ]
    spark.createDataFrame(batch2, SCHEMA).write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, out_dir, ckpt)
    got2 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    # d dropped (content dup of a); both chrome-only pages pass
    assert got2 == {"a", "b", "c", "e", "f"}
