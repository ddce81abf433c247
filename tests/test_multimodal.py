"""Multimodal plumbing tests: binary payload schema, stubbed decode,
resize/frame-sample UDF shapes, and the media-feature enrichment join
against the real extraction pipeline output."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_and_query_spark.operators.multimodal import (
    decode_payload,
    enrich_spans_with_media,
    extract_features,
    fake_payload,
    resize_images,
    sample_frames,
    synth_media_table,
)
from pdf_extraction_and_query_spark.plans.extract import extract_spans
from pdf_extraction_and_query_spark.sources.corpus import docs_to_df, synth_docs


@pytest.fixture(scope="module")
def media_env(spark):
    spans = docs_to_df(spark, synth_docs(30, seed=11))
    out = extract_spans(spans, mode="fused")
    media_refs = out.where(F.col("media_ref").isNotNull())
    media = synth_media_table(spark, media_refs)
    return out, media


def test_decode_stub_contract():
    p = fake_payload("fig://doc1/1", "image")
    d = decode_payload(p)
    assert 64 <= d["width"] <= 256 and 64 <= d["height"] <= 256
    assert 0.0 <= d["mean_intensity"] <= 1.0
    assert decode_payload(p) == d  # deterministic
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x89PNG\r\n\x1a\n...")  # real bytes -> stub boundary


def test_media_table_and_features(media_env, spark):
    out, media = media_env
    n_refs = out.where(F.col("media_ref").isNotNull()).select("media_ref").distinct().count()
    assert media.count() == n_refs > 0
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == n_refs
    assert all(r["width"] > 0 and 0 <= r["mean_intensity"] <= 1 for r in rows)
    # deterministic across runs
    assert sorted(map(tuple, rows)) == sorted(map(tuple, extract_features(media).collect()))


def test_resize_updates_dimensions_only_for_images(media_env):
    _, media = media_env
    before = {
        r["media_ref"]: (r["width"], r["height"])
        for r in extract_features(media).collect()
    }
    resized = extract_features(resize_images(media, 224, 224)).collect()
    for r in resized:
        if r["modality"] == "image":
            assert (r["width"], r["height"]) == (224, 224)
        else:  # non-images pass through byte-identical
            assert (r["width"], r["height"]) == before[r["media_ref"]]


def test_frame_sampling(media_env):
    _, media = media_env
    frames = sample_frames(media, fps=2.0)
    pdf = frames.toPandas()
    if len(pdf):
        per = pdf.groupby("media_ref")
        durs = {
            r["media_ref"]: decode_payload(bytes(r["payload"]))["duration_ms"]
            for r in media.where(F.col("modality") == "video").collect()
        }
        for ref, g in per:
            assert len(g) == len(range(0, durs[ref], 500))
            assert list(g.sort_values("frame_idx")["frame_idx"]) == list(range(len(g)))


def test_enrichment_join(media_env):
    out, media = media_env
    enriched = enrich_spans_with_media(out, extract_features(media))
    media_rows = enriched.where(F.col("media_ref").isNotNull())
    assert media_rows.where(F.col("width").isNull()).count() == 0
    text_rows = enriched.where(F.col("kind") == "text")
    assert text_rows.where(F.col("width").isNotNull()).count() == 0
