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


# --- interleaved image-text pair mining (media_pairs / media_pair_stats):
# the oracle-parity test pins the fixture-corpus values; these pin the
# GENERIC-rule branches the arithmetic fixture never reaches (NULL edges,
# footer skip on BOTH sides, adjacent media, short-caption drop) on
# handcrafted span frames, plus the one-exchange plan shape.

def _span(off, kind, text=None, media_ref=None):
    return {
        "kind": kind,
        "text": text,
        "media_ref": media_ref,
        "offset": off,
        "page": None,  # force marker-derived pages
        "font_size": None,
        "bold": None,
    }


def _pairs_df(spark, docs):
    from pdf_extraction_and_query_spark.operators.multimodal import media_pairs

    return media_pairs(docs_to_df(spark, docs))


_D1 = (
    "d1",
    [
        _span(0, "page_marker", "--- Page 1 ---"),
        _span(1, "text", "alpha beta gamma delta"),
        _span(2, "text", "Footer 1"),
        _span(3, "page_marker", "--- Page 2 ---"),
        _span(4, "text", "body two words here"),
        _span(5, "text", "Footer 2"),
        _span(6, "page_marker", "--- Page 3 ---"),
        _span(7, "figure", "Figure 1", "fig://d1/1"),
        _span(8, "text", "caption words three"),
        _span(9, "figure", "Figure 2", "fig://d1/2"),
        _span(10, "text", "Footer 3"),
        _span(11, "page_marker", "--- Page 4 ---"),
        _span(12, "text", "worda wordb"),
        _span(13, "text", "Footer 4"),
    ],
)
_D2 = (
    "d2",
    [
        _span(0, "figure", "Figure 1", "fig://d2/1"),
        _span(1, "text", "tiny cap"),
        _span(2, "figure", "Figure 2", "fig://d2/2"),
    ],
)
_D3 = (
    "d3",
    [
        _span(0, "text", "lead in text"),
        _span(1, "figure", "Figure 1", "fig://d3/1"),
        _span(2, "table", "Table 1", "tab://d3/2"),
        _span(3, "text", "shared caption here"),
    ],
)


def test_media_pairs_footer_skipped_both_sides(spark):
    """Repeated per-page footers (digit-normalized, 4 distinct pages) are
    boilerplate and never serve as caption OR context; pages derive from
    marker counting when the page field is absent."""
    rows = {r["media_ref"]: r for r in _pairs_df(spark, [_D1]).collect()}
    f1, f2 = rows["fig://d1/1"], rows["fig://d1/2"]
    assert f1["ctx_text"] == "body two words here"  # skips "Footer 2"
    assert f1["cap_text"] == "caption words three"
    assert (f1["cap_n_words"], f1["pair_ok"]) == (3, 1)
    assert f2["ctx_text"] == "caption words three"
    assert f2["cap_text"] == "worda wordb"  # skips "Footer 3"
    assert (f2["cap_n_words"], f2["pair_ok"]) == (2, 0)
    assert (f1["media_idx"], f2["media_idx"]) == (1, 2)


def test_media_pairs_null_edges_and_short_caption(spark):
    """Media as first span -> NULL context; media as last span -> NULL
    caption and pair_ok=0; a 2-word caption fails MM_PAIR_MIN_WORDS."""
    rows = {r["media_ref"]: r for r in _pairs_df(spark, [_D2]).collect()}
    f1, f2 = rows["fig://d2/1"], rows["fig://d2/2"]
    assert f1["ctx_text"] is None and f1["cap_text"] == "tiny cap"
    assert (f1["cap_n_words"], f1["pair_ok"]) == (2, 0)
    assert f2["ctx_text"] == "tiny cap" and f2["cap_text"] is None
    assert f2["cap_n_words"] is None and f2["pair_ok"] == 0


def test_media_pairs_adjacent_media_share_caption(spark):
    """Back-to-back media (figure then table) both pair with the nearest
    prose on each side — media spans are never caption candidates."""
    rows = {r["media_ref"]: r for r in _pairs_df(spark, [_D3]).collect()}
    for ref in ("fig://d3/1", "tab://d3/2"):
        assert rows[ref]["ctx_text"] == "lead in text"
        assert rows[ref]["cap_text"] == "shared caption here"
        assert rows[ref]["pair_ok"] == 1
    assert rows["tab://d3/2"]["kind"] == "table"


def test_media_pair_stats_arithmetic(spark):
    from pdf_extraction_and_query_spark.operators.multimodal import (
        media_pair_stats,
    )

    row = media_pair_stats(_pairs_df(spark, [_D1, _D2, _D3])).collect()[0]
    # pair_ok: d1 (1, 0), d2 (0, 0), d3 (1, 1); caps: 3,2 / 2,NULL / 3,3
    assert row["n_media"] == 6
    assert row["n_pairs_ok"] == 3
    assert row["keep_ratio_e4"] == 30000 // 6
    assert row["n_docs"] == 3
    assert row["avg_cap_words_e2"] == (100 * 13) // 5


def test_media_pairs_single_exchange_plan(spark):
    """The whole operator — explode, boilerplate flag, both adjacency
    windows, media rank — runs on ONE doc_id hash exchange (the
    (doc_id, norm) boilerplate window reuses it via the subset rule,
    PLANS.md #37)."""
    plan = (
        _pairs_df(spark, [_D1, _D2, _D3])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
