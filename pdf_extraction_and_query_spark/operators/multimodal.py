"""Multimodal (image/audio/video) columns: opaque ``binary`` payloads +
typed metadata, processed by Arrow-batched ``mapInPandas`` UDFs.

The real codec libraries (PIL/ffmpeg/torchaudio) are not in this sandbox,
so the DECODE step is stubbed: ``decode_payload`` raises
``NotImplementedError`` unless the payload carries our deterministic fake
header (``FAKE``), in which case it "decodes" to a seeded feature tuple.
Everything AROUND the decode — table schema, binary Arrow transfer,
batch iteration, partition-parallel UDF shape, metadata propagation, and
the join back to the extraction pipeline's media spans — is real and
tested; swapping in a real codec is a one-function change.

Scale notes: payloads ride the Arrow channel as zero-copy binary buffers;
decode/resize/frame-sample are narrow (no shuffle); the enrichment join
broadcasts the (small) feature side when joined to span output.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), False),
    ]
)

_MAGIC = b"FAKE"


def fake_payload(media_ref: str, modality: str) -> bytes:
    """Deterministic stand-in for real media bytes: FAKE | modality[0] |
    w:u16 | h:u16 | dur_ms:u32 | 64 content bytes (sha512 of the ref)."""
    h = hashlib.sha512(media_ref.encode()).digest()
    w = 64 + h[0] % 4 * 64
    ht = 64 + h[1] % 4 * 64
    dur = 1000 + int.from_bytes(h[2:4], "big") % 60000
    return _MAGIC + modality[:1].encode() + struct.pack(">HHI", w, ht, dur) + h[:64]


def decode_payload(payload: bytes) -> dict:
    """STUB decode. Real codecs are out of sandbox scope; payloads without
    the fake header raise, exactly where PIL/ffmpeg would be called."""
    if payload[:4] != _MAGIC:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg (unavailable in this "
            "environment); payload lacks the deterministic FAKE header"
        )
    w, h, dur = struct.unpack(">HHI", payload[5:13])
    content = payload[13:]
    return {
        "width": w,
        "height": h,
        "duration_ms": dur,
        "mean_intensity": sum(content) / len(content) / 255.0,
    }


def synth_media_table(spark: SparkSession, refs_df: DataFrame) -> DataFrame:
    """Build the media table for every distinct media_ref in a span corpus
    (media spans carry ``fig://...`` / ``tab://...`` refs). Distributed: one
    narrow mapInPandas over the refs."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs = list(pdf["media_ref"])
            # only tab:// table renders ride the video/duration branch;
            # every other ref (fig://, img://, and real-world image URLs —
            # https/…/x.png, data:) is an image. Defaulting the unknown
            # case to image, not video, matches what an <img> src can be
            # (review finding: the old fig-prefix test classified every
            # non-fixture URL as video).
            modality = ["video" if r.startswith("tab") else "image" for r in refs]
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "modality": modality,
                    "payload": [fake_payload(r, m) for r, m in zip(refs, modality)],
                    "meta": [
                        {"source_kind": "figure" if m == "image" else "table"}
                        for m in modality
                    ],
                }
            )

    return refs_df.select("media_ref").distinct().mapInPandas(gen, MEDIA_SCHEMA)


FEATURES_SCHEMA = (
    "media_ref string, modality string, width int, height int, "
    "duration_ms long, mean_intensity double"
)


def extract_features(media_df: DataFrame) -> DataFrame:
    """Decode + feature-extract per payload (Arrow-batched, narrow)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_payload(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "modality": pdf["modality"],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "duration_ms": [f["duration_ms"] for f in feats],
                    "mean_intensity": [f["mean_intensity"] for f in feats],
                }
            )

    return media_df.mapInPandas(run, FEATURES_SCHEMA)


def resize_images(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """'Resize' images to (width, height): stub transform re-encodes the
    fake payload with the new dimensions (a real impl calls PIL here);
    non-images pass through untouched."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = []
            for p, m in zip(pdf["payload"], pdf["modality"]):
                p = bytes(p)
                if m == "image":
                    d = decode_payload(p)
                    head = _MAGIC + b"i" + struct.pack(">HHI", width, height, d["duration_ms"])
                    out_payload.append(head + p[13:])
                else:
                    out_payload.append(p)
            pdf = pdf.assign(payload=out_payload)
            yield pdf

    return media_df.mapInPandas(run, MEDIA_SCHEMA)


FRAMES_SCHEMA = "media_ref string, frame_idx int, ts_ms long, frame_hash string"


def sample_frames(media_df: DataFrame, fps: float = 1.0) -> DataFrame:
    """Frame-sample videos at ``fps``: one output row per sampled frame
    (a real impl seeks with ffmpeg; the stub hashes (ref, idx))."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_ref": [], "frame_idx": [], "ts_ms": [], "frame_hash": []}
            for r, m, p in zip(pdf["media_ref"], pdf["modality"], pdf["payload"]):
                if m != "video":
                    continue
                dur = decode_payload(bytes(p))["duration_ms"]
                step = int(1000 / fps)
                for i, ts in enumerate(range(0, dur, step)):
                    out["media_ref"].append(r)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(ts)
                    out["frame_hash"].append(
                        hashlib.sha1(f"{r}:{i}".encode()).hexdigest()[:16]
                    )
            yield pd.DataFrame(out)

    return media_df.mapInPandas(run, FRAMES_SCHEMA)


def media_pairs(spans_df: DataFrame) -> DataFrame:
    """Interleaved image-text pair mining (the OBELICS/LAION-style
    multimodal training-data op): one row per media span with its caption
    candidate (nearest FOLLOWING non-boilerplate text span) and context
    (nearest PRECEDING non-boilerplate text span), a caption word count,
    and the keep flag ``pair_ok`` (caption present with >=
    ``contract.MM_PAIR_MIN_WORDS`` words).

    Boilerplate text (the north-rule repeated-line flag from
    ``extraction.flag_boilerplate``) is ineligible as caption/context, so
    a page footer sitting between a figure and the surrounding prose never
    pollutes the pair — the semantics a real interleaved web/PDF corpus
    needs, not a fixture-keyed rule.

    Scale shape: explode + every window partitions by doc_id (the
    boilerplate window's (doc_id, norm) key reuses the doc_id exchange via
    the subset rule, PLANS.md #37) — ONE exchange end to end, media rows
    only past the filter.  No reference analog (the reference stores media
    spans but never mines pairs); the span-order adjacency semantics
    mirror its interleave contract (src/extraction/pdf_extractor.py
    reading-order sort).
    """
    from pyspark.sql import Window

    from .. import contract as C
    from .extraction import MEDIA_KINDS, explode_spans, flag_boilerplate

    lines = flag_boilerplate(explode_spans(spans_df))
    eligible = F.when(
        (F.col("kind") == "text") & ~F.col("is_boiler"), F.col("text")
    )
    w = Window.partitionBy("doc_id").orderBy("offset")
    df = lines.select(
        "doc_id",
        "kind",
        "media_ref",
        "offset",
        F.last(eligible, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("ctx_text"),
        F.first(eligible, ignorenulls=True)
        .over(w.rowsBetween(1, Window.unboundedFollowing))
        .alias("cap_text"),
    ).where(F.col("kind").isin(*MEDIA_KINDS))
    cap_words = F.when(
        F.col("cap_text").isNotNull(),
        F.size(F.split(F.trim("cap_text"), r"\s+")),
    ).cast("long")
    return df.select(
        "doc_id",
        F.row_number().over(w).cast("long").alias("media_idx"),
        "kind",
        "media_ref",
        "ctx_text",
        "cap_text",
        cap_words.alias("cap_n_words"),
        (
            F.col("cap_text").isNotNull()
            & (cap_words >= F.lit(C.MM_PAIR_MIN_WORDS))
        )
        .cast("long")
        .alias("pair_ok"),
    )


def media_pair_stats(pairs: DataFrame) -> DataFrame:
    """Corpus rollup of :func:`media_pairs` — the pair-mining yield report
    (what a multimodal-pretraining owner reads before committing a crawl):
    media spans seen, pairs kept, fixed-point keep ratio, docs contributing,
    mean caption length.  One map-side-combined aggregate over rows that are
    already media-only summaries."""
    return pairs.agg(
        F.count("*").cast("long").alias("n_media"),
        F.sum("pair_ok").cast("long").alias("n_pairs_ok"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.sum("cap_n_words").cast("long").alias("sum_cap_words"),
        F.count("cap_n_words").cast("long").alias("n_caps"),
    ).select(
        "n_media",
        "n_pairs_ok",
        F.expr("(10000 * n_pairs_ok) div greatest(n_media, 1)")
        .cast("long")
        .alias("keep_ratio_e4"),
        "n_docs",
        F.expr("(100 * sum_cap_words) div greatest(n_caps, 1)")
        .cast("long")
        .alias("avg_cap_words_e2"),
    )


def enrich_spans_with_media(out_spans: DataFrame, features: DataFrame) -> DataFrame:
    """Join the extraction pipeline's media spans to their decoded features
    — broadcast hash join on media_ref (features side is per-asset, tiny
    relative to the span table)."""
    return out_spans.join(F.broadcast(features), "media_ref", "left")
