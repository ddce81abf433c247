"""Training-shard packing: assign documents to ~equal-token shards.

The step between a cleaned corpus and a training run: data loaders want
shards of roughly constant token mass, produced deterministically so a
re-run (or a resumed run) shards identically.  Rule: documents are taken
in ``doc_id`` order and the shard id is ``floor(exclusive-prefix-sum(
ws_tokens) / PACK_TOKEN_BUDGET)`` — fixed token boundaries, no
bin-packing heuristics, so the assignment is a pure function of the
corpus (and therefore oracle-expressible).

Scale: a global ordered prefix sum is ONE window task no matter how many
executors — the same doc-serial trap as extraction stage 1 — so this
reuses the banded distributed prefix scan (local exclusive sums inside
``(band = floor(doc_id / PACK_BAND))`` windows + cumulated band totals
joined back on the band key).  Token counting itself is the codegen
column expression shared with ``textstats.token_counts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import contract as C


def shard_pack(docs: DataFrame, budget: int = C.PACK_TOKEN_BUDGET) -> DataFrame:
    """(doc_id, n_tokens, shard_id): deterministic token-budget sharding.

    ``shard_id = floor(tokens-before-this-doc / budget)`` — a document
    whose tokens straddle a boundary belongs to the shard it started in,
    so every shard holds >= budget tokens except the last (no empty
    shards, no lookahead needed)."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.split(F.trim(F.col("text")), C.WS_SPLIT_RE))
        .cast("long")
        .alias("n_tokens"),
    ).withColumn("band", F.floor(F.col("doc_id") / C.PACK_BAND).cast("long"))

    w_local = (
        Window.partitionBy("band")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = toks.withColumn(
        "local_excl", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    w_bands = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    totals = (
        local.groupBy("band")
        .agg(F.sum("n_tokens").alias("band_total"))
        .select(
            "band",
            F.coalesce(F.sum("band_total").over(w_bands), F.lit(0)).alias(
                "band_before"
            ),
        )
    )
    return local.join(totals, "band").select(
        "doc_id",
        "n_tokens",
        F.floor((F.col("band_before") + F.col("local_excl")) / budget)
        .cast("long")
        .alias("shard_id"),
    )


def shard_stats(docs: DataFrame, budget: int = C.PACK_TOKEN_BUDGET) -> DataFrame:
    """Per-shard rollup of the packing: doc count + token mass per shard
    (the manifest a training loader reads)."""
    return (
        shard_pack(docs, budget)
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def stratified_sample(docs: DataFrame) -> DataFrame:
    """Deterministic hash-based stratified sampling — the corpus-curation
    step that rebalances language/source mix before training.  The keep
    decision is ``poly_hash(SAMPLE_SALT || doc_id) % SAMPLE_MOD <
    rate_micro(lang)`` — a pure per-row function (no RNG state, no
    shuffle), so the sample is identical across re-runs, executors and
    engines; ``F.rand()`` or ``df.sample()`` would be neither resumable
    nor oracle-checkable.  The salt decorrelates the sampling hash from
    the fingerprint/dedup uses of the same poly hash."""
    from .textstats import poly_hash

    bucket = (
        poly_hash(F.concat(F.lit(C.SAMPLE_SALT), F.col("doc_id").cast("string")))
        % C.SAMPLE_MOD
    )
    rate = F.lit(C.SAMPLE_DEFAULT_MICRO)
    for lang, micro in sorted(C.SAMPLE_RATES_MICRO.items()):
        rate = F.when(F.col("lang") == lang, F.lit(micro)).otherwise(rate)
    return (
        docs.withColumn("sample_bucket", bucket.cast("long"))
        .where(F.col("sample_bucket") < rate)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "lang",
            "sample_bucket",
        )
    )
