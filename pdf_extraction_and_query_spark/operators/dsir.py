"""DSIR-style importance resampling over hashed token buckets.

Public method: Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling" (NeurIPS) — estimate importance weights
p_target(x)/p_raw(x) with hashed bag-of-ngram models, then resample the
raw corpus by those weights. The reference repo has no training-data
curation surface; this belongs to the LLM-data-pipeline family the build
adds on top of SURVEY §2 (like curate_corpus / stratified_sample).

Exact-integer analog (cross-engine determinism contract, contract.py):
per hashed bucket b, ``ratio_e6(b) = (1e6 * (cnt_target[b]+1)) div
(cnt_raw[b]+1)`` — the Laplace-smoothed frequency ratio with the totals'
constant factor dropped (a factor common to every bucket scales every
doc's score equally, so ranking and top-k selection are unchanged) — and
a doc's weight is the ARITHMETIC mean of its tokens' ratios. DSIR's
log-likelihood-ratio sum needs logs, which the contract bans (see the
BM25 idf note in contract.py); the mean-of-ratios ranks the same
target-affine tail — the same documented deviation as lm_fluency.

100-TB shape: ONE narrow tokenize+hash pass over the raw corpus feeds
ONE map-side-combined exchange of (doc_id, bucket, count) partials —
at most min(n_tokens, n_docs * DSIR_BUCKETS) rows; everything downstream
(per-bucket raw totals, the broadcast DSIR_BUCKETS-row model, the
per-doc weight) reduces already-reduced frames. The partials frame is
localCheckpointed because BOTH the model fit and the scoring consume it
(multiple DataFrame references to one subtree plan independently —
PLANS.md #11). int64 bound: 1e6 * (cnt+1) < 2^63 while any single bucket
holds < 9.2e12 tokens — even a fully skewed 10^12-doc corpus is safe
until ~10^13 tokens land in ONE of the DSIR_BUCKETS buckets.

The selection step (:func:`dsir_sample`) is the paper's deterministic
top-k variant — see its docstring for why the stochastic Gumbel resample
is out of contract here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import contract as C
from .repetition import _words
from .textstats import poly_hash
from .util import fan_out


def doc_bucket_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, b, c): per-doc hashed-token bucket counts.

    Two-stage shape: the narrow tokenize pass feeds a (doc_id, word)
    hash-agg on RAW STRINGS (map-side combined — the only exchange that
    sees per-token rows, as partials), and only the distinct pairs reach
    :func:`poly_hash` — the hash is a pure per-word function, so hashing
    after the count is value-identical to hashing every occurrence while
    running the interpreted higher-order aggregate (~0.2 ms/row, PLANS.md
    #14) n_distinct(doc, word) times instead of n_tokens times (16.4 s ->
    1.7 s at sf0.1). The second (doc_id, b) agg reduces already-reduced
    pair rows."""
    toks = fan_out(docs).select(
        "doc_id", F.explode(_words(F.col("text"))).alias("word")
    )
    wc = toks.groupBy("doc_id", "word").agg(
        F.count("*").cast("long").alias("c")
    )
    return (
        wc.select(
            "doc_id",
            (poly_hash(F.col("word")) % C.DSIR_BUCKETS)
            .cast("long")
            .alias("b"),
            "c",
        )
        .groupBy("doc_id", "b")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def dsir_model(raw_db: DataFrame, target_db: DataFrame) -> DataFrame:
    """The DSIR_BUCKETS-row bucket model: raw and target counts (full
    outer over the two tiny aggregates; absent bucket = 0) and the
    smoothed importance ratio."""
    rt = raw_db.groupBy("b").agg(F.sum("c").cast("long").alias("cnt_r"))
    tt = target_db.groupBy("b").agg(F.sum("c").cast("long").alias("cnt_t"))
    return (
        rt.join(tt, "b", "full")
        .select(
            "b",
            F.coalesce("cnt_r", F.lit(0)).cast("long").alias("cnt_r"),
            F.coalesce("cnt_t", F.lit(0)).cast("long").alias("cnt_t"),
        )
        .withColumn(
            "ratio_e6",
            F.expr("(1000000 * (cnt_t + 1)) div (cnt_r + 1)").cast("long"),
        )
    )


def _is_target() -> F.Column:
    return F.col("lang").isin(*C.DSIR_TARGET_LANGS)


def dsir_weights(docs: DataFrame) -> DataFrame:
    """Per-doc importance weight of the WHOLE corpus against the contract
    target slice (lang in DSIR_TARGET_LANGS — the fixture's stand-in for
    a small high-quality corpus). Raw = all docs, like DSIR's raw pool."""
    db = doc_bucket_counts(
        docs.select("doc_id", "lang", "text")
    ).localCheckpoint()  # model fit + scoring both consume it (PLANS.md #11)
    langs = docs.select(F.col("doc_id").cast("long").alias("doc_id"), "lang")
    db = db.select(F.col("doc_id").cast("long").alias("doc_id"), "b", "c")
    tgt = db.join(
        F.broadcast(langs.where(_is_target()).select("doc_id")), "doc_id"
    )
    model = dsir_model(db, tgt)
    scored = db.join(
        F.broadcast(model.select("b", "ratio_e6")), "b"
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.expr("sum(c * ratio_e6) div sum(c)")
            .cast("long")
            .alias("weight_e6"),
        )
        .join(langs, "doc_id")
        .select("doc_id", "lang", "n_tokens", "weight_e6")
    )


def dsir_sample(docs: DataFrame, k: int = C.DSIR_SAMPLE_K) -> DataFrame:
    """The paper's TOP-K SELECTION variant: keep the k highest-weight docs
    (doc_id tie-break). The stochastic Gumbel-top-k resample needs logs
    and an RNG — both banned by the determinism contract (and a salted-
    uniform analog is noise-dominated whenever the corpus is homogeneous,
    i.e. it silently degrades to unweighted sampling); top-k is the
    deterministic selection rule DSIR itself offers. orderBy().limit()
    compiles to TakeOrderedAndProject — per-partition top-k + driver merge
    of k·P rows, never a global sort (the paginate lesson)."""
    return (
        dsir_weights(docs)
        .orderBy(F.desc("weight_e6"), F.asc("doc_id"))
        .limit(int(k))
        .select("doc_id", "lang", "n_tokens", "weight_e6")
    )
