"""Incremental quality-signal scoring under Structured Streaming — every
curation signal the batch gate reads is now maintainable live (the
frontier-signal precedent): CCNet bucket + fluency under a FROZEN
per-language LM, plus the (stateless) classifier verdict.

Layout under one index root:
  _model/{c2,c1,cuts}  the per-language bigram counts and third cutoffs,
           FROZEN at init (re-deriving counts or cutoffs is a retrain, not
           maintenance — the frozen-centroid / frozen-codebook / frozen-
           bounds insert rule).  Scoring is PER-DOCUMENT PURE given the
           model, so incremental == one-shot-under-frozen-model by
           construction.  Frozen-LM scoring rule (operators/textstats.
           _ccnet_fluency): transitions the model never saw drop from the
           mean; a doc with no known transition — or in a language the
           model never saw — emits no row (production retrains at the next
           wave; tests pin the rule).
  scores/  the scored base corpus (doc_id, lang, fluency_e6, bucket,
           cls_score_e6, label)
  delta/   batch_id=N — per-micro-batch scores; clear + batch_id
           partition-overwrite = exactly-once on replay.

PARQUET-BACKEND-ONLY like the sibling maintainers (see streaming/pq.py's
module docstring for the Iceberg-native equivalent).
"""

from __future__ import annotations

import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.classifier import quality_classify
from ..operators.textstats import ccnet_model, ccnet_score
from ..sources import tables
from ..sources.tables import read_optional as _read_delta

_MODEL_PARTS = ("c2", "c1", "cuts")


def _score(docs: DataFrame, model) -> DataFrame:
    """(doc_id, lang, fluency_e6, bucket, cls_score_e6, label) — the two
    model-shaped curation signals in one frame.  Inner join on doc_id: the
    classifier scores any >=1-token doc but ccnet needs >=2 tokens and a
    known language, so the joined frame carries exactly the fully-scored
    docs."""
    cc = ccnet_score(docs, model)
    cls = quality_classify(docs, spec="stub").select(
        "doc_id", F.col("score_e6").alias("cls_score_e6"), "label"
    )
    return cc.join(cls, "doc_id")


def quality_stream_init(docs: DataFrame, root: str) -> None:
    """Train the CCNet model on the initial corpus, freeze it, and score
    the corpus under it."""
    model = ccnet_model(docs)
    for name, df in zip(_MODEL_PARTS, model):
        df.write.mode("overwrite").parquet(f"{root}/_model/{name}")
    _score(docs, model).write.mode("overwrite").parquet(f"{root}/scores")


def _read_model(spark: SparkSession, root: str):
    return tuple(
        spark.read.parquet(f"{root}/_model/{name}") for name in _MODEL_PARTS
    )


def make_quality_batch_processor(root: str) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body: score the batch's documents against the
    FROZEN model and write them as a batch_id delta partition."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bid = int(batch_id)
        out = _score(batch_df, _read_model(spark, root)).withColumn(
            "batch_id", F.lit(bid).cast("long")
        )
        tables.clear_partitions(spark, f"{root}/delta", "batch_id", [bid])
        tables.overwrite_partitions(out, f"{root}/delta", ["batch_id"])

    return process_batch


def quality_scores_merged(spark: SparkSession, root: str) -> DataFrame:
    """Base ∪ delta scores — equals one-shot scoring of the union corpus
    under the frozen model (scoring is per-doc pure given the model)."""
    cols = ["doc_id", "lang", "fluency_e6", "bucket", "cls_score_e6", "label"]
    base = spark.read.parquet(f"{root}/scores").select(*cols)
    delta = _read_delta(spark, f"{root}/delta")
    if delta is not None:
        base = base.unionByName(delta.select(*cols))
    return base


def quality_compact(spark: SparkSession, root: str) -> None:
    """Fold delta scores into the base table and clear them (parquet-backend
    non-atomicity caveat as in streaming/fts.fts_compact)."""
    delta = _read_delta(spark, f"{root}/delta")
    if delta is None:
        return
    cols = ["doc_id", "lang", "fluency_e6", "bucket", "cls_score_e6", "label"]
    merged = (
        spark.read.parquet(f"{root}/scores")
        .select(*cols)
        .unionByName(delta.select(*cols))
    )
    tmp = f"{root}/scores__compact"
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(f"{root}/scores")
    shutil.move(tmp, f"{root}/scores")
    shutil.rmtree(f"{root}/delta", ignore_errors=True)
    spark.catalog.refreshByPath(root)
