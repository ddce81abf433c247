"""Corpus-curation operator contracts: contamination_check (eval split
excluded, zero-shingle docs kept, eval side broadcast), vocab_topk
(deterministic tie-break), redact_pii (counts + tokens)."""

from pyspark.sql import functions as F

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators.dedup import contamination_check
from pdf_extraction_and_query_spark.operators.textstats import (
    redact_pii,
    vocab_topk,
)


def test_contamination_split_zero_shingles_and_broadcast(spark):
    eval_id = C.EVAL_RESIDUE  # in the eval split
    docs = spark.createDataFrame(
        [
            (eval_id, "one two three four five"),  # eval doc
            (1, "one two three four five"),        # fully contaminated train doc
            (2, "alpha beta gamma delta epsilon"), # clean train doc
            (3, "xy"),                             # zero shingles (< SHINGLE_N words)
        ],
        "doc_id long, text string",
    )
    out = contamination_check(docs)
    rows = {r["doc_id"]: r for r in out.collect()}

    assert eval_id not in rows, "eval docs must not appear in the report"
    assert set(rows) == {1, 2, 3}
    assert rows[1]["overlap_micro"] == 1_000_000 and rows[1]["contaminated"]
    assert rows[2]["n_overlap"] == 0 and not rows[2]["contaminated"]
    assert rows[3]["n_shingles"] == 0 and rows[3]["overlap_micro"] == 0

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, "eval shingle set must broadcast"


def test_vocab_topk_order_and_ties(spark):
    docs = spark.createDataFrame(
        [(0, "b b a a c"), (1, "a b  C")],
        "doc_id long, text string",
    )
    got = [(r["token"], r["n_tokens"], r["n_docs"]) for r in vocab_topk(docs, k=3).collect()]
    # a:3, b:3 tie -> lexical; c:2 docs count case-folded
    assert got == [("a", 3, 2), ("b", 3, 2), ("c", 2, 2)]


def test_redact_pii_counts_and_tokens(spark):
    docs = spark.createDataFrame([(7, "plain body")], "doc_id long, text string")
    r = redact_pii(docs).first()
    assert r["n_emails"] == 1 and r["n_urls"] == 1
    assert C.PII_EMAIL_TOKEN in r["redacted"] and C.PII_URL_TOKEN in r["redacted"]
    assert "@" not in r["redacted"] and "https://" not in r["redacted"]
    assert r["redacted"].startswith("plain body")


def test_curation_funnel_agrees_with_standalone_operators(spark):
    """The funnel is a summary of curate_corpus + dataset_split — its
    stage counts must equal counting the operators' own outputs."""
    import duckdb
    from pdf_extraction_and_query_spark.operators.packing import (
        curate_corpus,
        curation_funnel,
        dataset_split,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    f = curation_funnel(docs).collect()[0]
    kept = curate_corpus(docs)
    assert f["n_kept"] == kept.count()
    assert f["n_docs"] == docs.count()
    assert f["n_train"] + f["n_val"] + f["n_test"] == f["n_kept"]
    assert f["n_docs"] >= f["n_quality"] >= f["n_sampled"] >= f["n_kept"] > 0
    kept_ids = [r["doc_id"] for r in kept.select("doc_id").collect()]
    splits = {
        r["split"]: r["n"]
        for r in dataset_split(docs.where(F.col("doc_id").isin(kept_ids)))
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert f["n_train"] == splits.get("train", 0)
    assert f["n_val"] == splits.get("val", 0)
    assert f["n_test"] == splits.get("test", 0)
