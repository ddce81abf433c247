"""Physical-plan shape assertions for scale-sensitive operators.

These tests pin the PLAN, not just the rows: a correct-but-single-task
plan at gate scale is a scale-killer at 10^12 docs (round-3 verdict
What's-wrong #2 — paginate's global no-partition-key window)."""

import os
import pathlib

from pyspark.sql import functions as F

from pdf_extraction_and_query_spark.operators.search import paginate_documents
from pdf_extraction_and_query_spark.operators.util import fan_out


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").cast("string").alias("doc_id"),
        (F.col("id") * 37 % 997).cast("long").alias("n_chars"),
    )


def test_paginate_is_take_ordered(spark):
    got = paginate_documents(_docs(spark), limit=10, offset=5)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    # the full-table sort shape this replaces must NOT reappear
    assert "Sort [n_chars" not in plan or "TakeOrderedAndProject" in plan


def test_paginate_rows_match_window_slice(spark):
    """The TakeOrderedAndProject shape returns exactly the rows of the
    ORDER BY ... LIMIT 10 OFFSET 5 contract."""
    rows = paginate_documents(_docs(spark), limit=10, offset=5).collect()
    expected = sorted(
        [(str(i), i * 37 % 997) for i in range(200)], key=lambda t: (-t[1], t[0])
    )[5:15]
    got = sorted([(r.doc_id, r.n_chars) for r in rows], key=lambda t: (-t[1], t[0]))
    assert got == expected
    assert sorted(r.rn for r in rows) == list(range(6, 16))


def test_fan_out_noop_when_scan_cost_sufficient(spark, tmp_path):
    """When file-planning cost already guarantees >= target partitions the
    input frame is returned IDENTICALLY (no repartition node)."""
    p = str(tmp_path / "docs.parquet")
    _docs(spark).write.parquet(p)
    docs = spark.read.parquet(p)
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # openCostInBytes (4m default) dominates the tiny file: cost >= 4m
        # >= target * 1m -> the guard must not fire
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
        assert fan_out(docs, target=2) is docs
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    # default 32m split: a 2-partition guarantee needs 64m of cost -> fires
    assert fan_out(docs, target=16) is not docs


def test_fan_out_repartitions_small_scan(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    _docs(spark).coalesce(1).write.parquet(p)
    docs = spark.read.parquet(p)
    out = fan_out(docs, target=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange RoundRobinPartitioning(16)" in plan, plan
    # row-preserving
    assert out.count() == 200


def test_no_rdd_conversion_in_package():
    """Planning-overhead guard (round-3 verdict Next #8): no operator may
    force a DataFrame->RDD conversion; test code is exempt."""
    pkg = pathlib.Path(__file__).resolve().parents[1] / "pdf_extraction_and_query_spark"
    offenders = []
    for py in pkg.rglob("*.py"):
        src = py.read_text()
        if ".rdd" in src:
            offenders.append(str(py.relative_to(pkg)))
    assert offenders == [], offenders


def test_html_extract_is_single_narrow_pass(spark, tmp_path):
    """HTML main-content extraction must stay one Arrow stage over the
    source scan. The ONLY admissible exchange is the conditional balanced
    fan-out (round-robin of raw pages when the scan is under-split for a
    python-amplified stage — PLANS.md #21); a keyed/hash shuffle here
    would mean the 10^12-doc parse pays data movement it never needs."""
    from pdf_extraction_and_query_spark.operators.htmlextract import (
        html_extract,
        html_extract_report,
    )

    p = str(tmp_path / "pages.parquet")
    _docs(spark).select(
        "doc_id",
        F.concat(F.lit("<p>body text for "), F.col("doc_id"), F.lit("</p>")).alias(
            "html"
        ),
    ).write.parquet(p)
    pages = spark.read.parquet(p)
    for op in (html_extract, html_extract_report):
        plan = op(pages)._jdf.queryExecution().executedPlan().toString()
        n_exchange = plan.count("Exchange")
        n_rr = plan.count("Exchange RoundRobinPartitioning")
        assert n_exchange == n_rr <= 1, plan  # fan-out only, never keyed
        assert "MapInPandas" in plan, plan


def test_crawl_rollups_have_single_keyed_exchange(spark, tmp_path):
    """crawl_keep_latest / link_in_degree are ONE hash aggregation over
    the parse pass: exactly one keyed exchange (on canonical / href), with
    a partial_ aggregate BELOW it (map-side combine — the exchange carries
    summaries, never pages), plus at most the admissible round-robin
    fan-out of raw pages."""
    from pdf_extraction_and_query_spark.operators.htmlextract import (
        crawl_corpus,
        crawl_keep_latest,
        html_extract_report,
        link_in_degree,
    )

    p = str(tmp_path / "pages.parquet")
    _docs(spark).select(
        "doc_id",
        F.concat(
            F.lit('<link rel="canonical" href="u"><p>body <a href="/x">x</a> for '),
            F.col("doc_id"),
            F.lit("</p>"),
        ).alias("html"),
    ).write.parquet(p)
    pages = spark.read.parquet(p)
    rep = html_extract_report(pages).withColumn(
        "fetched_at_ts", F.col("doc_id").cast("long")
    )
    for df, key in ((crawl_keep_latest(rep), "canonical"),
                    (crawl_corpus(rep), "canonical"),
                    (link_in_degree(pages), "href")):
        plan = df._jdf.queryExecution().executedPlan().toString()
        keyed = plan.count("Exchange hashpartitioning")
        rr = plan.count("Exchange RoundRobinPartitioning")
        assert keyed == 1 and plan.count("Exchange") == keyed + rr, plan
        assert f"Exchange hashpartitioning({key}" in plan, plan
        assert "partial_" in plan.split("Exchange hashpartitioning")[1], plan


def test_anchor_text_agg_is_two_level_hash_agg(spark, tmp_path):
    """anchor_text_agg: (href, anchor_text) partial counts, then the
    per-href rollup — exactly two keyed exchanges, each with a partial_
    aggregate below it (map-side combine on both levels: a skewed target
    splits across its distinct texts before the rollup sees one summary
    row per text), never a window over raw anchors."""
    from pdf_extraction_and_query_spark.operators.htmlextract import (
        anchor_text_agg,
    )

    p = str(tmp_path / "pages.parquet")
    _docs(spark).select(
        "doc_id",
        F.concat(
            F.lit('<p>body <a href="/x">x</a> long prose text for '),
            F.col("doc_id"),
            F.lit("</p>"),
        ).alias("html"),
    ).write.parquet(p)
    df = anchor_text_agg(spark.read.parquet(p))
    plan = df._jdf.queryExecution().executedPlan().toString()
    keyed = plan.count("Exchange hashpartitioning")
    rr = plan.count("Exchange RoundRobinPartitioning")
    assert keyed == 2 and plan.count("Exchange") == keyed + rr, plan
    assert "Exchange hashpartitioning(href" in plan, plan
    assert plan.count("partial_") >= 2, plan
    assert "Window" not in plan, plan


def test_html_registry_chain_has_single_roundrobin_exchange(spark):
    """Composed corpus-lift -> parse path: the corpus lift balances the
    RAW text before generation, so the operators' balance guard must
    detect the existing repartition and NOT shuffle the generated pages a
    second time (review finding): exactly one round-robin exchange, zero
    keyed exchanges, in the whole chain."""
    from pdf_extraction_and_query_spark.operators.htmlextract import html_extract
    from pdf_extraction_and_query_spark.sources.htmlcorpus import (
        html_table_from_documents,
    )

    df = html_extract(html_table_from_documents(spark, "/root/testdata/sf0.001"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == plan.count(
        "Exchange RoundRobinPartitioning"
    ) == 1, plan


def test_pad_efficiency_single_exchange(spark):
    """pad_efficiency is one map-side-combined hash agg on a ~|buckets|
    key: exactly ONE shuffle exchange, no window, no join."""
    from pdf_extraction_and_query_spark.operators.packing import pad_efficiency

    d = spark.range(500).select(
        F.col("id").cast("long").alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.lit("w"), (F.col("id") % 90 + 5).cast("int"))).alias("text"),
    )
    plan = pad_efficiency(d)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" not in plan and "Join" not in plan, plan
    assert "partial" in plan.lower() or "HashAggregate" in plan, plan


def test_unimax_window_runs_over_language_aggregate_only(spark):
    """unimax_alloc's only window runs AFTER the per-language aggregate
    (bounded frame) — the corpus side contributes exactly one hash-agg
    exchange before it."""
    from pdf_extraction_and_query_spark.operators.packing import unimax_alloc

    d = spark.range(500).select(
        F.col("id").cast("long").alias("doc_id"),
        F.lit("a b c d e").alias("text"),
        F.concat(F.lit("l"), (F.col("id") % 5).cast("string")).alias("lang"),
    )
    plan = unimax_alloc(d)._jdf.queryExecution().executedPlan().toString()
    # final select consumes the checkpointed ranked frame + the 1-row
    # broadcast: the window exchange (singlepartition over L rows) must
    # sit above a hash aggregate, and the only joins are broadcasts
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_mrl_recall_single_scoring_join(spark, tmp_path):
    """mrl_recall computes every prefix dim from ONE broadcast scoring
    join (never |dims| corpus passes): exactly one scan of the
    embeddings source feeds the scored frame."""
    import numpy as np
    from pdf_extraction_and_query_spark.operators.search import mrl_recall

    p = str(tmp_path / "emb.parquet")
    rng = np.random.default_rng(7)
    import pandas as pd
    pdf = pd.DataFrame({
        "vec_id": range(50),
        "embedding": [rng.normal(size=64).astype("float64").tolist() for _ in range(50)],
    })
    spark.createDataFrame(pdf).write.parquet(p)
    emb = spark.read.parquet(p)
    df = mrl_recall(emb)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the ranked frame is checkpointed, so the executed plan sees the
    # tiny scan + one broadcast join for the overlap — no second
    # corpus-scoring subtree
    assert plan.count("BroadcastHashJoin") == 1, plan
    rows = df.collect()
    assert len(rows) == 5 * 4


def test_exact_sample_is_take_ordered(spark):
    """exact_sample must be TakeOrderedAndProject (per-partition bottom-k
    + driver merge), never a global sort — the paginate lesson."""
    from pdf_extraction_and_query_spark.operators.packing import exact_sample

    d = spark.range(500).select(
        F.col("id").cast("long").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.lit("w x y z").alias("text"),
    )
    df = exact_sample(d, k=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    rows = df.collect()
    assert len(rows) == 20
    assert [r.rank for r in sorted(rows, key=lambda r: (r.sample_key, r.doc_id))] == list(range(1, 21))


def _formatted(df):
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_curate_v2_shares_one_tokenized_projection(spark):
    """Round-4 verdict Next #3: the four word-keyed signal families of
    curate_corpus_v2 feed from ONE localCheckpointed (doc_id, lang, text,
    words) projection; only dup_passage_stats (shingle-keyed) retains a
    source scan.  'formatted' explain lists each scan node twice (tree +
    detail), so <= 2 occurrences == <= 1 in-plan source scan."""
    from pdf_extraction_and_query_spark.operators.packing import (
        curate_corpus_v2,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _formatted(curate_corpus_v2(docs))
    assert plan.count("Scan parquet") <= 2, plan[:2000]
    # the shared projection surfaces as RDD scans of the checkpoint
    assert "Scan ExistingRDD" in plan


def test_dup_passages_single_stream_single_gram_exchange(spark):
    """The df>=2 evidence is two Window ops over ONE gram exchange of one
    shingle stream (dense_rank + max-rank == count_distinct), not a
    groupBy+self-join that plans the stream twice (PLANS.md #44)."""
    from pdf_extraction_and_query_spark.operators.repetition import (
        dup_passage_stats,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _formatted(dup_passage_stats(docs))
    assert plan.count("Scan parquet") <= 2  # one scan, listed twice
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    # exactly one gram-keyed exchange feeds both windows
    assert plan.count("hashpartitioning(gram") <= 2, plan[:2000]


def test_pagerank_plan_depth_constant_in_rounds(spark):
    """Round-4 verdict Next #7: per-round localCheckpoint keeps the
    iterative plan O(1) deep — the FINAL plan of a 6-round run is the
    same shape (same exchange count, same checkpoint-scan count) as a
    2-round run, instead of growing linearly."""
    from pdf_extraction_and_query_spark.operators import graphrank as G

    edges = (
        spark.createDataFrame(
            [(f"u{i % 7}", f"u{(i * 3 + 1) % 7}", 1 + i % 3) for i in range(30)],
            "src string, dst string, n long",
        )
        .groupBy("src", "dst")
        .agg(F.sum("n").alias("n"))
    )
    shapes = []
    for iters in (2, 6):
        plan = _formatted(G.pagerank(edges, iters=iters))
        shapes.append(
            (plan.count("Exchange"), plan.count("Scan ExistingRDD"))
        )
        assert "Scan parquet" not in plan  # rounds read checkpoints only
    assert shapes[0] == shapes[1], shapes


def test_kcenter_every_job_is_single_stage(spark):
    """kcenter_coreset's k rounds are each ONE narrow Arrow pass +
    TakeOrdered(1): every Spark job in the traversal is a single stage
    (a second stage would mean a shuffle crept in), and the job count is
    k+1 (ev checkpoint + seed + k-1 picks)."""
    from pdf_extraction_and_query_spark import contract as C
    from pdf_extraction_and_query_spark.operators.kmeans import (
        kcenter_coreset,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sc = spark.sparkContext
    sc.setJobGroup("kc-shape", "kcenter plan-shape pin")
    try:
        out = kcenter_coreset(emb, k=C.KC_K)
    finally:
        sc.setJobGroup("kc-shape-done", "")
    tr = sc.statusTracker()
    jids = tr.getJobIdsForGroup("kc-shape")
    assert len(jids) == C.KC_K + 1, jids
    stages = [len(tr.getJobInfo(j).stageIds) for j in jids]
    assert all(s == 1 for s in stages), stages
    assert len(out.collect()) == C.KC_K


def test_crawl_corpus_single_keyed_exchange(spark):
    """crawl_corpus = keep-latest + gate in ONE hash aggregation: exactly
    one canonical-keyed exchange past the narrow extraction (whose
    fan_out RoundRobin is the only other exchange), no join back to the
    pages."""
    from pdf_extraction_and_query_spark.plans import registry as R

    plan = _formatted(
        R.QUERIES["crawl_corpus"](spark, "/root/testdata/sf0.001")
    )
    import re

    assert len(re.findall(r"hashpartitioning\(", plan)) == 1, plan[:1500]
    assert plan.count("RoundRobinPartitioning") <= 1
    assert "Join" not in plan
