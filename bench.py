#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <sec>, "unit": "sec", "queries": {name: sec},
   "sf": ..., ...extras}

Methodology (round 3): every measured query gets ONE full warmup pass
(python-worker spawn + whole-stage codegen + page-cache fill happen there)
followed by $SPARK_GRAFT_BENCH_REPS (default 3) timed passes; the reported
number is the BEST of the timed passes.  Round 2 measured single-shot and
recorded a uniform ~15-20% drift across untouched pure-SQL queries vs
round 1 — shared-VM neighbor noise, which best-of-N suppresses (the same
methodology scripts/scaling_bench.py already uses).

Headline = the staged span-extraction pipeline (derive interleaved span
corpus from documents.parquet -> explode/boilerplate/reconstruct/chunk/
interleave). Extras report docs/sec and the fused-mode comparison; the
N-vs-4N scaling-efficiency evidence lives in scripts/scaling_bench.py
(results recorded in BASELINE.md / BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


_MEDIANS: dict[str, float] = {}


def bench(fn, reps: int | None = None, name: str | None = None) -> tuple[float, int]:
    """Warmup pass + reps (default $SPARK_GRAFT_BENCH_REPS) timed passes;
    returns (best_sec, rows).  The per-query MEDIAN is also recorded (the
    best-vs-median spread is the VM-noise indicator — see BENCH.md round-3
    environment note; a wide spread means the box, not the plan)."""
    rows = fn()  # warmup: full pass, not limit() — see PLANS.md / memory trap 5
    times = []
    for _ in range(reps or REPS):
        t0 = time.monotonic()
        rows = fn()
        times.append(time.monotonic() - t0)
    times.sort()
    if name:
        _MEDIANS[name] = round(times[len(times) // 2], 3)
    return times[0], rows


def main() -> None:
    from pdf_extraction_and_query_spark.sources.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    from pdf_extraction_and_query_spark.plans.extract import extract_spans
    from pdf_extraction_and_query_spark.plans.registry import QUERIES
    from pdf_extraction_and_query_spark.sources.corpus import (
        spans_table_from_documents,
    )

    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()

    # materialize the derived span corpus ONCE per pass (at real scale the
    # input IS a table; deriving it inline would be recomputed by every DAG
    # consumer).  Each rep writes a fresh directory so the write is real.
    tmp_root = tempfile.mkdtemp()
    paths: list[str] = []

    def derive() -> int:
        path = f"{tmp_root}/spans_{len(paths)}.parquet"
        spans_table_from_documents(spark, SF_DIR).write.parquet(path)
        paths.append(path)
        return 0

    derive_sec, _ = bench(derive, name="derive_spans")
    spans = spark.read.parquet(paths[-1])

    hybrid_sec, hybrid_rows = bench(lambda: extract_spans(spans, mode="hybrid").count(), name="extract_hybrid")
    staged_sec, staged_rows = bench(lambda: extract_spans(spans, mode="staged").count(), name="extract_staged")
    fused_sec, fused_rows = bench(lambda: extract_spans(spans, mode="fused").count(), name="extract_fused")

    query_times: dict[str, float] = {
        "derive_spans": round(derive_sec, 3),
        "extract_hybrid": round(hybrid_sec, 3),
        "extract_staged": round(staged_sec, 3),
        "extract_fused": round(fused_sec, 3),
    }

    # the skewed synthetic span corpus (1-page memos .. 400-page reports —
    # the north-rule workload; see BENCH.md for the full scaling study)
    synth_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data", "bench_synth_25600.parquet"
    )
    if not os.path.exists(synth_path):
        from pdf_extraction_and_query_spark.sources.corpus import synth_docs_df

        synth_docs_df(spark, 25600, seed=42).write.parquet(synth_path)
    synth = spark.read.parquet(synth_path)
    n_synth = synth.count()
    # the north-rule headline workload gets extra reps: this VM's noise
    # floor is wider than the 4-5 s the pass takes (round-3 probes measured
    # the identical call at 3.9-5.4 s minutes apart on a quiet box)
    synth_sec, synth_rows = bench(
        lambda: extract_spans(synth, mode="hybrid").count(), reps=max(REPS, 5), name="extract_hybrid_synth_skewed"
    )
    query_times["extract_hybrid_synth_skewed"] = round(synth_sec, 3)
    for name in (
        "clean_text",
        "token_counts",
        "text_quality",
        "lang_id",
        "fingerprint",
        "exact_dedup",
        "ngram_jaccard",
        "minhash_lsh_pairs",
        "dedup_clusters",
        "simhash",
        "shard_pack",
        "pack_sequences",
        "stratified_sample",
        "curate_corpus_full",
        "lm_fluency",
        "embedding_near_pairs_lsh",
        "stub_embed",
        "repetition_metrics",
        "dup_passage_stats",
        "bm25_topk_multi",
        "hybrid_rrf",
        "vector_topk",
        "vector_topk_multi",
        "pq_topk",
        "pq_recall",
        "ivfpq_topk",
        "topk_enriched",
        "similarity_buckets",
        "search_response",
        "eval_by_category",
        "doc_stats",
        "events_rollup",
        "boilerplate_flags",
        "doc_meta",
        "page_text_map",
        "doc_listing",
        "chunk_invariants",
    ):
        sec, _ = bench(lambda n=name: QUERIES[n](spark, SF_DIR).count(), name=name)
        query_times[name] = round(sec, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    print(
        json.dumps(
            {
                "metric": "span-extraction wall time (derive corpus + hybrid extract, span-equality-verified pipeline)",
                "value": round(derive_sec + hybrid_sec, 3),
                "unit": "sec",
                "queries": query_times,
                "sf": sf_val,
                "n_docs": n_docs,
                "docs_per_sec": round(n_docs / (derive_sec + hybrid_sec), 1),
                "docs_per_sec_extract_only": round(n_docs / hybrid_sec, 1),
                "docs_per_sec_fused": round(n_docs / fused_sec, 1),
                "docs_per_sec_staged": round(n_docs / staged_sec, 1),
                "out_rows": hybrid_rows,
                "modes_agree": hybrid_rows == staged_rows == fused_rows,
                "synth_skewed_n_docs": n_synth,
                "synth_skewed_docs_per_sec": round(n_synth / synth_sec, 1),
                "synth_skewed_out_rows": synth_rows,
                "cpus": CPUS,
                "reps": REPS,
                "queries_median": _MEDIANS,
                "methodology": "best-of-%d after 1 full warmup pass per query" % REPS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
