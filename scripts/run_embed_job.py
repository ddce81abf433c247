"""spark-submit entry for the embed -> search pipeline through the
pluggable embedder seam (operators/embedder.py).

Deployment twin of scripts/run_extract_job.py: shipped to a bare cluster
via --py-files, model selected by ``SPARK_GRAFT_EMBEDDER`` (a
``module:factory`` importable on every executor — the module itself rides
along in --py-files; any weight files it loads are plain executor-local
paths, exported to workers via ``spark.executorEnv.*``).  Mirrors the
reference's embed-then-search flow (src/embeddings/
sentence_transformer_embedder.py feeding src/vector_store/
pgvector_client.py) as one Spark plan: embed (narrow Arrow pass) ->
exact top-k (TakeOrderedAndProject).

Writes BOTH surfaces so the caller can audit end-to-end:
  <output>/embeddings  (doc_id, embedding)  — what the model produced
  <output>/topk        (vec_id, rank, dot_e12) — what search returned
Prints one JSON line for the orchestrator (the run_extract_job contract).
"""

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet")
    ap.add_argument("--output", required=True, help="output root")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--query-doc-id", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("embed-search-job").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from pdf_extraction_and_query_spark.operators.embedder import (
        embed_documents,
    )
    from pdf_extraction_and_query_spark.operators.search import vector_topk

    docs = spark.read.parquet(args.input)
    emb = embed_documents(docs)
    emb.write.mode("overwrite").parquet(f"{args.output}/embeddings")

    # search runs over the WRITTEN table — the production split (index
    # built once, queried many times), and it decouples the top-k scan
    # from the embed pass
    stored = spark.read.parquet(f"{args.output}/embeddings").select(
        F.col("doc_id").cast("long").alias("vec_id"), "embedding"
    )
    topk = vector_topk(stored, k=args.k, query_vec_id=args.query_doc_id)
    topk.write.mode("overwrite").parquet(f"{args.output}/topk")

    rows = [r.asDict() for r in topk.collect()]
    print(
        json.dumps(
            {
                "n_docs": docs.count(),
                "k": len(rows),
                "top": [
                    {"vec_id": r["vec_id"], "dot_e12": r["dot_e12"]}
                    for r in sorted(rows, key=lambda r: r["rank"])
                ],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
