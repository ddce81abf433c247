"""IVF prebuilt index: build-once/search-many split. The scale claim under
test is PARTITION PRUNING — the probed clusters must become PartitionFilters
on the index scan so the non-probed (1 - n_probe/n_lists) of the corpus is
never read — plus exact result equality with the inline ivf_topk."""

from pyspark.sql import functions as F

from pdf_extraction_and_query_spark.operators.search import (
    ivf_build,
    ivf_topk,
    ivf_topk_prebuilt,
)

SF = "/root/testdata/sf0.001"


def test_prebuilt_matches_inline_and_prunes_partitions(spark, tmp_path_factory):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    index_path = str(tmp_path_factory.mktemp("ivf") / "index")

    ivf_build(emb, index_path)
    got = ivf_topk_prebuilt(spark, emb, index_path)
    want = ivf_topk(emb)

    assert [r.asDict() for r in got.collect()] == [r.asDict() for r in want.collect()]

    # the probed-cluster predicate must reach the scan as a PartitionFilter
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "cent_id" in pf, plan


def test_rebuild_is_idempotent(spark, tmp_path_factory):
    """overwrite_partitions keyed by cent_id: a rebuild replaces, never
    duplicates."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    index_path = str(tmp_path_factory.mktemp("ivf") / "index")
    ivf_build(emb, index_path)
    n1 = spark.read.parquet(index_path).count()
    ivf_build(emb, index_path)
    assert spark.read.parquet(index_path).count() == n1 == emb.count()
    # every vector in exactly one cluster
    dup = (
        spark.read.parquet(index_path)
        .groupBy("vec_id")
        .agg(F.count("*").alias("n"))
        .where("n > 1")
        .count()
    )
    assert dup == 0
