"""Sketch contracts: CMS one-sided error + cell-wise mergeability, HLL
register semantics + per-register-max mergeability, and the fixed-point
estimate's accuracy envelope on the fixture vocabulary."""

from pyspark.sql import functions as F

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators.sketches import (
    cms_heavy_hitters,
    cms_merge,
    cms_sketch,
    hll_merge,
    hll_registers,
    hll_vocab,
)

_A = [(0, "apple banana apple cherry apple"), (1, "banana durian banana")]
_B = [(2, "cherry cherry fig apple"), (3, "grape banana fig fig")]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _cells(df):
    return {(r["row"], r["bucket"]): r["cnt"] for r in df.collect()}


def test_cms_estimate_never_undercounts(spark):
    out = cms_heavy_hitters(_docs(spark, _A + _B), k=100).collect()
    assert out
    for r in out:
        assert r["overcount"] >= 0
        assert r["cms_est"] >= r["exact_cnt"]


def test_cms_exact_when_no_collisions(spark):
    # 6-token vocab into 4x256 cells: with the fixture hash, every token
    # lands alone in at least one row -> estimate == exact for all
    out = cms_heavy_hitters(_docs(spark, _A + _B), k=100).collect()
    assert all(r["overcount"] == 0 for r in out)
    got = {r["token"]: r["exact_cnt"] for r in out}
    assert got["apple"] == 4 and got["fig"] == 3


def test_cms_union_equals_cellwise_merge(spark):
    whole = _cells(cms_sketch(_docs(spark, _A + _B)))
    merged = _cells(
        cms_merge(cms_sketch(_docs(spark, _A)), cms_sketch(_docs(spark, _B)))
    )
    assert whole == merged and whole


def test_hll_union_equals_register_max_merge(spark):
    whole = {
        r["j"]: r["rank"] for r in hll_registers(_docs(spark, _A + _B)).collect()
    }
    merged = {
        r["j"]: r["rank"]
        for r in hll_merge(
            hll_registers(_docs(spark, _A)), hll_registers(_docs(spark, _B))
        ).collect()
    }
    assert whole == merged and whole


def test_hll_rank_bounds_and_occupancy(spark):
    regs = hll_registers(_docs(spark, _A + _B)).collect()
    for r in regs:
        assert 0 <= r["j"] < C.HLL_M
        assert 1 <= r["rank"] <= C.HLL_VBITS + 1
    # 7 distinct tokens -> at most 7 registers hit
    assert 1 <= len(regs) <= 7


def test_hll_fixture_accuracy_envelope(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    row = hll_vocab(docs).collect()[0]
    assert row["m"] == C.HLL_M
    assert row["exact_distinct"] > 0
    # raw HLL on a vocab far below m is biased high (observed +123% on
    # this fixture); the authored-table small-range correction brings it
    # inside a few percent (observed -3.2%).  Pin both behaviors.
    assert row["est_raw"] > row["exact_distinct"]
    assert abs(row["err_e6"]) < 200_000
    assert row["est"] > 0 and row["s"] > 0


def _keys(spark, ks):
    return spark.createDataFrame([(k,) for k in ks], "key string")


def test_bloom_no_false_negatives_and_probe(spark):
    from pdf_extraction_and_query_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    inserted = [f"key{i}" for i in range(50)]
    bloom = bloom_build(_keys(spark, inserted))
    out = {
        r["key"]: r["maybe"]
        for r in bloom_probe(
            bloom, _keys(spark, inserted + ["nope1", "nope2"])
        ).collect()
    }
    # every inserted key MUST report maybe (one-sided error)
    assert all(out[k] for k in inserted)
    # 2 probes into a 65536-bit filter holding 50 keys: fp chance ~1e-9
    assert not out["nope1"] and not out["nope2"]


def test_bloom_union_equals_or_merge(spark):
    from pdf_extraction_and_query_spark.operators.sketches import (
        bloom_build,
        bloom_merge,
    )

    a = [f"a{i}" for i in range(30)]
    b = [f"b{i}" for i in range(30)]
    whole = {
        r["word_idx"]: r["bits"]
        for r in bloom_build(_keys(spark, a + b)).collect()
    }
    merged = {
        r["word_idx"]: r["bits"]
        for r in bloom_merge(
            bloom_build(_keys(spark, a)), bloom_build(_keys(spark, b))
        ).collect()
    }
    assert whole == merged and whole


def test_bloom_contamination_invariants(spark):
    from pdf_extraction_and_query_spark.operators.sketches import (
        bloom_contamination,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = bloom_contamination(docs).collect()
    assert rows
    for r in rows:
        assert r["n_bloom_hits"] >= r["n_exact_hits"]  # no false negatives
        assert r["n_shingles"] >= r["n_bloom_hits"]
        assert r["n_false_pos"] == r["n_bloom_hits"] - r["n_exact_hits"]
