"""CCNet-style perplexity bucketing unit contract (operators/textstats.py:
ccnet_buckets) — hand-computed per-language thirds, tie semantics (ties
share a bucket), per-language model isolation, and the <2-token drop rule.
Cross-engine values pinned by the ccnet_buckets / ccnet_bucket_stats
oracle pairs."""

import pytest

from pdf_extraction_and_query_spark.operators.textstats import (
    ccnet_bucket_stats,
    ccnet_buckets,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # en: distinct fluency values 666_666 / 499_999 / 333_333 / 1_000_000
        (0, "a a a a", "en"),
        (1, "a a b", "en"),
        (2, "a b", "en"),
        (3, "b c", "en"),
        # fr: all tied at 1_000_000 — ties share the head bucket
        (10, "x y", "fr"),
        (11, "x y", "fr"),
        (12, "x y", "fr"),
        # de: single token — no transitions, no row
        (20, "z", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_hand_computed_thirds(docs):
    out = {r.doc_id: r for r in ccnet_buckets(docs).collect()}
    # en model: c2 (a,a)=4 (a,b)=2 (b,c)=1; c1 a=6 b=1
    # P(a,a)=666_666  P(a,b)=333_333  P(b,c)=1_000_000
    assert (out[0].fluency_e6, out[0].bucket) == (666_666, "head")
    assert (out[1].fluency_e6, out[1].bucket) == (499_999, "middle")
    assert (out[2].fluency_e6, out[2].bucket) == (333_333, "tail")
    assert (out[3].fluency_e6, out[3].bucket) == (1_000_000, "head")
    # fr: every doc ties at the cutoffs -> all head
    assert [out[i].bucket for i in (10, 11, 12)] == ["head"] * 3
    # the fr model never saw en transitions (per-language training)
    assert all(out[i].fluency_e6 == 1_000_000 for i in (10, 11, 12))
    assert 20 not in out and len(out) == 7


def test_bucket_stats_rollup(docs):
    out = {
        (r.lang, r.bucket): (r.n_docs, r.min_fluency_e6, r.max_fluency_e6)
        for r in ccnet_bucket_stats(docs).collect()
    }
    assert out[("en", "head")] == (2, 666_666, 1_000_000)
    assert out[("en", "middle")] == (1, 499_999, 499_999)
    assert out[("en", "tail")] == (1, 333_333, 333_333)
    assert out[("fr", "head")] == (3, 1_000_000, 1_000_000)
    assert ("de", "head") not in out and len(out) == 4
