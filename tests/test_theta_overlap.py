"""Theta-sketch source overlap (operators/sketches.py theta_sample /
theta_source_overlap): the keep rule is replayed in pure Python
(hashlib md5) so the pins are engine-independent; mergeability (union =
merge) is asserted the same way the CMS/HLL suites do; pair rows with
zero sampled intersection must still appear.
"""

from __future__ import annotations

import hashlib

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators import sketches as SK

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _kept(token: str) -> bool:
    h = int(hashlib.md5((C.THETA_SALT + token).encode()).hexdigest()[:12], 16)
    return h < C.THETA_BOUND


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, text, "en", src, len(text)) for i, (src, text) in enumerate(rows)],
        SCHEMA,
    )


def test_theta_sample_matches_python_replay(spark):
    toks = [f"tok{i}" for i in range(400)]
    docs = _docs(spark, [("a", " ".join(toks))])
    got = {r["token"] for r in SK.theta_sample(docs).collect()}
    want = {t for t in toks if _kept(t)}
    assert got == want
    # the rate is 1/8: ~50 of 400 expected; guard the fixture is useful
    assert 20 <= len(want) <= 90


def test_theta_sample_merge_is_union(spark):
    ta = [f"tok{i}" for i in range(200)]
    tb = [f"tok{i}" for i in range(100, 300)]
    da = _docs(spark, [("a", " ".join(ta))])
    db = _docs(spark, [("a", " ".join(tb))])
    both = _docs(spark, [("a", " ".join(ta)), ("a", " ".join(tb))])
    sa = {r["token"] for r in SK.theta_sample(da).collect()}
    sb = {r["token"] for r in SK.theta_sample(db).collect()}
    su = {r["token"] for r in SK.theta_sample(both).collect()}
    assert su == sa | sb


def test_theta_overlap_arithmetic_and_zero_pairs(spark):
    # sources a/b share a 100-token block; c is disjoint from both
    shared = [f"tok{i}" for i in range(100)]
    only_a = [f"aa{i}" for i in range(100)]
    only_b = [f"bb{i}" for i in range(100)]
    only_c = [f"cc{i}" for i in range(100)]
    docs = _docs(
        spark,
        [
            ("a", " ".join(shared + only_a)),
            ("b", " ".join(shared + only_b)),
            ("c", " ".join(only_c)),
        ],
    )
    ks = lambda toks: {t for t in toks if _kept(t)}
    n_a = len(ks(shared + only_a))
    n_b = len(ks(shared + only_b))
    n_sh = len(ks(shared))
    rows = {
        (r["src_a"], r["src_b"]): r
        for r in SK.theta_source_overlap(docs).collect()
    }
    assert set(rows) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = rows[("a", "b")]
    assert (ab["n_a_sampled"], ab["n_b_sampled"], ab["n_inter"]) == (
        n_a,
        n_b,
        n_sh,
    )
    assert ab["n_union"] == n_a + n_b - n_sh
    assert ab["jaccard_e6"] == n_sh * 1_000_000 // (n_a + n_b - n_sh)
    assert ab["est_inter"] == n_sh * C.THETA_RATE
    ac = rows[("a", "c")]
    assert (ac["n_inter"], ac["jaccard_e6"], ac["est_inter"]) == (0, 0, 0)

