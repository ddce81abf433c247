"""Repetition-metric + duplicated-passage operator contracts: hand-computed
Gopher fractions, top-gram tie-break, the fraction cap, passage interval
merging (overlap + adjacency), and the cross-doc df>=2 evidence rule."""

from pyspark.sql import functions as F

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators.repetition import (
    dup_passage_stats,
    dup_passages,
    repetition_metrics,
)


def _metrics(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = repetition_metrics(docs).collect()
    return {(r.doc_id, r.n): r for r in out}


def test_repetition_hand_computed(spark):
    # doc 0: "a b a b c" -> joined "a b a b c", denom 9
    #  n=2 grams: "a b"(2) "b a"(1) "b c"(1): top = a b (cnt 2, 3 chars)
    #   top_frac = 1e6*2*3 // 9 = 666666; dup = same gram only -> 666666
    m = _metrics(spark, [(0, "a b a b c")])
    r2 = m[(0, 2)]
    assert (r2.top_cnt, r2.top_frac_e6, r2.dup_frac_e6) == (2, 666666, 666666)
    # n=3: "a b a"(1) "b a b"(1) "a b c"? no -> "b a b", "a b c"? grams are
    # positions 1..3: "a b a", "b a b", "a b c"? position 3 = "a b c" (words
    # 3,4,5 = a b c). All distinct -> top_cnt 1, tie-break lexical smallest
    # "a b a" (5 chars): 1e6*5//9 = 555555; dup 0
    r3 = m[(0, 3)]
    assert (r3.top_cnt, r3.top_frac_e6, r3.dup_frac_e6) == (1, 555555, 0)
    # doc shorter than n emits no row for that n
    assert (0, 8) not in m


def test_repetition_cap_binds(spark):
    # "x x x x x x" (6 words, denom 11): 2-gram "x x" cnt 5, chars 3
    # raw top = 1e6*5*3//11 = 1363636 -> capped at 1e6; dup likewise
    m = _metrics(spark, [(1, "x x x x x x")])
    r = m[(1, 2)]
    assert (r.top_cnt, r.top_frac_e6, r.dup_frac_e6) == (5, 1_000_000, 1_000_000)


def test_top_gram_tiebreak_lexical(spark):
    # "b a b a": 2-grams "b a"(2)? positions: "b a","a b","b a" -> "b a" cnt 2
    # vs "a b" cnt 1 -> top by count. Now force a tie: "a b c a b c" has
    # no... use "p q p q" vs "q p q p" style: doc "z y z y" grams
    # "z y","y z","z y": counts z y=2, y z=1. For a TRUE tie use 4 distinct
    # words: "a b c d": all 2-grams cnt 1 -> lexical smallest "a b" wins.
    m = _metrics(spark, [(2, "a b c d")])
    r = m[(2, 2)]
    # denom 7, top gram "a b" (3 chars): 1e6*1*3//7 = 428571
    assert (r.top_cnt, r.top_frac_e6) == (1, 428571)


def _passage_fixture(spark):
    # k=3 shingles. docs 0 and 1 share the run "one two three four" (two
    # overlapping duplicated shingles -> ONE merged passage); doc 2 is
    # unrelated filler with no cross-doc shingle.
    rows = [
        (0, "one two three four alpha beta gamma delta"),
        (1, "pre one two three four post tail words"),
        (2, "completely different filler text with unique words"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dup_passages_merge_and_evidence(spark):
    docs = _passage_fixture(spark)
    out = dup_passages(docs, k=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 0: shingles "one two three"@1 and "two three four"@2 duplicated ->
    # merged interval words 1..4
    assert [(r.start_word, r.end_word, r.n_words, r.n_shingles) for r in by_doc[0]] == [
        (1, 4, 4, 2)
    ]
    # doc 1: same shingles at starts 2,3 -> words 2..5
    assert [(r.start_word, r.end_word, r.n_words, r.n_shingles) for r in by_doc[1]] == [
        (2, 5, 4, 2)
    ]
    # doc 2: no duplicated shingle -> no rows
    assert 2 not in by_doc


def test_dup_passages_split_on_gap(spark):
    # two docs sharing two runs separated by doc-unique middles -> TWO
    # passages each, passage_seq in reading order
    rows = [
        (0, "s1 s2 s3 mid0a mid0b mid0c t1 t2 t3"),
        (1, "s1 s2 s3 mid1a mid1b mid1c t1 t2 t3"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dup_passages(docs, k=3).collect()
    d0 = sorted([r for r in out if r.doc_id == 0], key=lambda r: r.passage_seq)
    assert [(r.passage_seq, r.start_word, r.end_word) for r in d0] == [
        (1, 1, 3),
        (2, 7, 9),
    ]


def test_dup_passage_stats_coverage(spark):
    docs = _passage_fixture(spark)
    out = {r.doc_id: r for r in dup_passage_stats(docs, k=3).collect()}
    # doc 0: 4 dup words of 8 total -> 500000
    assert (out[0].n_passages, out[0].dup_words, out[0].total_words) == (1, 4, 8)
    assert out[0].coverage_e6 == 500_000
    assert (out[1].dup_words, out[1].total_words, out[1].coverage_e6) == (4, 8, 500_000)
    assert 2 not in out


def test_contract_values_sane():
    assert C.DUP_PASSAGE_K >= 2
    assert all(n >= 2 for n in C.REP_NS)


def test_lm_fluency_hand_computed(spark):
    from pdf_extraction_and_query_spark.operators.textstats import lm_fluency

    rows = [(0, "a b a b"), (1, "a b c"), (2, "z")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in lm_fluency(docs).collect()}
    # c2: (a,b)=3 (b,a)=1 (b,c)=1; c1: a=3, b=2
    # P(a,b)=1e6; P(b,a)=P(b,c)=5e5
    assert (out[0].n_bigrams, out[0].fluency_e6) == (3, 833_333)  # (1e6+5e5+1e6)//3
    assert (out[1].n_bigrams, out[1].fluency_e6) == (2, 750_000)
    assert 2 not in out  # single-token doc has no transitions
