"""Phrase-search and TF-IDF keyword-extraction contracts: hand-computed
phrase occurrence counts (overlap, repeated-token phrases, adjacency
strictness, absent terms, empty docs) and tfidf ranking/tie-break."""

from pyspark.sql import functions as F

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators.fulltext import (
    fts_phrase_topk,
    tfidf_topk_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _hits(spark, rows, phrase):
    out = fts_phrase_topk(_docs(spark, rows), phrases={0: phrase}, k=100)
    return {r["doc_id"]: r["tf"] for r in out.collect()}


def test_phrase_basic_adjacency(spark):
    rows = [
        (1, "alpha beta gamma"),   # hit at pos 0
        (2, "alpha gamma beta"),   # alpha and beta present but not adjacent
        (3, "x alpha beta alpha beta y"),  # two hits
        (4, ""),                   # empty doc: no tokens, no crash
    ]
    assert _hits(spark, rows, ("alpha", "beta")) == {1: 1, 3: 2}


def test_phrase_order_matters(spark):
    rows = [(1, "beta alpha")]
    assert _hits(spark, rows, ("alpha", "beta")) == {}


def test_phrase_overlapping_occurrences_count_separately(spark):
    # "a a a" contains TWO occurrences of ("a", "a") at starts 0 and 1
    rows = [(1, "a a a")]
    assert _hits(spark, rows, ("a", "a")) == {1: 2}


def test_phrase_repeated_token_needs_both_positions(spark):
    # phrase (the, big, the): "the big the" hits, "the big cat the" doesn't
    rows = [(1, "the big the end"), (2, "the big cat the")]
    assert _hits(spark, rows, ("the", "big", "the")) == {1: 1}


def test_phrase_absent_token_no_rows(spark):
    rows = [(1, "alpha beta")]
    assert _hits(spark, rows, ("alpha", "zzz")) == {}


def test_phrase_case_and_whitespace_normalized(spark):
    rows = [(1, "  Alpha   BETA  ")]
    assert _hits(spark, rows, ("alpha", "beta")) == {1: 1}


def test_phrase_ranking_prefers_higher_tf_shorter_doc(spark):
    # same df; doc 1 has tf=2 in a short doc, doc 2 tf=1 in a long doc
    rows = [
        (1, "p q p q"),
        (2, "p q " + "filler " * 40),
    ]
    out = fts_phrase_topk(_docs(spark, rows), phrases={0: ("p", "q")}, k=10)
    ranked = [r["doc_id"] for r in out.orderBy("rank").collect()]
    assert ranked == [1, 2]


def test_tfidf_rare_term_outranks_common(spark):
    rows = [
        (1, "common rare common common"),
        (2, "common common"),
        (3, "common other"),
    ]
    out = tfidf_topk_terms(_docs(spark, rows), k=1)
    top = {r["doc_id"]: r["token"] for r in out.collect()}
    # 'rare' (df=1) beats 'common' (df=3) in doc 1 despite lower tf
    assert top[1] == "rare"
    assert top[3] == "other"


def test_tfidf_tie_breaks_on_token_asc(spark):
    rows = [(1, "zed abc"), (2, "unrelated")]
    out = tfidf_topk_terms(_docs(spark, rows), k=2)
    r1 = [r["token"] for r in out.where(F.col("doc_id") == 1).orderBy("rank").collect()]
    # both df=1, tf=1 -> identical tfidf; 'abc' < 'zed'
    assert r1 == ["abc", "zed"]


def test_tfidf_k_limit_and_schema(spark):
    rows = [(1, "a b c d e f g h"), (2, "a b")]
    out = tfidf_topk_terms(_docs(spark, rows))
    assert out.columns == ["doc_id", "token", "tf", "df", "tfidf_e6", "rank"]
    counts = {r["doc_id"]: r["n"] for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert counts[1] == C.TFIDF_TOPK and counts[2] == 2
