"""Property fuzz: fts_phrase_topk's occurrence counting vs a pure-Python
sliding-window scan on random corpora AND random phrases.

One hypothesis example = one random corpus + one random phrase = one Spark
job.  A 3-word alphabet makes phrase hits, overlaps, and repeated-token
phrases common (the interesting regime for the witness-count trick)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extraction_and_query_spark.operators.fulltext import fts_phrase_topk

_WORDS = ("aa", "bb", "cc")
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=10)
_phrase = st.lists(st.sampled_from(_WORDS), min_size=2, max_size=4).map(tuple)


def _py_hits(texts, phrase):
    m = len(phrase)
    out = {}
    for doc_id, text in enumerate(texts):
        words = [w for w in text.strip().lower().split() if w]
        n = sum(
            1
            for i in range(len(words) - m + 1)
            if tuple(words[i : i + m]) == phrase
        )
        if n:
            out[doc_id] = n
    return out


@settings(max_examples=12, deadline=None)
@given(_corpus, _phrase)
def test_phrase_tf_matches_python_scan(spark, texts, phrase):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["tf"]
        for r in fts_phrase_topk(docs, phrases={0: phrase}, k=10**6).collect()
    }
    assert got == _py_hits(texts, phrase)
