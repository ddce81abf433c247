"""Property fuzz: the Spark repetition/passage operators vs independent
pure-Python reference implementations on random corpora.

One hypothesis example = one random CORPUS (many docs) = one Spark job, so
the fuzz covers hundreds of documents in a handful of Spark round-trips.
A 3-letter alphabet forces heavy n-gram collisions (the interesting
regime); k/n small so short docs exercise the empty-gram guards."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extraction_and_query_spark.operators.repetition import (
    dup_passage_stats,
    dup_passages,
    repetition_metrics,
)

_WORDS = ("aa", "bb", "cc")
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=25).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=12)


def _py_metrics(texts, ns):
    out = {}
    for doc_id, text in enumerate(texts):
        words = [w for w in text.strip().lower().split() if w]
        denom = max(len(" ".join(words)), 1)
        for n in ns:
            grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
            if not grams:
                continue
            cnt = {}
            for g in grams:
                cnt[g] = cnt.get(g, 0) + 1
            top = min(((-c, g) for g, c in cnt.items()))  # count desc, gram asc
            top_cnt, top_gram = -top[0], top[1]
            dup_chars = sum(c * len(g) for g, c in cnt.items() if c >= 2)
            out[(doc_id, n)] = (
                top_cnt,
                min(1_000_000 * top_cnt * len(top_gram) // denom, 1_000_000),
                min(1_000_000 * dup_chars // denom, 1_000_000),
            )
    return out


def _py_passages(texts, k):
    shingles = {}  # gram -> set(doc)
    occ = {}  # doc -> [start_w]
    for doc_id, text in enumerate(texts):
        words = [w for w in text.strip().lower().split() if w]
        for i in range(len(words) - k + 1):
            g = " ".join(words[i : i + k])
            shingles.setdefault(g, set()).add(doc_id)
            occ.setdefault(doc_id, []).append((i + 1, g))
    passages = {}
    for doc_id, starts in occ.items():
        dup_starts = sorted(s for s, g in starts if len(shingles[g]) >= 2)
        runs = []
        for s in dup_starts:
            if runs and s - runs[-1][-1] <= k:
                runs[-1].append(s)
            else:
                runs.append([s])
        if runs:
            passages[doc_id] = [
                (r[0], r[-1] + k - 1, len(r)) for r in runs
            ]
    return passages


@settings(max_examples=25, deadline=None)
@given(_corpus)
def test_repetition_metrics_fuzz(spark, texts):
    ns = (2, 3)
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    # restrict to the fuzzed n values via a local import of the operator's
    # internals: run the full operator and filter (contract REP_NS is wider)
    got = {
        (r.doc_id, r.n): (r.top_cnt, r.top_frac_e6, r.dup_frac_e6)
        for r in repetition_metrics(docs).collect()
        if r.n in ns
    }
    assert got == _py_metrics(texts, ns)


@settings(max_examples=25, deadline=None)
@given(_corpus)
def test_dup_passages_fuzz(spark, texts):
    k = 3
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {}
    for r in dup_passages(docs, k=k).collect():
        got.setdefault(r.doc_id, []).append(
            (r.passage_seq, r.start_word, r.end_word, r.n_shingles)
        )
    got = {
        d: [(s, e, ns_) for _, s, e, ns_ in sorted(v)] for d, v in got.items()
    }
    assert got == _py_passages(texts, k)
    # stats consistency with the passage rows
    stats = {r.doc_id: r for r in dup_passage_stats(docs, k=k).collect()}
    for d, ps in got.items():
        dup_words = sum(e - s + 1 for s, e, _ in ps)
        assert stats[d].dup_words == dup_words
        assert stats[d].n_passages == len(ps)
