"""Unit contracts for the UniMax waterfill, the padding-waste report and
the cross-split leakage audit (operators/packing.py round-4 additions).

The UniMax closed form is checked against an INDEPENDENT Python replay of
the greedy recurrence alloc_i = min(cap_i, remaining / langs_left) — the
published algorithm, not the window closed form — so the prefix-cap proof
the operator relies on is itself under test.
"""

from __future__ import annotations

import hashlib

import pytest

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators import packing as PK

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _greedy_waterfill(caps, budget):
    """The published greedy recurrence alloc_i = min(cap_i,
    remaining / left), simulated with EXACT rationals (each uncapped
    share is deducted before the next language's test — the step a
    naive integer simulation gets wrong, wrongly re-admitting later
    languages as capped).  The capped set from the simulation is then
    integerized by the contract rule: capped rows take their capacity,
    the leftover splits by integer div with the remainder going +1 to
    the first uncapped ranks."""
    from fractions import Fraction

    order = sorted(range(len(caps)), key=lambda i: caps[i])
    remaining, left = Fraction(budget), len(caps)
    capped = set()
    for i in order:
        share = remaining / left
        if caps[i] <= share:
            capped.add(i)
            remaining -= caps[i]
        else:
            remaining -= share
        left -= 1
    alloc = [0] * len(caps)
    leftover = budget - sum(caps[i] for i in capped)
    uncapped = [i for i in order if i not in capped]
    for i in capped:
        alloc[i] = caps[i]
    if uncapped:
        base, rem = divmod(leftover, len(uncapped))
        for j, i in enumerate(uncapped):
            alloc[i] = base + (1 if j < rem else 0)
    return alloc


def test_unimax_matches_greedy_replay(docs):
    out = PK.unimax_alloc(docs).orderBy("rank").toPandas()
    caps = out.cap_tokens.tolist()
    total = int(out.n_tokens.sum())
    budget = (total * C.UNIMAX_BUDGET_E6) // 1_000_000
    replay = _greedy_waterfill(caps, budget)
    assert out.alloc_tokens.tolist() == replay
    # budget is spent EXACTLY unless every language capped out
    if not out.capped.all():
        assert int(out.alloc_tokens.sum()) == budget
    # nobody exceeds capacity; capped rows take exactly their capacity
    assert (out.alloc_tokens <= out.cap_tokens).all()
    assert (out.loc[out.capped, "alloc_tokens"]
            == out.loc[out.capped, "cap_tokens"]).all()
    # capped rows form a prefix of the ascending-capacity order
    flags = out.sort_values("rank").capped.tolist()
    assert flags == sorted(flags, reverse=True)
    # both branches live at fixture scale (contract constants note)
    assert out.capped.any() and (~out.capped).any()


def test_unimax_epochs_bounded(docs):
    out = PK.unimax_alloc(docs).toPandas()
    assert (out.epochs_e3 <= C.UNIMAX_MAX_EPOCHS * 1000).all()


def test_pad_efficiency_invariants(docs):
    out = PK.pad_efficiency(docs).orderBy("bucket").toPandas()
    edges = []
    b = C.PAD_MIN_BUCKET
    while b <= C.PAD_MAX_LEN:
        edges.append(b)
        b *= 2
    assert set(out.bucket).issubset(set(edges))
    # every bucket populated AND the truncation branch fires (constants
    # are tuned to the fixture's 10-99-token docs — contract note)
    assert set(out.bucket) == set(edges)
    assert out.n_trunc.sum() > 0
    # pad arithmetic: bucket * n_docs == n_tokens + n_pad, exactly
    assert ((out.bucket * out.n_docs) == (out.n_tokens + out.n_pad)).all()
    assert (out.util_e6 == (1_000_000 * out.n_tokens)
            // (out.n_tokens + out.n_pad)).all()
    assert int(out.n_docs.sum()) == docs.count()


def _split_of(doc_id: int) -> str:
    h = hashlib.md5(f"{C.SPLIT_SALT}{doc_id}".encode()).hexdigest()
    b = int(h[:12], 16) % C.SAMPLE_MOD
    if b < C.SPLIT_VAL_MICRO:
        return "val"
    if b < C.SPLIT_VAL_MICRO + C.SPLIT_TEST_MICRO:
        return "test"
    return "train"


def test_split_leakage_fires_on_crafted_near_dups(spark):
    """Two identical docs whose salted split coordinates differ MUST show
    up as a leaking pair; an identical pair inside one split must not."""
    # scan doc_ids for one val id and two train ids (pure arithmetic, no
    # fixture dependence)
    val_id = next(i for i in range(100_000) if _split_of(i) == "val")
    train_ids = [i for i in range(2000) if _split_of(i) == "train"][:2]
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    rows = [
        (val_id, text, "en", "s0", len(text)),
        (train_ids[0], text, "en", "s0", len(text)),
        (train_ids[1], text, "en", "s0", len(text)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    lk = PK.split_leakage(df).toPandas()
    # all three pairings are LSH candidates (identical signatures)
    assert len(lk) == 3
    leaks = lk[lk.leak]
    assert len(leaks) == 2  # val-train twice; train-train pair is clean
    st = PK.split_leakage_stats(df).toPandas()
    assert st.n_pairs[0] == 3
    assert st.n_leaks[0] == 2
    assert st.n_eval_contaminated[0] == 1  # the single val doc


def test_split_leakage_labels_match_dataset_split(docs):
    lk = PK.split_leakage(docs).toPandas()
    sp = PK.dataset_split(docs).toPandas().set_index("doc_id")["split"]
    for _, r in lk.iterrows():
        assert r.split_a == sp[r.doc_a]
        assert r.split_b == sp[r.doc_b]
        assert r.leak == (r.split_a != r.split_b)


def test_curriculum_order_is_readability_permutation(spark, docs):
    """pos must be a 0..n-1 permutation whose order is exactly
    (flesch_e3 DESC, doc_id) — the banded rank equals the plain global
    ordering; scores must equal the readability operator's."""
    from pdf_extraction_and_query_spark.operators.packing import (
        curriculum_order,
    )
    from pdf_extraction_and_query_spark.operators.textstats import (
        readability,
    )

    out = curriculum_order(docs).toPandas().sort_values("pos")
    n = len(out)
    assert out.pos.tolist() == list(range(n))
    ordered = sorted(
        zip(out.flesch_e3, out.doc_id), key=lambda t: (-t[0], t[1])
    )
    assert list(zip(out.flesch_e3, out.doc_id)) == ordered
    rd = readability(docs).toPandas().set_index("doc_id")["flesch_e3"]
    assert n == len(rd)
    for _, r in out.head(50).iterrows():
        assert r.flesch_e3 == rd[r.doc_id]
