"""Unit contract for winnowing fingerprints (operators/winnow.py).

A pure-Python reference implementation of the paper's algorithm (same
contract arithmetic) pins the Spark output bit-for-bit on constructed
docs; the guarantee test proves the paper's property — any shared run of
t = WINNOW_W + WINNOW_K - 1 words yields at least one shared fingerprint.
Cross-engine equality is covered by the oracle-parity suite."""

from __future__ import annotations

import random

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_matches,
)


def _poly(s: str) -> int:
    h = 0
    for ch in "#" + s:
        h = (h * C.HASH_BASE + ord(ch)) % C.HASH_MOD
    return h


def _ref_fingerprints(text: str) -> set[tuple[int, int]]:
    """The paper's robust winnowing, exact contract arithmetic."""
    words = [w for w in text.strip().lower().split() if w]
    wh = [_poly(w) for w in words]
    m = len(words) - C.WINNOW_K + 1
    if m < 1:
        return set()
    grams = []
    for i in range(m):
        g = wh[i]
        for j in range(1, C.WINNOW_K):
            g = (g * C.HASH_BASE + wh[i + j]) % C.HASH_MOD
        grams.append(g)
    out = set()
    n_starts = max(m - C.WINNOW_W + 1, 1)
    for s in range(n_starts):
        window = grams[s : s + C.WINNOW_W]
        h = min(window)
        # rightmost occurrence of the min
        pos = s + max(i for i, v in enumerate(window) if v == h)
        out.add((pos + 1, h))
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _fps(spark, text, doc_id=1):
    rows = winnow_fingerprints(_df(spark, [(doc_id, text)])).collect()
    return {(r.fp_pos, r.fp) for r in rows}


def test_matches_reference_implementation(spark):
    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    text = " ".join(rng.choice(vocab) for _ in range(200))
    assert _fps(spark, text) == _ref_fingerprints(text)


def test_rightmost_min_tie_break(spark):
    # repeated text guarantees hash ties inside windows; the reference
    # implementation encodes the rightmost rule, so equality proves it
    text = " ".join(["spam ham"] * 30)
    assert _fps(spark, text) == _ref_fingerprints(text)


def test_short_docs(spark):
    assert _fps(spark, "one two three") == set()  # < WINNOW_K words
    # exactly K words -> one gram, one window covering it
    four = "one two three four"
    assert _fps(spark, four) == _ref_fingerprints(four)
    assert len(_fps(spark, four)) == 1


def test_shared_run_guarantee(spark):
    """Any shared run of WINNOW_W + WINNOW_K - 1 words must yield at least
    one shared fingerprint (paper §3, the winnowing guarantee)."""
    rng = random.Random(13)
    t = C.WINNOW_W + C.WINNOW_K - 1
    run = " ".join(f"shared{i}" for i in range(t))
    a = " ".join(f"left{i}" for i in range(40)) + " " + run
    b = run + " " + " ".join(f"right{i}" for i in range(40))
    fa = {fp for _, fp in _fps(spark, a, 1)}
    fb = {fp for _, fp in _fps(spark, b, 2)}
    assert fa & fb, "guarantee violated: shared t-word run, no shared fingerprint"
    assert rng  # keep the rng import honest if the test grows


def test_matches_identical_docs_full_overlap(spark):
    text = " ".join(f"word{i} the filler{i * 3}" for i in range(30))
    other = " ".join(f"unrelated{i} token{i * 7} body{i}" for i in range(30))
    out = winnow_matches(_df(spark, [(1, text), (2, text), (3, other)])).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.overlap_e6 == 1_000_000
    assert r.n_shared >= C.WINNOW_MIN_SHARED


def test_matches_df_pruning(spark):
    # a fingerprint present in MORE than WINNOW_MAX_DF docs is boilerplate
    # and must not create pairs on its own
    boiler = " ".join(f"common{i}" for i in range(C.WINNOW_K))
    rows = [
        (i, boiler + " " + " ".join(f"pad{i}x{j}" for j in range(20)))
        for i in range(C.WINNOW_MAX_DF + 2)
    ]
    out = winnow_matches(_df(spark, rows)).collect()
    assert out == []


def test_source_matrix_rollup_and_canonical_orientation(spark):
    """Docs 0 (src b) and 1 (src a) share a long passage -> one (a, b)
    cell (lexicographic canonicalization regardless of doc order); docs
    2 and 3 are identical within src c -> a diagonal (c, c) cell;
    src d's doc shares nothing -> absent."""
    from pdf_extraction_and_query_spark.operators.winnow import (
        winnow_matches,
        winnow_source_matrix,
    )

    shared = " ".join(f"common{i}" for i in range(30))
    rows = [
        (0, shared + " " + " ".join(f"x{i}" for i in range(20)), "en", "b", 1),
        (1, " ".join(f"y{i}" for i in range(20)) + " " + shared, "en", "a", 1),
        (2, " ".join(f"dup{i}" for i in range(40)), "en", "c", 1),
        (3, " ".join(f"dup{i}" for i in range(40)), "en", "c", 1),
        (4, " ".join(f"solo{i}" for i in range(40)), "en", "d", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    cells = {
        (r["src_a"], r["src_b"]): r
        for r in winnow_source_matrix(docs).collect()
    }
    assert set(cells) == {("a", "b"), ("c", "c")}
    m = {(r["doc_a"], r["doc_b"]): r for r in winnow_matches(docs).collect()}
    ab = cells[("a", "b")]
    assert ab["n_pairs"] == 1
    assert ab["n_shared_total"] == m[(0, 1)]["n_shared"]
    assert ab["max_overlap_e6"] == m[(0, 1)]["overlap_e6"]
    cc = cells[("c", "c")]
    assert cc["n_pairs"] == 1
    assert cc["max_overlap_e6"] == 1_000_000  # identical docs
