"""Unit contract for the full Gopher quality-rule verdict
(operators/gopher.py): every rule flag must FIRE on a purpose-built
violator and PASS on a clean doc — the oracle-parity suite proves
cross-engine equality, this suite proves each rule means what the paper
says (Rae et al. 2021, appendix A1.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators.gopher import (
    gopher_rules,
    gopher_verdict,
)

# a clean passage: > GOPHER_MIN_WORDS words, normal word lengths, has a
# required stopword, multiple distinct lines with NO shared n-grams (the
# repetition thresholds are strict enough to fail templated lines), no
# bullets/ellipses/symbols
_CLEAN = "\n".join(
    [
        "the quick brown fox jumps over a lazy dog near still water",
        "every large table scans quickly when columns stay narrow and sorted",
        "streams of filtered rows merge into windows across many batches",
        "queries join small parts with big values before the final sort",
        "fresh data arrives while groups aggregate keys without any delay",
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _flags(spark, text, doc_id=1):
    out = gopher_rules(_df(spark, [(doc_id, text)])).collect()
    assert len(out) == 1
    return out[0].asDict()


def test_clean_doc_passes_every_rule(spark):
    r = _flags(spark, _CLEAN)
    for f in (
        "wordcount_ok",
        "wordlen_ok",
        "symbol_ok",
        "bullet_ok",
        "ellipsis_ok",
        "alpha_ok",
        "stops_ok",
        "dup_line_ok",
        "dup_line_char_ok",
        "passes_gopher",
    ):
        assert r[f] is True, f
    assert r["n_words"] == sum(len(l.split()) for l in _CLEAN.split("\n"))
    assert r["n_lines"] == 5


def test_wordcount_bounds(spark):
    assert _flags(spark, "the tiny doc")["wordcount_ok"] is False
    assert _flags(spark, _CLEAN)["wordcount_ok"] is True


def test_mean_word_length_bounds(spark):
    # 60 one-char words -> mean 1.00 (< 3)
    short = " ".join(["a"] * 30 + ["the"] * 30)
    r = _flags(spark, short)
    assert r["mean_word_len_e2"] == (100 * (30 + 90)) // 60
    assert r["wordlen_ok"] is False
    # 60 long tokens -> mean 12 (> 10); keep alpha + stopword present
    long_ = "the " + " ".join(["abcdefghijklm"] * 59)
    assert _flags(spark, long_)["wordlen_ok"] is False


def test_symbol_ratio(spark):
    # 9 '#' words on top of the clean 56 -> 9/65 > 10%
    r = _flags(spark, _CLEAN + "\n# " + "# " * 8)
    assert r["symbol_ok"] is False
    assert _flags(spark, _CLEAN)["symbol_frac_e6"] == 0


def test_bullet_and_ellipsis_line_fractions(spark):
    bullets = "\n".join(f"- the item number {i} is listed here" for i in range(10))
    assert _flags(spark, bullets)["bullet_ok"] is False  # 100% > 90%
    ell = "\n".join(
        [f"the sentence {i} trails off..." for i in range(4)]
        + ["the final line stands alone here"] * 1
    )
    r = _flags(spark, ell)
    assert r["ellipsis_frac_e6"] == (1_000_000 * 4) // 5
    assert r["ellipsis_ok"] is False  # 80% > 30%


def test_alpha_word_fraction(spark):
    # 10 alpha words + 50 pure-number words -> 16% < 80%
    nums = "the quick fox " + " ".join(str(i) for i in range(50)) + " and more so"
    r = _flags(spark, nums)
    assert r["alpha_ok"] is False
    assert _flags(spark, _CLEAN)["alpha_frac_e6"] == 1_000_000


def test_required_stopwords(spark):
    no_stops = " ".join(["column"] * 60)
    r = _flags(spark, no_stops)
    assert r["n_req_stopwords"] == 0
    assert r["stops_ok"] is False
    # all eight present -> bitmask counts each once
    r2 = _flags(
        spark,
        " ".join(C.GOPHER_REQ_STOPWORDS) + " " + " ".join(["filler"] * 50),
    )
    assert r2["n_req_stopwords"] == len(C.GOPHER_REQ_STOPWORDS)


def test_duplicate_line_fractions(spark):
    # 4 copies of one line + 6 distinct lines: dup_lines=4/10
    text = "\n".join(
        ["the repeated boilerplate footer line here"] * 4
        + [f"the unique content line number {i} word" for i in range(6)]
    )
    r = _flags(spark, text)
    assert r["dup_line_frac_e6"] == (1_000_000 * 4) // 10
    assert r["dup_line_ok"] is False  # 40% > 30%
    assert r["dup_line_char_ok"] is False  # dup chars dominate


def test_empty_and_blank_docs_emit_no_row(spark):
    out = gopher_rules(_df(spark, [(1, ""), (2, " \n \n"), (3, _CLEAN)]))
    assert [r.doc_id for r in out.collect()] == [3]


def test_verdict_composes_rules_and_repetition(spark):
    # doc 1 clean; doc 2 passes the line rules but is one 2-gram repeated
    rep = " ".join(["the spam"] * 40)
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_verdict(_df(spark, [(1, _CLEAN), (2, rep)])).collect()
    }
    assert out[1]["passes_repetition"] is True
    assert out[1]["passes_gopher"] is True
    assert out[2]["top2_ok"] is False  # top 2-gram covers ~everything
    assert out[2]["passes_repetition"] is False
    assert out[2]["passes_gopher"] is False


def test_verdict_short_doc_vacuous_repetition_pass(spark):
    # 3 words: no n-gram row for any n in REP_NS except n=2,3 -> those judge;
    # a doc below every n passes repetition vacuously
    out = gopher_verdict(_df(spark, [(1, "the x")])).collect()[0].asDict()
    assert out["dup5_ok"] is True and out["dup8_ok"] is True
    assert out["passes_repetition"] in (True, False)  # judged only where rows exist


def test_two_exchange_plan(spark):
    """The rule set costs exactly two hash exchanges: the corpus-sized
    (doc_id, line) group and the doc_id rollup over its reduced output —
    never a third (fan_out's RoundRobin repartition is a narrow balance
    step, not a keyed shuffle)."""
    plan = gopher_rules(
        _df(spark, [(1, _CLEAN)])
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan
