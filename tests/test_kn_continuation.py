"""Hand-computed pins for Kneser-Ney continuation statistics
(operators/textstats.py kn_continuation): the classic 'francisco'
example — high raw frequency, ONE left context — plus a token with zero
left contexts (only ever doc-initial) and the (cont desc, token asc)
report ordering.  The oracle-parity suite replays the same arithmetic
in DuckDB at corpus scale.
"""

from __future__ import annotations

from pdf_extraction_and_query_spark.operators import textstats as TX

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)], SCHEMA
    )


def test_kn_continuation_hand_computed(spark):
    # bigram types: (san,francisco) (francisco,san) (san,diego)
    # (new,york) (york,new) (new,san) (zzz,diego)  -> 7 total
    docs = _docs(
        spark,
        [
            "san francisco san diego",
            "new york new san francisco",
            "zzz diego",
        ],
    )
    rows = TX.kn_continuation(docs).collect()
    by_tok = {r["token"]: r for r in rows}
    # 'san' is the most frequent token but follows only {francisco, new}
    san = by_tok["san"]
    assert (san["unigram_cnt"], san["cont_cnt"], san["right_types"]) == (3, 2, 2)
    assert san["p_cont_e6"] == 2 * 1_000_000 // 7
    # 'francisco' appears twice, always after 'san' — the KN poster child
    fr = by_tok["francisco"]
    assert (fr["unigram_cnt"], fr["cont_cnt"], fr["right_types"]) == (2, 1, 1)
    assert fr["p_cont_e6"] == 1_000_000 // 7
    # 'zzz' only ever opens a document: zero left contexts
    zzz = by_tok["zzz"]
    assert (zzz["cont_cnt"], zzz["right_types"], zzz["p_cont_e6"]) == (0, 1, 0)
    # 'diego' follows two distinct lefts {san, zzz}
    assert by_tok["diego"]["cont_cnt"] == 2
    # report order: cont desc, token asc
    assert [r["token"] for r in rows] == [
        "diego",
        "san",
        "francisco",
        "new",
        "york",
        "zzz",
    ]


def test_kn_continuation_topk_cap(spark):
    docs = _docs(spark, ["a b c d e f g h"])
    rows = TX.kn_continuation(docs, topk=3).collect()
    assert len(rows) == 3
    # all cont_cnt = 1 except 'a' (0); asc token tie-break
    assert [r["token"] for r in rows] == ["b", "c", "d"]


def test_readability_hand_computed(spark):
    """'The cat sat. The dog ran!' -> 2 sentences, 6 words, 6 vowel
    groups: flesch = 206.835 - 1.015*3 - 84.6*1 = 119.190 (e3),
    fk = 0.39*3 + 11.8*1 - 15.59 = -2.620 (e3)."""
    docs = _docs(spark, ["The cat sat. The dog ran!"])
    [r] = TX.readability(docs).collect()
    assert (r["n_sentences"], r["n_words"], r["n_syllables"]) == (2, 6, 6)
    assert r["flesch_e3"] == 206_835 - 3_045 - 84_600
    assert r["fk_grade_e3"] == 1_170 + 11_800 - 15_590


def test_readability_no_terminator_counts_one_sentence(spark):
    docs = _docs(spark, ["just words no punctuation here"])
    [r] = TX.readability(docs).collect()
    assert r["n_sentences"] == 1
    assert r["n_words"] == 5
