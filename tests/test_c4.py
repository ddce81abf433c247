"""C4 line-filter family contracts (operators/textstats.py c4_* — the
Raffel et al. 2020 §2.2 keep rule over the lined fixture page).

Meet-in-the-middle like the HTML family: the page generator and the
DuckDB oracle interpolate the same C4_* contract constants, so these
tests pin the generator's structure and the filter semantics against an
independent pure-Python replay.
"""

from __future__ import annotations

import re

import pytest

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators import textstats as TX

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _page_lines_py(doc_id: int, text: str) -> list[str]:
    """Independent Python replay of the generator arithmetic."""
    words = text.strip().split() if text.strip() else []
    L = C.C4_WORDS_PER_LINE
    n_body = -(-len(words) // L)
    lines = []
    for i in range(n_body):
        s = " ".join(words[i * L : (i + 1) * L])
        if (doc_id * C.C4_JS_MULT + i) % C.C4_JS_EVERY == 0:
            s = "javascript " + s
        if (doc_id + i) % C.C4_PUNCT_EVERY != 0:
            s = s + "."
        lines.append(s)
    if doc_id % C.C4_LOREM_EVERY == 0:
        lines.append("lorem ipsum")
    if doc_id % C.C4_BRACE_EVERY == 0:
        lines.append("{")
    return lines


def _kept_py(line: str) -> bool:
    wc = len(line.strip().split()) if line.strip() else 0
    if wc < C.C4_MIN_LINE_WORDS:
        return False
    if not re.search(C.C4_TERMINAL_RE, line):
        return False
    if "javascript" in line.lower():
        return False
    return True


def test_generator_matches_python_replay(docs):
    pages = TX.c4_pages(docs).orderBy("doc_id").limit(50).collect()
    src = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").orderBy("doc_id").limit(50).collect()
    }
    for r in pages:
        expect = "\n".join(_page_lines_py(r["doc_id"], src[r["doc_id"]]))
        assert r["page"] == expect, r["doc_id"]


def test_line_stats_match_python_replay(docs):
    st = TX.c4_line_stats(TX.c4_pages(docs)).orderBy("doc_id").limit(80).collect()
    src = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").orderBy("doc_id").limit(80).collect()
    }
    for r in st:
        lines = _page_lines_py(r["doc_id"], src[r["doc_id"]])
        kept = [x for x in lines if _kept_py(x)]
        assert r["n_lines"] == len(lines)
        assert r["n_kept"] == len(kept)
        assert r["n_short"] == sum(
            (len(x.split()) if x.strip() else 0) < C.C4_MIN_LINE_WORDS
            for x in lines
        )
        assert r["n_js"] == sum("javascript" in x.lower() for x in lines)
        has_lorem = any("lorem ipsum" in x.lower() for x in lines)
        has_brace = any("{" in x for x in lines)
        assert r["has_lorem"] == has_lorem
        assert r["has_brace"] == has_brace
        assert r["keep_doc"] == (
            len(kept) >= C.C4_MIN_KEPT and not has_lorem and not has_brace
        )


def test_every_rule_fires_at_fixture_scale(docs):
    st = TX.c4_line_stats(TX.c4_pages(docs))
    agg = st.selectExpr(
        "sum(n_short) s",
        "sum(n_nopunct) p",
        "sum(n_js) j",
        "sum(cast(has_lorem as long)) l",
        "sum(cast(has_brace as long)) b",
        "sum(cast(keep_doc as long)) k",
        "count(1) n",
    ).first()
    assert agg.s > 0 and agg.p > 0 and agg.j > 0
    assert agg.l > 0 and agg.b > 0
    assert 0 < agg.k < agg.n  # verdict splits the corpus both ways


def test_clean_emits_only_kept_docs_and_lines(docs):
    st = TX.c4_line_stats(TX.c4_pages(docs)).toPandas().set_index("doc_id")
    cl = TX.c4_clean(TX.c4_pages(docs)).toPandas()
    kept_ids = set(st[st.keep_doc].index)
    assert set(cl.doc_id) == kept_ids
    for _, r in cl.head(40).iterrows():
        assert r.n_kept == st.loc[r.doc_id, "n_kept"]
        for line in r.c4_text.split("\n"):
            assert _kept_py(line)


def test_kernel_bit_equality_with_expression_twin(docs):
    """PLANS.md #14 discipline: the Arrow mapInPandas kernel and the
    interpreted expression twin must agree on EVERY column for EVERY
    fixture doc (stats and clean both)."""
    pages = TX.c4_pages(docs)
    a = TX.c4_line_stats(pages).orderBy("doc_id").collect()
    b = TX.c4_line_stats_expr(pages).orderBy("doc_id").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    ca = TX.c4_clean(pages).orderBy("doc_id").collect()
    cb = TX.c4_clean_expr(pages).orderBy("doc_id").collect()
    assert [r.asDict() for r in ca] == [r.asDict() for r in cb]


def test_empty_doc_emits_no_rows(spark):
    """Round-4 ADVICE.md: an empty-text doc off the lorem/brace cadences
    yields page='' — the oracle's range(0, 0) unnest omits it, so the
    Spark side (kernel AND expression twin, stats AND clean) must too,
    not count split('', '\\n') as one phantom line.  A doc ON the lorem
    cadence still surfaces (its page is the trailer line alone)."""
    docs = spark.createDataFrame(
        [
            (1, ""),                # empty, off both cadences -> no row
            (2, "   "),             # whitespace-only -> no row
            (C.C4_LOREM_EVERY, ""), # empty but lorem trailer -> 1 line
            (3, "alpha beta gamma delta epsilon zeta"),  # normal doc
        ],
        "doc_id long, text string",
    )
    pages = TX.c4_pages(docs)
    for stats in (TX.c4_line_stats(pages), TX.c4_line_stats_expr(pages)):
        rows = {r.doc_id: r for r in stats.collect()}
        assert 1 not in rows and 2 not in rows
        assert rows[C.C4_LOREM_EVERY].n_lines == 1
        assert rows[C.C4_LOREM_EVERY].has_lorem
        assert rows[3].n_lines == 1
    for clean in (TX.c4_clean(pages), TX.c4_clean_expr(pages)):
        ids = {r.doc_id for r in clean.collect()}
        assert 1 not in ids and 2 not in ids
