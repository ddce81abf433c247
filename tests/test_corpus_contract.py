"""Word-index-arithmetic span derivation contract (sources/corpus.
spans_from_text vs the contract CORPUS_* constants). This shape is what the
DuckDB oracles for boilerplate_flags / doc_meta / processing_report /
cascade_delete reproduce in SQL — if this test breaks, those oracles drift.
"""

import math

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.core import boilerplate as bp
from pdf_extraction_and_query_spark.sources.corpus import footer_text, spans_from_text


def _mk_text(n_words: int) -> str:
    return " ".join(f"w{i % 13}" for i in range(n_words))


def test_structural_counts_follow_word_arithmetic():
    for n_words in (1, 3, 4, 5, 16, 17, 49, 100, 101):
        spans = spans_from_text("9", _mk_text(n_words))
        n_lines = math.ceil(n_words / C.CORPUS_WORDS_PER_LINE)
        n_pages = math.ceil(n_lines / C.CORPUS_LINES_PER_PAGE)
        n_figs = sum(
            1 for i in range(n_lines) if i % C.CORPUS_FIG_EVERY == C.CORPUS_FIG_PHASE
        )
        kinds = [s["kind"] for s in spans]
        assert kinds.count("page_marker") == n_pages, n_words
        assert kinds.count("figure") == n_figs, n_words
        # text spans = body lines + one footer per page
        assert kinds.count("text") == n_lines + n_pages, n_words
        assert len(spans) == 2 * n_pages + n_lines + n_figs, n_words
        # offsets are dense 0..n-1 in emission order
        assert [s["offset"] for s in spans] == list(range(len(spans)))


def test_footer_closes_every_page_and_is_boilerplate_iff_enough_pages():
    for n_words, expect_flagged in ((16, False), (48, False), (49, True), (100, True)):
        spans = spans_from_text("7", _mk_text(n_words))
        pages = {s["page"] for s in spans if s["kind"] == "page_marker"}
        footers = [
            s for s in spans if s["kind"] == "text" and s["text"].startswith(C.CORPUS_FOOTER_PREFIX)
        ]
        assert {f["page"] for f in footers} == pages
        assert [f["text"] for f in footers] == [
            footer_text("7", p) for p in sorted(pages)
        ]
        keys = bp.boilerplate_keys(
            [(s["text"], s["page"]) for s in spans if s["kind"] == "text"]
        )
        flagged = bp.normalize_line(footer_text("7", 1)) in keys
        assert flagged == expect_flagged, n_words


def test_empty_text_yields_no_spans():
    assert spans_from_text("0", "") == []
    assert spans_from_text("0", "   ") == []


def test_sql_twin_matches_python_for_arbitrary_word_counts():
    """Cross-engine pin of the corpus contract WITHOUT Spark: the registry's
    _CORPUS_META CTE (the DuckDB twin of spans_from_text) must reproduce the
    Python-side structural counts for arbitrary word counts, including the
    page/line/figure boundary cases. hypothesis fuzzes the word count."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf_extraction_and_query_spark.plans.registry import _CORPUS_META

    con = duckdb.connect()

    @settings(max_examples=80, deadline=None)
    @given(st.integers(min_value=0, max_value=400))
    def check(n_words):
        text = _mk_text(n_words) if n_words else ""
        spans = spans_from_text("5", text)
        con.execute("CREATE OR REPLACE TABLE documents AS SELECT 5 AS doc_id, ? AS text", [text])
        row = con.execute(
            f"WITH {_CORPUS_META} SELECT n_lines, n_pages, n_figs FROM cm"
        ).fetchone()
        kinds = [s["kind"] for s in spans]
        n_pages = kinds.count("page_marker")
        n_figs = kinds.count("figure")
        n_lines = kinds.count("text") - n_pages  # minus one footer per page
        assert (n_lines, n_pages, n_figs) == tuple(row), (n_words, row)

    check()


def test_only_footers_recur_across_pages_at_gate_scale(spark):
    """The boilerplate_flags oracle emits exactly one footer row per page —
    valid only while NO non-footer normalized line recurs on >=
    DEFAULT_MIN_PAGES distinct pages of a document.  Digit-runs->0
    normalization makes body-line collisions possible in principle (round-2
    ADVICE), so certify the assumption at BOTH driver gate scales: every
    line the Spark operator flags must be a footer."""
    from pyspark.sql import functions as F

    from pdf_extraction_and_query_spark.operators.extraction import (
        explode_spans,
        flag_boilerplate,
    )
    from pdf_extraction_and_query_spark.sources.corpus import (
        spans_table_from_documents,
    )

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        lines = flag_boilerplate(explode_spans(spans_table_from_documents(spark, sf_dir)))
        non_footer_flagged = (
            lines.where(F.col("is_boiler"))
            .where(~F.col("text").startswith(C.CORPUS_FOOTER_PREFIX))
            .count()
        )
        assert non_footer_flagged == 0, (sf_dir, non_footer_flagged)
