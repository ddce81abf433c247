"""source_quality_report semantics: cross-source dup attribution, the
gopher-absent-doc convention (no non-empty line => fails), and the
integer-ratio arithmetic."""

from pyspark.sql import Row

from pdf_extraction_and_query_spark.operators.stats import (
    source_quality_report,
)

# A passes-gopher text needs >= GOPHER_MIN_WORDS words, stopwords, etc. —
# too heavy to synthesize here; these tests pin the REPORT arithmetic, not
# the gopher thresholds (tests/test_gopher.py owns those), so every doc
# below fails gopher and the pass counts are 0.
_ARTICLE = "the quick brown fox and that dog were with it from mirror copy"


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, source=s, lang=lg, text=t) for i, s, lg, t in rows]
    )


def test_dup_attributed_to_both_sources(spark):
    rows = [
        (1, "feedA", "en", _ARTICLE),
        (2, "feedB", "en", _ARTICLE),     # exact mirror under another source
        (3, "feedB", "de", "unique text entirely different"),
    ]
    out = {r["source"]: r for r in source_quality_report(_docs(spark, rows)).collect()}
    assert out["feedA"]["n_exact_dups"] == 1          # its only doc is mirrored
    assert out["feedA"]["dup_rate_e6"] == 1_000_000
    assert out["feedB"]["n_exact_dups"] == 1          # the mirror copy, not the unique doc
    assert out["feedB"]["dup_rate_e6"] == 500_000
    assert out["feedB"]["n_langs"] == 2


def test_normalized_dup_and_token_stats(spark):
    # whitespace/case-normalized texts hash identically (the exact_dedup _norm)
    rows = [
        (1, "s", "en", "Hello   World"),
        (2, "s", "en", "hello world"),
        (3, "s", "en", "three tokens here"),
    ]
    out = source_quality_report(_docs(spark, rows)).collect()[0]
    assert out["n_exact_dups"] == 2
    assert out["n_docs"] == 3
    assert out["n_tokens"] == 2 + 2 + 3
    assert out["mean_tokens"] == 7 // 3


def test_empty_doc_counts_and_fails_gopher(spark):
    # an all-whitespace doc has no non-empty line: absent from gopher_rules,
    # must still count in volume and count as a gopher FAIL (not vacuous pass)
    rows = [(1, "s", "en", "   \n  "), (2, "s", "en", "some words here")]
    out = source_quality_report(_docs(spark, rows)).collect()[0]
    assert out["n_docs"] == 2
    assert out["n_gopher_pass"] == 0
    assert out["gopher_pass_rate_e6"] == 0


def test_whitespace_only_doc_has_zero_tokens(spark):
    rows = [(1, "s", "en", "   \n  "), (2, "s", "en", "a b c")]
    out = source_quality_report(_docs(spark, rows)).collect()[0]
    assert out["n_tokens"] == 3 and out["mean_tokens"] == 1
