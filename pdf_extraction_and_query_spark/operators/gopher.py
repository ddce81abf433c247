"""Full Gopher quality-rule verdict (Rae et al. 2021, appendix A1.1 —
public) over the documents table.

The reference repo has no curation surface (its quality gates stop at file
validation, src/document_processing/job_validator.py); this belongs to the
LLM-data-pipeline family the build adds on top of SURVEY §2.  It composes
with (but does not replace) the narrower ``textstats.text_quality``
heuristics and the ``repetition.repetition_metrics`` profile:

* :func:`gopher_rules` — the paper's per-document rules: word-count bounds,
  mean-word-length bounds, symbol-to-word ratio (hash/ellipsis), bullet-
  start and ellipsis-end line fractions, alpha-word fraction, required-
  stopword presence, and the duplicate-line / duplicate-line-character
  fractions.
* :func:`gopher_verdict` — the full filter: the rules verdict AND the
  published per-n repetition thresholds applied to
  ``repetition_metrics``'s long rows.

Determinism contract (constants in ``contract``): every fraction is exact
integer ``*_e6`` fixed-point (mean word length ``*_e2``), denominators
guarded with ``greatest(_, 1)``; required-stopword presence is a per-line
bitmask OR-folded per document (``bit_or`` + ``bit_count`` agree across
engines); duplicate-line fractions follow repetition_metrics' convention
(a line with cnt >= 2 contributes ALL its occurrences).

Scale shape (10^12 docs):
  * ONE corpus-sized exchange for the whole rule set: the (doc_id, line)
    hash-agg (map-side combined).  Every per-line regexp feature is
    computed AFTER that group — once per DISTINCT line, not per
    occurrence.  The per-doc rollup is a second exchange, but it is keyed
    doc_id over the already-reduced distinct-line rows and every aggregate
    (sums, bit_or) combines map-side, so it moves at most one partial row
    per (task, doc) — never line-sized data.  (Partitioning on
    (doc_id, line) does NOT satisfy a doc_id clustering — superset keys
    scatter a doc's lines across tasks — hence the second exchange is
    structural, not an oversight.)
  * text never crosses an exchange wider than one line.
  * :func:`gopher_verdict` joins two doc_id-keyed aggregates (the rules
    pass and the n-gram pass); the n-gram evidence is corpus-derived, so
    the two passes cannot share a scan — the join is the composition
    price, both sides already reduced to one row per doc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import contract as C
from .util import fan_out


def _stop_mask(line: Column) -> Column:
    """Bitmask of which GOPHER_REQ_STOPWORDS occur in the line — distinct
    powers of two summed == bitwise OR within one line; bit_or folds lines
    into the per-doc mask."""
    terms = [
        (F.regexp_count(line, F.lit(rf"(?i)\b{w}\b")) > 0).cast("long")
        * F.lit(1 << i)
        for i, w in enumerate(C.GOPHER_REQ_STOPWORDS)
    ]
    mask = terms[0]
    for t in terms[1:]:
        mask = mask + t
    return mask


def gopher_rules(docs: DataFrame) -> DataFrame:
    """Per-document Gopher rule metrics + flags, one row per doc that has
    at least one non-empty line.  All eight paper rules plus the two
    duplicate-line rules, exact integer arithmetic throughout."""
    lines = (
        fan_out(docs)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.explode(F.split("text", "\n")).alias("line"),
        )
        .where(F.trim("line") != "")
    )
    g = lines.groupBy("doc_id", "line").agg(
        F.count("*").cast("long").alias("cnt")
    )
    ln = F.col("line")
    feat = g.select(
        "doc_id",
        "cnt",
        F.length(ln).cast("long").alias("chars"),
        F.length(F.regexp_replace(ln, r"\s", "")).cast("long").alias("nonspace"),
        F.size(F.split(F.trim(ln), C.WS_SPLIT_RE)).cast("long").alias("words"),
        F.regexp_count(ln, F.lit(C.GOPHER_ALPHA_WORD_RE))
        .cast("long")
        .alias("alpha_words"),
        F.regexp_count(ln, F.lit(C.GOPHER_SYMBOL_RE)).cast("long").alias("symbols"),
        (F.regexp_count(ln, F.lit(C.GOPHER_BULLET_RE)) > 0)
        .cast("long")
        .alias("bullet"),
        (F.regexp_count(ln, F.lit(C.GOPHER_ELLIPSIS_LINE_RE)) > 0)
        .cast("long")
        .alias("ell"),
        _stop_mask(ln).alias("stop_mask"),
    )
    dup = F.col("cnt") >= 2
    per = feat.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_lines"),
        F.sum(F.col("cnt") * F.col("words")).cast("long").alias("n_words"),
        F.sum(F.col("cnt") * F.col("nonspace")).cast("long").alias("nonspace_chars"),
        F.sum(F.col("cnt") * F.col("chars")).cast("long").alias("line_chars"),
        F.sum(F.col("cnt") * F.col("alpha_words")).cast("long").alias("n_alpha_words"),
        F.sum(F.col("cnt") * F.col("symbols")).cast("long").alias("n_symbols"),
        F.sum(F.col("cnt") * F.col("bullet")).cast("long").alias("bullet_lines"),
        F.sum(F.col("cnt") * F.col("ell")).cast("long").alias("ellipsis_lines"),
        F.sum(F.when(dup, F.col("cnt")).otherwise(0)).cast("long").alias("dup_lines"),
        F.sum(F.when(dup, F.col("cnt") * F.col("chars")).otherwise(0))
        .cast("long")
        .alias("dup_line_chars"),
        F.bit_count(F.bit_or("stop_mask").cast("long"))
        .cast("long")
        .alias("n_req_stopwords"),
    )
    m = per.select(
        "*",
        F.expr("(100 * nonspace_chars) div greatest(n_words, 1)")
        .cast("long")
        .alias("mean_word_len_e2"),
        F.expr("(1000000 * n_symbols) div greatest(n_words, 1)")
        .cast("long")
        .alias("symbol_frac_e6"),
        F.expr("(1000000 * bullet_lines) div greatest(n_lines, 1)")
        .cast("long")
        .alias("bullet_frac_e6"),
        F.expr("(1000000 * ellipsis_lines) div greatest(n_lines, 1)")
        .cast("long")
        .alias("ellipsis_frac_e6"),
        F.expr("(1000000 * n_alpha_words) div greatest(n_words, 1)")
        .cast("long")
        .alias("alpha_frac_e6"),
        F.expr("(1000000 * dup_lines) div greatest(n_lines, 1)")
        .cast("long")
        .alias("dup_line_frac_e6"),
        F.expr("(1000000 * dup_line_chars) div greatest(line_chars, 1)")
        .cast("long")
        .alias("dup_line_char_frac_e6"),
    )
    flags = m.select(
        "doc_id",
        "n_lines",
        "n_words",
        "mean_word_len_e2",
        "symbol_frac_e6",
        "bullet_frac_e6",
        "ellipsis_frac_e6",
        "alpha_frac_e6",
        "n_req_stopwords",
        "dup_line_frac_e6",
        "dup_line_char_frac_e6",
        (
            (F.col("n_words") >= C.GOPHER_MIN_WORDS)
            & (F.col("n_words") <= C.GOPHER_MAX_WORDS)
        ).alias("wordcount_ok"),
        (
            (F.col("mean_word_len_e2") >= C.GOPHER_MIN_WORD_LEN_E2)
            & (F.col("mean_word_len_e2") <= C.GOPHER_MAX_WORD_LEN_E2)
        ).alias("wordlen_ok"),
        (F.col("symbol_frac_e6") <= C.GOPHER_SYMBOL_MAX_E6).alias("symbol_ok"),
        (F.col("bullet_frac_e6") <= C.GOPHER_BULLET_MAX_E6).alias("bullet_ok"),
        (F.col("ellipsis_frac_e6") <= C.GOPHER_ELLIPSIS_MAX_E6).alias(
            "ellipsis_ok"
        ),
        (F.col("alpha_frac_e6") >= C.GOPHER_ALPHA_MIN_E6).alias("alpha_ok"),
        (F.col("n_req_stopwords") >= C.GOPHER_MIN_REQ_STOPWORDS).alias("stops_ok"),
        (F.col("dup_line_frac_e6") <= C.GOPHER_DUP_LINE_MAX_E6).alias(
            "dup_line_ok"
        ),
        (F.col("dup_line_char_frac_e6") <= C.GOPHER_DUP_LINE_CHAR_MAX_E6).alias(
            "dup_line_char_ok"
        ),
    )
    return flags.withColumn(
        "passes_gopher",
        F.col("wordcount_ok")
        & F.col("wordlen_ok")
        & F.col("symbol_ok")
        & F.col("bullet_ok")
        & F.col("ellipsis_ok")
        & F.col("alpha_ok")
        & F.col("stops_ok")
        & F.col("dup_line_ok")
        & F.col("dup_line_char_ok"),
    )


def gopher_verdict(docs: DataFrame) -> DataFrame:
    """The complete Gopher filter: :func:`gopher_rules`' composite verdict
    AND the published per-n repetition thresholds over
    ``repetition_metrics``.  A doc missing an n-gram row (shorter than n
    words) passes that rule vacuously — no evidence of repetition."""
    from .repetition import repetition_metrics

    conds = [
        F.coalesce(
            F.min(F.when(F.col("n") == n, F.col("top_frac_e6") <= thr)),
            F.lit(True),
        ).alias(f"top{n}_ok")
        for n, thr in sorted(C.GOPHER_TOP_NGRAM_MAX_E6.items())
    ] + [
        F.coalesce(
            F.min(F.when(F.col("n") == n, F.col("dup_frac_e6") <= thr)),
            F.lit(True),
        ).alias(f"dup{n}_ok")
        for n, thr in sorted(C.GOPHER_DUP_NGRAM_MAX_E6.items())
    ]
    rep_ok = repetition_metrics(docs).groupBy("doc_id").agg(*conds)
    flag_names = [f"top{n}_ok" for n in sorted(C.GOPHER_TOP_NGRAM_MAX_E6)] + [
        f"dup{n}_ok" for n in sorted(C.GOPHER_DUP_NGRAM_MAX_E6)
    ]
    out = (
        gopher_rules(docs)
        .select("doc_id", F.col("passes_gopher").alias("passes_rules"))
        .join(rep_ok, "doc_id", "left")
    )
    # left-join miss (doc shorter than every n) => vacuous pass
    filled = [F.coalesce(F.col(f), F.lit(True)).alias(f) for f in flag_names]
    out = out.select("doc_id", "passes_rules", *filled)
    rep_all = F.col(flag_names[0])
    for f in flag_names[1:]:
        rep_all = rep_all & F.col(f)
    return out.select(
        "doc_id",
        "passes_rules",
        *flag_names,
        rep_all.alias("passes_repetition"),
        (F.col("passes_rules") & rep_all).alias("passes_gopher"),
    )
