"""Text-analysis operators over a documents table (doc_id, text, ...).

All pure JVM column expressions (whole-stage-codegen friendly — no Python in
the hot path); each has a DuckDB oracle twin in ``plans/registry.py`` built
from the same ``contract`` constants.

Reference parity: cleaning composition mirrors
``src/preprocessing/text_cleaner.py:30-105`` (see core/textclean.py for the
exact-Python kernel); quality/token/langid/fingerprint are the
training-data-pipeline extensions the north rule asks for beyond the
reference's own surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import contract as C


def marked_raw(doc_id: Column, text: Column) -> Column:
    """Deterministically inject page markers / blank-line runs / padding into
    a plain-text doc so the cleaning operators have structure to remove.
    Same recipe as the oracle's ``MARKED_RAW_SQL``."""
    nl = F.lit("\n")
    page_no = (doc_id % 90 + 1).cast("string")
    # built from the PASSED column (an F.expr body would hard-code the
    # column name and silently ignore a differently-named input)
    body = F.replace(text, F.lit(" table "), F.lit("  table\n\n\n\n "))
    return F.concat(
        F.lit("--- Page "), page_no, F.lit(" ---"), nl,
        F.lit("  "), body, nl, nl, nl, nl,
        F.lit("----  page 7  ----"), nl,
        F.lit("  tail  text  "),
    )


def clean_expr(raw: Column) -> Column:
    """Reference cleaning composition as one vectorized expression chain:
    page markers -> collapse space runs -> cap blank lines -> trim lines."""
    c = F.regexp_replace(raw, C.PAGE_MARKER_RE, "")
    c = F.regexp_replace(c, C.SPACE_RUN_RE, " ")
    c = F.regexp_replace(c, C.BLANK_RUN_RE, "\n\n")
    # NB: `lambda x: F.trim(x)` — passing F.trim directly would make
    # transform() call the 2-arg (element, index) form, i.e. trim-by-chars
    return F.array_join(F.transform(F.split(c, "\n"), lambda x: F.trim(x)), "\n")


def clean_text(docs: DataFrame) -> DataFrame:
    raw = marked_raw(F.col("doc_id"), F.col("text"))
    return docs.select(
        "doc_id",
        clean_expr(raw).alias("cleaned"),
    )


def content_loss(docs: DataFrame) -> DataFrame:
    """Content-loss validation (text_cleaner.py:77-105): pct of
    non-whitespace chars removed by cleaning, + the >10% warning flag."""
    raw = marked_raw(F.col("doc_id"), F.col("text"))
    nonspace = lambda c: F.length(F.regexp_replace(c, r"\s", ""))
    orig_len = nonspace(raw)
    clean_len = nonspace(clean_expr(raw))
    loss = F.round((F.lit(1.0) - clean_len / orig_len) * 100, 4)
    return docs.select(
        "doc_id",
        orig_len.cast("long").alias("orig_nonspace"),
        clean_len.cast("long").alias("clean_nonspace"),
        loss.alias("loss_pct"),
        (loss > 10.0).alias("loss_warning"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens + sentence count per doc."""
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(t), C.WS_SPLIT_RE)).cast("long").alias("ws_tokens"),
        F.regexp_count(t, F.lit(C.TOKEN_RE)).cast("long").alias("re_tokens"),
        F.regexp_count(t, F.lit(C.SENT_END_RE)).cast("long").alias("sentences"),
        F.length(t).cast("long").alias("n_chars_calc"),
    )


def text_quality(docs: DataFrame) -> DataFrame:
    """Quality heuristics: length, punctuation density, stopword ratio,
    mean word length — the standard pre-training corpus filters."""
    t = F.col("text")
    n_chars = F.length(t)
    words = F.size(F.split(F.trim(t), C.WS_SPLIT_RE))
    stops = F.regexp_count(t, F.lit(C.QUALITY_STOPWORD_RE))
    punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    return docs.select(
        "doc_id",
        words.cast("long").alias("n_words"),
        stops.cast("long").alias("n_stopwords"),
        F.round(stops / words, 6).alias("stopword_ratio"),
        F.round(punct / n_chars, 6).alias("punct_ratio"),
        F.round(alpha / words, 4).alias("mean_word_len"),
        ((words >= 10) & (stops / words <= 0.5)).alias("passes_filter"),
    )


def _lang_pred(t: Column):
    """(hits dict, pred Column): the language-ID argmax — shared by
    :func:`lang_id` and :func:`langid_confusion` so the evaluation can
    never drift from the classifier it evaluates."""
    hits = {lang: F.regexp_count(t, F.lit(rx)) for lang, rx in C.LANG_STOPWORD_RE.items()}
    best = F.greatest(*hits.values())
    pred = F.when(F.regexp_count(t, F.lit(C.CJK_RE)) > 0, F.lit("zh"))
    for lang in C.LANG_ORDER:
        pred = pred.when(hits[lang] == best, F.lit(lang))
    return hits, pred.otherwise(F.lit("und"))


def lang_id(docs: DataFrame) -> DataFrame:
    """N-gram/function-word language ID. Deterministic argmax with
    LANG_ORDER tie-break; any CJK char short-circuits to 'zh'."""
    hits, pred = _lang_pred(F.col("text"))
    cols = [hits[lang].cast("long").alias(f"hits_{lang}") for lang in C.LANG_ORDER]
    return docs.select("doc_id", *cols, pred.alias("pred_lang"))


def langid_confusion(docs: DataFrame) -> DataFrame:
    """Confusion matrix of the language-ID heuristic against the corpus
    label: (lang, pred_lang, n_docs, share_e6, correct) — the evaluation
    every classifier in the curation stack owes its user (the
    quality_classify_stats / knn_classify_accuracy precedent).

    Scale shape: one narrow scan computes the prediction inline (the
    SHARED :func:`_lang_pred` expressions — never a self-join back onto
    the corpus), one map-side-combined hash agg on the bounded
    (lang, pred) key, per-truth totals folded back by a broadcast join
    over the |langs|^2 matrix."""
    _, pred = _lang_pred(F.col("text"))
    m = docs.select("lang", pred.alias("pred_lang")).groupBy(
        "lang", "pred_lang"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    tot = m.groupBy("lang").agg(F.sum("n_docs").cast("long").alias("t"))
    return (
        m.join(F.broadcast(tot), "lang")
        .select(
            "lang",
            "pred_lang",
            "n_docs",
            F.expr("(1000000 * n_docs) div t").cast("long").alias("share_e6"),
            (F.col("lang") == F.col("pred_lang")).alias("correct"),
        )
    )


def poly_hash(col: Column) -> Column:
    """Polynomial rolling hash over unicode codepoints, mod HASH_MOD —
    exact int64 arithmetic, byte-identical across engines. A '#' sentinel is
    prepended so empty strings hash like any other value (split('', '')
    edge cases differ across engines)."""
    return F.aggregate(
        F.transform(F.split(F.concat(F.lit("#"), col), ""), F.ascii),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * C.HASH_BASE + x.cast("long")) % C.HASH_MOD,
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprints: md5 + polynomial rolling hash of the
    whitespace-normalized lowercased text."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), C.WS_SPLIT_RE, " "))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        poly_hash(norm).alias("fp_poly"),
    )


def vocab_topk(docs: DataFrame, k: int = C.VOCAB_TOPK) -> DataFrame:
    """Global vocabulary report: the K most frequent lowercase whitespace
    tokens with document frequency. Deterministic order: (n_tokens DESC,
    token ASC) — ties broken lexically so both engines emit the same rows.

    Scale: explode -> groupBy(token) is ONE shuffle with map-side partial
    aggregation, so a stopword appearing 10^11 times moves one partial row
    per map task, not 10^11 rows; the final top-K is
    TakeOrderedAndProject (no global sort materialization)."""
    # plain token explode: deliberately not fan_out-guarded (PLANS.md #13 —
    # the guard's exchanges cost more than single-task tokenization saves)
    tok = docs.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), C.WS_SPLIT_RE)
        ).alias("token"),
    ).where(F.col("token") != "")
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_tokens").desc(), F.col("token").asc())
        .limit(k)
        .select(
            "token",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_docs").cast("long").alias("n_docs"),
        )
    )


def pii_raw(doc_id: Column, text: Column) -> Column:
    """Deterministically inject an email + URL derived from doc_id (the
    synthetic corpus carries no PII — same inject-then-operate idiom as
    ``marked_raw``; the oracle builds the identical string)."""
    d = doc_id.cast("string")
    return F.concat(
        text,
        F.lit(" contact user"), d, F.lit("@example.com or see https://docs.example.com/d/"), d,
        F.lit(" for details"),
    )


def redact_pii(docs: DataFrame) -> DataFrame:
    """PII scrub: replace emails/URLs with redaction tokens and count what
    was removed — pure codegen regexp expressions, no Python in the path.
    URL first: the email pattern would otherwise eat 'https://u@host' forms
    differently across engines; order is part of the contract."""
    raw = pii_raw(F.col("doc_id"), F.col("text"))
    n_urls = F.regexp_count(raw, F.lit(C.PII_URL_RE))
    n_emails = F.regexp_count(
        F.regexp_replace(raw, C.PII_URL_RE, C.PII_URL_TOKEN),
        F.lit(C.PII_EMAIL_RE),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(raw, C.PII_URL_RE, C.PII_URL_TOKEN),
        C.PII_EMAIL_RE,
        C.PII_EMAIL_TOKEN,
    )
    return docs.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_urls.cast("long").alias("n_urls"),
        redacted.alias("redacted"),
    )


def lm_fluency(docs: DataFrame, prepared: DataFrame | None = None) -> DataFrame:
    """Corpus-trained bigram LM fluency score — the KenLM-style perplexity
    filter's exact-arithmetic analog: rare token transitions score low.

    Model: MLE bigram probabilities trained on the scored corpus itself
    (self-scoring, the standard first pass before an external LM exists);
    P_e6(w2|w1) = (1e6 * count(w1 w2)) div count(w1 *). Per doc the score
    is the ARITHMETIC mean of its bigram probabilities (fixed-point e6) —
    perplexity's geometric mean needs logs, which are banned by the
    cross-engine determinism contract (see the BM25 idf note in contract);
    the arithmetic mean ranks the same tail of improbable-transition docs.
    Docs with fewer than two tokens emit no row.

    Scale: bigram-count aggregation is ONE stream shuffle with map-side
    combine (a hot bigram moves one partial per map task); the left-token
    totals derive from the already-aggregated bigram table (vocab-sized,
    broadcast); scoring re-joins the stream to the counts on (w1, w2) and
    the per-doc mean is a doc_id hash-agg.

    ``prepared`` (optional): an already-tokenized ``(doc_id, words)``
    frame carrying the :func:`~..operators.repetition._words` contract —
    the multi-signal curation plans materialize ONE such projection and
    feed every word-keyed signal from it instead of re-scanning the
    documents source per signal (PLANS.md #44)."""
    from .repetition import _words
    from .util import fan_out

    w = (
        prepared.select("doc_id", "words")
        if prepared is not None
        else fan_out(docs).select("doc_id", _words(F.col("text")).alias("words"))
    )
    bi = (
        w.where(F.size("words") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(words) - 1), "
                    "i -> struct(words[i-1] as w1, words[i] as w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    c2 = bi.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    scored = (
        bi.join(c2, ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .select("doc_id", F.expr("(1000000 * c2) div c1").alias("p_e6"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.expr("sum(p_e6) div count(*)").cast("long").alias("fluency_e6"),
    ).select(F.col("doc_id").cast("long").alias("doc_id"), "n_bigrams", "fluency_e6")


def ccnet_buckets(
    docs: DataFrame, prepared: DataFrame | None = None
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., LREC 2020 — public
    literature): split each language's documents into head / middle / tail
    thirds by LM score, the standard pre-training quality stratification
    (head trains, tail drops, middle is the dial).

    Model: the :func:`lm_fluency` bigram MLE trained PER LANGUAGE (CCNet
    trains one KenLM per language) — same exact fixed-point arithmetic,
    keys extended with ``lang``.  Bucket thirds are derived by COUNTING
    (the :func:`~..operators.stats.short_outliers` pattern): per-(lang,
    fluency value) counts — one map-side-combined shuffle whose result is
    distinct-value-sized — then a cumulative sum over those tiny rows
    yields the two cutoffs per language; no corpus row ever sorts.

    Cutoff rule (deterministic, integer-only, ties share a bucket): order
    values DESC within a language; ``cut1`` = the largest value whose
    cumulative count reaches ``ceil(n/3)`` (integer form ``(n + 2) div
    3``), ``cut2`` likewise at ``ceil(2n/3)``; bucket = head iff
    ``fluency_e6 >= cut1``, middle iff ``>= cut2``, else tail.  Docs with
    fewer than two tokens emit no row (no score exists).

    Factored as ``ccnet_score(docs, ccnet_model(docs))`` so the streaming
    maintainer (streaming/quality.py) can score new documents under a
    FROZEN model — same seam discipline as the frozen IVF centroids / PQ
    codebook / SQ bounds.

    ``prepared``: optional shared ``(doc_id, lang, words)`` projection
    (see :func:`lm_fluency`)."""
    return ccnet_score(docs, ccnet_model(docs, prepared), prepared)


def _ccnet_bigrams(docs: DataFrame, prepared: DataFrame | None = None) -> DataFrame:
    """(doc_id, lang, w1, w2) — the per-language bigram stream."""
    from .repetition import _words
    from .util import fan_out

    w = (
        prepared.select("doc_id", "lang", "words")
        if prepared is not None
        else fan_out(docs).select(
            "doc_id", "lang", _words(F.col("text")).alias("words")
        )
    )
    return (
        w.where(F.size("words") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(words) - 1), "
                    "i -> struct(words[i-1] as w1, words[i] as w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "lang", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )


def _ccnet_fluency(bi: DataFrame, c2: DataFrame, c1: DataFrame) -> DataFrame:
    """(doc_id, lang, fluency_e6) of a bigram stream under a GIVEN model —
    transitions the model never saw are dropped by the inner join (the
    mean runs over known transitions only; a doc with NO known transition
    emits no row — the frozen-LM scoring rule, pinned in
    tests/test_streaming_quality.py)."""
    return (
        bi.join(c2, ["lang", "w1", "w2"])
        .join(F.broadcast(c1), ["lang", "w1"])
        .select("doc_id", "lang", F.expr("(1000000 * c2) div c1").alias("p_e6"))
        .groupBy("doc_id", "lang")
        .agg(F.expr("sum(p_e6) div count(*)").cast("long").alias("fluency_e6"))
    )


def ccnet_model(
    docs: DataFrame, prepared: DataFrame | None = None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the CCNet model on ``docs``: per-language bigram counts
    (c2, c1) and the per-language third cutoffs (cuts) derived from the
    training corpus's own score distribution."""
    from pyspark.sql import Window

    bi = _ccnet_bigrams(docs, prepared)
    c2 = bi.groupBy("lang", "w1", "w2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("lang", "w1").agg(F.sum("c2").alias("c1"))
    fl = _ccnet_fluency(bi, c2, c1)
    # thirds by counting: the window runs over per-(lang, value) aggregates
    # (distinct-value-sized, never corpus-sized); values are distinct within
    # a language so ROWS == RANGE framing
    by_val = fl.groupBy("lang", "fluency_e6").agg(F.count("*").alias("cnt"))
    cum_w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("fluency_e6"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = by_val.withColumn("cum", F.sum("cnt").over(cum_w)).withColumn(
        "total", F.sum("cnt").over(Window.partitionBy("lang"))
    )
    cuts = cum.groupBy("lang").agg(
        F.max(
            F.when(F.expr("cum >= (total + 2) div 3"), F.col("fluency_e6"))
        ).alias("cut1"),
        F.max(
            F.when(F.expr("cum >= (2 * total + 2) div 3"), F.col("fluency_e6"))
        ).alias("cut2"),
    )
    return c2, c1, cuts


def ccnet_score(
    docs: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame],
    prepared: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, lang, fluency_e6, bucket) of ``docs`` under ``model`` —
    per-document pure given the model, so scoring distributes over any
    corpus split (the streaming maintainer's equality).  A doc in a
    language absent from the model drops (no cutoffs exist for it)."""
    c2, c1, cuts = model
    fl = _ccnet_fluency(_ccnet_bigrams(docs, prepared), c2, c1)
    return fl.join(F.broadcast(cuts), "lang").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        "fluency_e6",
        F.when(F.col("fluency_e6") >= F.col("cut1"), F.lit("head"))
        .when(F.col("fluency_e6") >= F.col("cut2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def ccnet_bucket_stats(docs: DataFrame) -> DataFrame:
    """Per-(lang, bucket) rollup of :func:`ccnet_buckets` — doc counts and
    the fluency range each bucket spans (the report a curation run reads
    before choosing which thirds to keep). One tiny hash-agg past the
    bucketing plan."""
    return (
        ccnet_buckets(docs)
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("fluency_e6").alias("min_fluency_e6"),
            F.max("fluency_e6").alias("max_fluency_e6"),
        )
    )


def length_histogram(docs: DataFrame) -> DataFrame:
    """Corpus length profile: fixed-width histogram over text length —
    the DB-stats companion a curation run reads before picking filter
    thresholds. One hash-agg shuffle on the bin id."""
    bin_id = F.floor(F.length("text") / C.HIST_BIN_CHARS)
    return (
        docs.select(bin_id.cast("long").alias("bin_id"))
        .groupBy("bin_id")
        .agg(F.count("*").alias("n_docs"))
        .select(
            "bin_id",
            (F.col("bin_id") * C.HIST_BIN_CHARS).cast("long").alias("lo_chars"),
            ((F.col("bin_id") + 1) * C.HIST_BIN_CHARS - 1).cast("long").alias("hi_chars"),
            F.col("n_docs").cast("long").alias("n_docs"),
        )
    )


def kn_continuation(docs: DataFrame, topk: int = C.VOCAB_TOPK) -> DataFrame:
    """Kneser-Ney continuation statistics (Kneser & Ney 1995 — the
    smoothing family every n-gram LM pipeline trains): per token, how
    many DISTINCT left contexts it follows (`cont_cnt` — KN's
    "versatility": 'francisco' is frequent but follows only 'san') and
    how many distinct right contexts it opens (`right_types`, the KN
    normalizer), plus the continuation probability
    ``p_cont_e6 = cont_cnt * 1e6 div total_bigram_types`` and the raw
    unigram count for contrast.  Report = top-``topk`` tokens by
    (cont_cnt desc, token asc) — the vocab_topk convention.

    Scale shape: two map-side-combined corpus-stream aggregates (the
    bigram-type table and the unigram counts — different keys, so two
    exchanges is the floor); everything after is vocab-sized: cont /
    right_types fold the ALREADY-AGGREGATED type table, the type total
    rides a broadcast 1-row aggregate, and the report is
    TakeOrderedAndProject."""
    from .repetition import _words
    from .util import fan_out

    w = fan_out(docs).select("doc_id", _words(F.col("text")).alias("words"))
    bi = w.where(F.size("words") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(words) - 1), "
                "i -> struct(words[i-1] as w1, words[i] as w2))"
            )
        ).alias("b")
    ).select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    types = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    uni = (
        w.select(F.explode("words").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("unigram_cnt"))
    )
    cont = types.groupBy(F.col("w2").alias("token")).agg(
        F.count(F.lit(1)).cast("long").alias("cont_cnt")
    )
    rt = types.groupBy(F.col("w1").alias("token")).agg(
        F.count(F.lit(1)).cast("long").alias("right_types")
    )
    tot = types.agg(F.count(F.lit(1)).alias("total_types"))
    out = (
        uni.join(cont, "token", "left")
        .join(rt, "token", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "token",
            "unigram_cnt",
            F.coalesce("cont_cnt", F.lit(0)).cast("long").alias("cont_cnt"),
            F.coalesce("right_types", F.lit(0))
            .cast("long")
            .alias("right_types"),
            F.expr(
                "coalesce(cont_cnt, 0) * 1000000L DIV total_types"
            ).alias("p_cont_e6"),
        )
    )
    return out.orderBy(F.desc("cont_cnt"), F.asc("token")).limit(topk)


def readability(docs: DataFrame) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade, exact-integer fixed
    point — the classic curation signal complementing the Gopher rules
    (a near-unreadable doc passes word-count gates but scores deeply
    negative here).  Deterministic syllable proxy: VOWEL GROUPS
    (``[aeiouy]+`` runs over the lowercased text) — the standard
    approximation, and exactly replayable in SQL, unlike dictionary
    syllabification.

      flesch_e3   = 206835 − 1015·words div sentences
                            − 84600·syllables div words
      fk_grade_e3 = 390·words div sentences
                    + 11800·syllables div words − 15590

    Sentences = ``[.!?]+`` runs (min 1); words = whitespace tokens
    (docs with zero words emit no row).  Zero-shuffle pure-codegen
    projection — regexp counts and integer arithmetic only."""
    t = F.col("text")
    n_sent = F.greatest(
        F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1)
    ).cast("long")
    n_words = F.size(F.split(F.trim(t), C.WS_SPLIT_RE)).cast("long")
    n_syll = F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+")).cast("long")
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_sent.alias("n_sentences"),
        n_words.alias("n_words"),
        n_syll.alias("n_syllables"),
    ).where(F.col("n_words") > 0)
    return base.select(
        "doc_id",
        "n_sentences",
        "n_words",
        "n_syllables",
        F.expr(
            "206835 - 1015 * n_words DIV n_sentences"
            " - 84600 * n_syllables DIV n_words"
        ).cast("long").alias("flesch_e3"),
        F.expr(
            "390 * n_words DIV n_sentences"
            " + 11800 * n_syllables DIV n_words - 15590"
        ).cast("long").alias("fk_grade_e3"),
    )


def c4_page_lines(doc_id: Column, text: Column) -> Column:
    """Lift a single-line word-soup doc into a lined page (array of line
    strings) by PURE word-index arithmetic — the C4-family fixture
    generator (contract C4_* note; the ``marked_raw`` /
    ``htmlcorpus.html_from_text`` meet-in-the-middle pattern).  Line i =
    the next C4_WORDS_PER_LINE words, prefixed the literal word
    'javascript' on the (doc_id*C4_JS_MULT + i) % C4_JS_EVERY == 0
    cadence, suffixed '.' unless (doc_id + i) % C4_PUNCT_EVERY == 0;
    docs on the LOREM/BRACE cadences gain a 'lorem ipsum' / '{' tail
    line.  Every C4 rule fires on real fixture rows and the DuckDB
    oracle re-derives the page from ``documents`` directly."""
    words = F.when(F.trim(text) == "", F.array()).otherwise(
        F.split(F.trim(text), C.WS_SPLIT_RE)
    )
    did = doc_id.cast("long")
    L = C.C4_WORDS_PER_LINE
    # materialized via select in callers: HOF lambdas re-evaluate captured
    # expressions per element, so callers pass a *column* of words
    n = F.size(words)
    n_lines = F.ceil(n / F.lit(L)).cast("int")
    body = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.concat(
            F.when(
                (did * C.C4_JS_MULT + i) % C.C4_JS_EVERY == 0,
                F.lit("javascript "),
            ).otherwise(F.lit("")),
            F.array_join(F.slice(words, i * L + 1, L), " "),
            F.when((did + i) % C.C4_PUNCT_EVERY != 0, F.lit(".")).otherwise(
                F.lit("")
            ),
        ),
    )
    # sequence(0, -1) counts DOWN (contract sharp edge) — guard empty docs
    body = F.when(n_lines >= 1, body).otherwise(
        F.array().cast("array<string>")
    )
    lorem = F.when(
        did % C.C4_LOREM_EVERY == 0, F.array(F.lit("lorem ipsum"))
    ).otherwise(F.array().cast("array<string>"))
    brace = F.when(
        did % C.C4_BRACE_EVERY == 0, F.array(F.lit("{"))
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(body, lorem, brace)


def c4_pages(docs: DataFrame) -> DataFrame:
    """(doc_id, page): the lined fixture page — one narrow codegen pass,
    no shuffle."""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.array_join(
            c4_page_lines(F.col("doc_id"), F.col("text")), "\n"
        ).alias("page"),
    )


def _c4_line_flags(lines: Column):
    """(short, nopunct, js, kept) predicates over a line element — the C4
    keep rule (Raffel et al. 2020 §2.2, public): >= C4_MIN_LINE_WORDS
    words AND terminal punctuation AND no 'javascript'."""
    def wc(x):
        return F.when(F.trim(x) == "", F.lit(0)).otherwise(
            F.size(F.split(F.trim(x), C.WS_SPLIT_RE))
        )

    short = lambda x: wc(x) < C.C4_MIN_LINE_WORDS  # noqa: E731
    nopunct = lambda x: ~x.rlike(C.C4_TERMINAL_RE)  # noqa: E731
    js = lambda x: F.contains(F.lower(x), F.lit("javascript"))  # noqa: E731
    kept = lambda x: ~short(x) & ~nopunct(x) & ~js(x)  # noqa: E731
    return short, nopunct, js, kept


def c4_line_stats_expr(pages: DataFrame) -> DataFrame:
    """Per-document C4 line-filter attrition report over a lined page
    table (doc_id, page): line totals, how many lines each rule rejects
    (a line can fail several — the counts attribute independently), the
    surviving line count, the doc-level lorem-ipsum / brace flags, and
    the C4 page verdict ``keep_doc`` (>= C4_MIN_KEPT kept lines AND
    neither page flag).

    Scale shape: ONE narrow pass, no shuffle — the line array
    materializes once per row and the per-rule counts are
    size(filter(...)) expressions over it (interpreted HOFs: ~n_lines
    element evaluations per rule, bounded by page size; the corpus-scale
    alternative is the same arithmetic in a mapInPandas batch — the
    expression form here IS the semantic spec, PLANS.md #14).

    Empty pages (a doc with no words and no lorem/brace trailer) emit NO
    row: split('', '\\n') would otherwise count one phantom empty line,
    while the oracle's range(0, n_body) unnest omits the doc entirely
    (round-4 ADVICE.md) — the line table of an empty page has zero rows
    on both engines."""
    short, nopunct, js, kept = _c4_line_flags(F.col("lines"))
    d = pages.where(F.col("page") != "").select(
        "doc_id",
        F.split(F.col("page"), "\n").alias("lines"),
        F.col("page"),
    )
    ls = F.col("lines")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(ls).cast("long").alias("n_lines"),
        F.size(F.filter(ls, short)).cast("long").alias("n_short"),
        F.size(F.filter(ls, nopunct)).cast("long").alias("n_nopunct"),
        F.size(F.filter(ls, js)).cast("long").alias("n_js"),
        F.size(F.filter(ls, kept)).cast("long").alias("n_kept"),
        F.contains(F.lower(F.col("page")), F.lit("lorem ipsum")).alias(
            "has_lorem"
        ),
        F.contains(F.col("page"), F.lit("{")).alias("has_brace"),
    ).withColumn(
        "keep_doc",
        (F.col("n_kept") >= C.C4_MIN_KEPT)
        & ~F.col("has_lorem")
        & ~F.col("has_brace"),
    )


def c4_clean_expr(pages: DataFrame) -> DataFrame:
    """The cleaning itself: for pages that pass the C4 doc verdict, the
    page rewritten to only its kept lines (newline-joined) — what
    actually enters the training corpus.  Same one-pass narrow shape as
    :func:`c4_line_stats`; rejected docs (and empty pages — see the
    stats twin's docstring) emit no row."""
    short, nopunct, js, kept = _c4_line_flags(F.col("lines"))
    d = pages.where(F.col("page") != "").select(
        "doc_id",
        F.split(F.col("page"), "\n").alias("lines"),
        F.col("page"),
    )
    keep_lines = F.filter(F.col("lines"), kept)
    out = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(keep_lines).cast("long").alias("n_kept"),
        F.array_join(keep_lines, "\n").alias("c4_text"),
        F.contains(F.lower(F.col("page")), F.lit("lorem ipsum")).alias("_l"),
        F.contains(F.col("page"), F.lit("{")).alias("_b"),
    )
    return out.where(
        (F.col("n_kept") >= C.C4_MIN_KEPT) & ~F.col("_l") & ~F.col("_b")
    ).drop("_l", "_b")


def vg_first_occurrence(docs: DataFrame) -> DataFrame:
    """(token, first_doc): one row per vocabulary TYPE — the min-merged
    summary the streaming maintainer keeps (min is associative AND
    idempotent, so the live merge is replay-proof)."""
    tok = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), C.WS_SPLIT_RE)
        ).alias("token"),
    ).where(F.col("token") != "")
    return tok.groupBy("token").agg(
        F.min("doc_id").cast("long").alias("first_doc")
    )


def _vg_thresholds():
    return F.explode(
        F.array(*[F.lit(t).cast("long") for t in C.VG_THRESHOLDS])
    ).alias("threshold")


def vg_vocab_curve(first: DataFrame) -> DataFrame:
    """(threshold, n_vocab) from a first-occurrence table."""
    return (
        first.select("first_doc", _vg_thresholds())
        .where(F.col("first_doc") < F.col("threshold"))
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vocab"))
    )


def vg_mass(docs: DataFrame) -> DataFrame:
    """(threshold, n_docs, n_tokens): prefix-corpus doc/token mass —
    narrow per-doc counts (same token rule as the explode, as an
    expression) + the bounded threshold explode; sum-mergeable across
    disjoint batches."""
    per_doc = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), C.WS_SPLIT_RE),
                lambda x: x != F.lit(""),
            )
        )
        .cast("long")
        .alias("n_tok"),
    )
    return (
        per_doc.select("doc_id", "n_tok", _vg_thresholds())
        .where(F.col("doc_id") < F.col("threshold"))
        .groupBy("threshold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )


def vocab_growth(docs: DataFrame) -> DataFrame:
    """Heaps-law vocabulary-growth curve (contract VG note): per doc_id
    threshold, how many documents / token occurrences the prefix corpus
    holds and how large its distinct vocabulary is — the diagnostic that
    says whether a corpus is still contributing new types or re-treading
    its vocabulary (token rule shared with :func:`vocab_topk`:
    lowercase whitespace tokens, empties dropped).

    Scale shape: the vocabulary reduces to one (token, first_doc) row
    per TYPE via a map-side-combined min agg (never an ordered scan —
    cumulative distinct at threshold t == types whose first occurrence
    lands before t); the doc side reduces to per-doc scalar counts
    before the bounded threshold explode; the final join carries
    |VG_THRESHOLDS| rows."""
    return vg_mass(docs).join(
        vg_vocab_curve(vg_first_occurrence(docs)), "threshold"
    ).select("threshold", "n_docs", "n_tokens", "n_vocab")


def _c4_flags_arrow(lines_flat):
    """Per-line C4 flags over a FLAT pyarrow string array — true
    vectorized C++ kernels (pyarrow.compute), never a Python-level loop:
    word count = count of \\S+ runs (identical to the expression twin's
    trim/split/empty-guard on any string), terminal punctuation =
    C4_TERMINAL_RE match, javascript = literal containment on the
    lowered line."""
    import pyarrow.compute as pc

    wc = pc.count_substring_regex(lines_flat, r"\S+")
    short = pc.less(wc, C.C4_MIN_LINE_WORDS)
    nopunct = pc.invert(
        pc.match_substring_regex(lines_flat, C.C4_TERMINAL_RE)
    )
    js = pc.match_substring(pc.utf8_lower(lines_flat), "javascript")
    kept = pc.and_(
        pc.and_(pc.invert(short), pc.invert(nopunct)), pc.invert(js)
    )
    return short, nopunct, js, kept


def _c4_kernel(batch_iter, want_text: bool):
    """Shared mapInPandas body: one Arrow pass per batch — split pages to
    a flat line array, per-line flags via pyarrow.compute, per-doc sums
    via np.add.reduceat over the list offsets.  Bit-equality with the
    expression twins is pinned in tests/test_c4.py."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    for pdf in batch_iter:
        if pdf.empty:
            continue
        pages = pa.array(pdf["page"], type=pa.string())
        lists = pc.split_pattern(pages, "\n")
        offs = lists.offsets.to_numpy()
        flat = pc.list_flatten(lists)
        short, nopunct, js, kept = _c4_flags_arrow(flat)
        seg = offs[:-1]
        n_lines = np.diff(offs)

        def _per_doc(mask):
            return np.add.reduceat(
                mask.to_numpy(zero_copy_only=False).astype(np.int64), seg
            ) * (n_lines > 0)

        ns, np_, nj, nk = map(_per_doc, (short, nopunct, js, kept))
        has_lorem = pc.match_substring(
            pc.utf8_lower(pages), "lorem ipsum"
        ).to_numpy(zero_copy_only=False)
        has_brace = pc.match_substring(pages, "{").to_numpy(
            zero_copy_only=False
        )
        keep_doc = (nk >= C.C4_MIN_KEPT) & ~has_lorem & ~has_brace
        out = {
            "doc_id": pdf["doc_id"].to_numpy(),
            "n_lines": n_lines.astype("int64"),
            "n_short": ns,
            "n_nopunct": np_,
            "n_js": nj,
            "n_kept": nk,
            "has_lorem": has_lorem,
            "has_brace": has_brace,
            "keep_doc": keep_doc,
        }
        if want_text:
            flat_np = flat.to_numpy(zero_copy_only=False)
            kept_np = kept.to_numpy(zero_copy_only=False)
            texts = [
                "\n".join(flat_np[s:e][kept_np[s:e]])
                for s, e in zip(offs[:-1], offs[1:])
            ]
            out["c4_text"] = texts
        yield pd.DataFrame(out)


def c4_line_stats(pages: DataFrame) -> DataFrame:
    """Corpus-scale form of :func:`c4_line_stats_expr` — same columns,
    same values (bit-equality tested), one narrow ``mapInPandas`` Arrow
    pass instead of interpreted higher-order functions (PLANS.md #14:
    measured 121.8 s -> Arrow at 500k stress docs; the expression twin
    remains the semantic spec)."""
    schema = (
        "doc_id long, n_lines long, n_short long, n_nopunct long, "
        "n_js long, n_kept long, has_lorem boolean, has_brace boolean, "
        "keep_doc boolean"
    )
    # empty pages emit no row, matching the expression twin + oracle
    src = pages.where(F.col("page") != "").select(
        F.col("doc_id").cast("long").alias("doc_id"), "page"
    )
    return src.mapInPandas(lambda it: _c4_kernel(it, False), schema)


def c4_clean(pages: DataFrame) -> DataFrame:
    """Corpus-scale form of :func:`c4_clean_expr` (same Arrow pass, plus
    the kept-text reconstruction)."""
    schema = (
        "doc_id long, n_lines long, n_short long, n_nopunct long, "
        "n_js long, n_kept long, has_lorem boolean, has_brace boolean, "
        "keep_doc boolean, c4_text string"
    )
    src = pages.where(F.col("page") != "").select(
        F.col("doc_id").cast("long").alias("doc_id"), "page"
    )
    out = src.mapInPandas(lambda it: _c4_kernel(it, True), schema)
    return out.where("keep_doc").select("doc_id", "n_kept", "c4_text")
