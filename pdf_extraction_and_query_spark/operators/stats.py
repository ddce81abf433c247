"""Corpus statistics / rollup operators.

Reference parity: DB stats (pgvector_client.py:379-401,
rag_service.py:302-326) and the evaluation aggregates
(scripts/analyze_results.py:40-60) — re-expressed as single-shuffle hash
aggregates with map-side partial combine.

Determinism: no floating sums across rows (order-dependent) — counts,
integer sums, min/max, and ratios of exact integers only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_stats(documents: DataFrame) -> DataFrame:
    """Per (lang, source): doc count, char sum, avg chars."""
    return (
        documents.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.round(F.sum("n_chars") / F.count("*"), 4).alias("avg_chars"),
        )
    )


def _delete_id_list(session):
    """The shared demo delete list (contract.DELETE_EVERY/DELETE_BOUND) —
    one rule for delete_documents, cascade_delete, and both oracle twins."""
    from .. import contract as C

    return session.range(0, C.DELETE_BOUND, C.DELETE_EVERY).select(
        F.col("id").alias("doc_id")
    )


def delete_documents(documents: DataFrame, spark=None) -> DataFrame:
    """Bulk delete by id list (reference: pgvector_client.py:318-348 IN-list
    delete; :285-316 cascade) — expressed as an ANTI-join against the
    broadcast delete list, the overwrite-table pattern for immutable
    storage."""
    session = spark or documents.sparkSession
    ids = _delete_id_list(session)
    return (
        documents.join(F.broadcast(ids), "doc_id", "anti")
        .select("doc_id", "n_chars")
    )


def cascade_delete(documents: DataFrame, spans_df: DataFrame) -> DataFrame:
    """Cascade delete (reference: pgvector_client.py:285-316 deletes
    documents AND their chunks in one transaction): the SAME broadcast delete
    list anti-joined against every dependent table — here the documents table
    and the span-derived media table. Output: surviving docs with their
    surviving media count (cross-table evidence the cascade hit both sides).
    Delete list: the shared rule of :func:`_delete_id_list`. NB: the
    span-side doc ids are numeric strings (the driver-corpus lift), cast to
    long for the anti-join."""
    from ..core.docpipe import MEDIA_KINDS
    from .extraction import explode_spans

    session = documents.sparkSession
    ids = _delete_id_list(session)
    kept_docs = documents.join(F.broadcast(ids), "doc_id", "anti")
    kept_media = (
        explode_spans(spans_df)
        .where(F.col("kind").isin(*MEDIA_KINDS))
        .select(F.col("doc_id").cast("long").alias("doc_id"))
        .join(F.broadcast(ids), "doc_id", "anti")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_media"))
    )
    return kept_docs.join(kept_media, "doc_id", "left").select(
        "doc_id",
        "n_chars",
        F.coalesce("n_media", F.lit(0)).cast("long").alias("n_media"),
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: per-user event stream split at inactivity gaps >
    ``gap_minutes`` — lag window + running sum of session starts (the
    standard pattern; one shuffle on user_id). Timestamps exported as epoch
    seconds (exact integers) for the cross-engine oracle."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = (
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > gap_minutes * 60)
    ).cast("long")
    with_sess = events.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.unix_timestamp(F.min("ts")).alias("start_epoch"),
            F.unix_timestamp(F.max("ts")).alias("end_epoch"),
        )
    )


def events_rollup(events: DataFrame) -> DataFrame:
    """Hourly per-type rollup over the events table: count + min/max value
    (exact aggregates only; no order-dependent float sums). The hour bucket
    is epoch arithmetic, NOT date_format — formatted timestamps depend on
    the session timezone, and the harness session's TZ is not ours to pin."""
    hour = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    return (
        events.groupBy(F.col("event_type"), hour.alias("hour_epoch"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
    )


def short_outliers(documents: DataFrame, low_micro: int = 100_000) -> DataFrame:
    """Flag the shortest ~``low_micro``/1e6 of documents per language — the
    percentile-cutoff quality filter, computed the scale-correct way.

    A naive ``percent_rank() OVER (PARTITION BY lang ORDER BY n_chars)``
    puts each language stratum into ONE window task (a 10^11-doc 'en'
    stratum would be a single sort) — instead the exact quantile is
    derived by COUNTING: (1) per-(lang, n_chars) counts — one map-side-
    combined shuffle whose result is distinct-length-sized, not corpus-
    sized; (2) a cumulative sum over those tiny aggregated rows gives the
    exact cutoff value per language; (3) the cutoffs broadcast back onto
    the corpus — no row ever sorts, every stage is parallel.

    Cutoff rule (deterministic, integer-only): ``cutoff_chars`` = the
    smallest length whose cumulative count reaches ``ceil(n_lang *
    low_micro / 1e6)``; a doc is an outlier iff ``n_chars <
    cutoff_chars`` (strictly below keeps the rule stable under ties —
    every doc of the cutoff length survives)."""
    from pyspark.sql import Window

    by_len = documents.groupBy("lang", "n_chars").agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = by_len.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "total", F.sum("cnt").over(Window.partitionBy("lang"))
    )
    need = F.ceil(F.col("total") * low_micro / 1_000_000)
    cutoffs = (
        cum.where(F.col("cum") >= need)
        .groupBy("lang")
        .agg(F.min("n_chars").alias("cutoff_chars"))
    )
    return documents.join(F.broadcast(cutoffs), "lang").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("cutoff_chars").cast("long").alias("cutoff_chars"),
        (F.col("n_chars") < F.col("cutoff_chars")).alias("is_short_outlier"),
    )


def dedup_stats(documents: DataFrame) -> DataFrame:
    """Corpus duplication-rate rollup over the exact-dedup groups: group
    count, doc count, duplicate count (docs beyond each group's keeper)
    and the fixed-point duplication rate — the one-row report a curation
    run logs per wave."""
    from .dedup import exact_dup_groups

    g = exact_dup_groups(documents)
    return g.agg(
        F.count("*").alias("n_groups"),
        F.sum("n_docs").alias("n_docs"),
        (F.sum("n_docs") - F.count("*")).alias("n_dup_docs"),
        F.floor(
            (F.sum("n_docs") - F.count("*")) * 1_000_000 / F.sum("n_docs")
        ).cast("long").alias("dup_rate_micro"),
    ).select(
        F.col("n_groups").cast("long").alias("n_groups"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_dup_docs").cast("long").alias("n_dup_docs"),
        "dup_rate_micro",
    )


def source_quality_report(docs: DataFrame) -> DataFrame:
    """Per-SOURCE corpus-health dashboard — the row a pipeline owner reads
    to decide which feed to throttle, re-crawl, or drop: volume (docs,
    tokens, mean tokens), language spread, Gopher-rule pass rate, and
    exact-duplicate rate (corpus-wide evidence attributed back to each
    source, so a mirror site shows a high dup rate even when its copies
    live under OTHER sources' keepers).

    Composition of three already-oracle-pinned derivations (gopher_rules
    flags, exact_dup_groups' md5 grouping, the FTS token count) rolled to
    one row per source — counts and integer ratios only.

    Scale shape (10^12 docs, 10^7 sources): the per-doc frame is derived
    ONCE (narrow projections — the dup-group size is a count window over
    the single content-hash exchange, not a second scan + join-back);
    gopher flags join doc-keyed; the final rollup is one map-side-combined
    hash agg on source.  Total: gopher's two exchanges + hash window +
    flags join + source agg — nothing corpus-sized crosses twice."""
    from .. import contract as C
    from ..operators.dedup import _norm
    from ..operators.gopher import gopher_rules
    from pyspark.sql import Window

    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        "lang",
        # regexp_count of \S+ runs == whitespace token count, exact for
        # empty / all-whitespace docs too (size(split()) would count the
        # empty fragments a lone newline leaves behind)
        F.regexp_count(F.col("text"), F.lit(r"\S+"))
        .cast("long")
        .alias("n_tokens"),
        F.md5(_norm(F.col("text"))).alias("grp_hash"),
    )
    sized = base.withColumn(
        "gn", F.count("*").over(Window.partitionBy("grp_hash"))
    )
    flags = gopher_rules(docs).select("doc_id", "passes_gopher")
    j = sized.join(flags, "doc_id", "left").select(
        "source",
        "lang",
        "n_tokens",
        (F.col("gn") >= 2).cast("long").alias("is_dup"),
        F.coalesce(F.col("passes_gopher"), F.lit(False))
        .cast("long")
        .alias("ok"),
    )
    per = j.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum("ok").cast("long").alias("n_gopher_pass"),
        F.sum("is_dup").cast("long").alias("n_exact_dups"),
    )
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr("n_tokens div n_docs").cast("long").alias("mean_tokens"),
        "n_langs",
        "n_gopher_pass",
        F.expr("(1000000 * n_gopher_pass) div n_docs")
        .cast("long")
        .alias("gopher_pass_rate_e6"),
        "n_exact_dups",
        F.expr("(1000000 * n_exact_dups) div n_docs")
        .cast("long")
        .alias("dup_rate_e6"),
    )


def shuffle_skew_report(documents: DataFrame, key: str = "source") -> DataFrame:
    """Partition-key skew pre-flight: per ``key`` value, the load it
    would place on a shuffle partitioned by that key — doc count, char
    mass, corpus share, load factor (1e6 = perfectly balanced; the
    ivf_stats convention), the CEIL salt factor that would level a hot
    key back to mean load, and a >=2x-mean skew flag.  This is the
    report an operator reads BEFORE picking a partition key or a
    salting factor for a 100-TB ingest (the north rule's "skew handled
    explicitly" made first-class and queryable; the extraction plan's
    whale routing in plans/extract.py is the same decision applied to
    per-doc span counts).

    Scale shape: ONE map-side-combined key aggregate (the corpus is
    touched once); the grand totals ride a single-partition window over
    the ALREADY-AGGREGATED n_keys-row frame (never corpus rows — the
    short_outliers counting precedent).  int64 bound: char_mass * n_keys
    * 1e6 — exact while total corpus chars * keys stays under ~9e18;
    past that compute load from share_micro.
    """
    from pyspark.sql import Window

    k = documents.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    w = Window.partitionBy()
    k = k.withColumn("grand_total", F.sum("total_chars").over(w)).withColumn(
        "n_keys", F.count(F.lit(1)).over(w)
    )
    return k.select(
        key,
        "n_docs",
        "total_chars",
        F.expr("total_chars * 1000000L DIV grand_total").alias("share_micro"),
        F.expr("total_chars * n_keys * 1000000L DIV grand_total").alias(
            "load_micro"
        ),
        F.expr(
            "(total_chars * n_keys + grand_total - 1) DIV grand_total"
        ).alias("salt_factor"),
        F.expr(
            "total_chars * n_keys * 1000000L DIV grand_total >= 2000000"
        ).alias("is_skewed"),
    )


_AGREE_SIGNALS = ("cls", "flu", "rd", "cc")
_AGREE_PAIRS = (
    ("cls", "flu"),
    ("cls", "rd"),
    ("cls", "cc"),
    ("flu", "rd"),
    ("flu", "cc"),
    ("rd", "cc"),
)


def quality_agreement(documents: DataFrame) -> DataFrame:
    """Inter-signal agreement matrix for the curation stack: for every
    pair of binary quality signals — classifier keep (`cls`), bigram-LM
    fluency >= CURATE_MIN_FLUENCY_E6 (`flu`), Flesch readability >=
    READABILITY_MIN_E3 (`rd`), CCNet bucket != tail (`cc`) — the 2x2
    contingency counts, raw agreement, and Cohen's kappa (chance-
    corrected, exact e6 fixed point).  Near-zero kappa between two
    signals means they filter INDEPENDENT failure modes (keep both);
    kappa near 1e6 means one is redundant — the measurement that turns
    "seven signals" from a list into a designed ensemble.

    Population = docs where every signal is defined (>= 2 tokens, the
    fluency requirement; inner joins).  Kappa's possibly-negative
    division uses the positive-dividend shift so Spark DIV == DuckDB
    floor; pe == 1e6 (two constant signals) reports kappa 0.

    Scale shape: the four signal subplans are the production operators
    themselves; their join collapses to a skinny per-doc flag frame
    (localCheckpointed — 1 + 24 sums consume it), the whole matrix is
    ONE map-side-combined aggregate row, and the 6-row report is a
    stack() over that row — nothing after the joins is corpus-sized."""
    from .. import contract as C
    from .classifier import quality_classify
    from .textstats import ccnet_buckets, lm_fluency, readability

    cls = quality_classify(documents).select(
        "doc_id", (F.col("label") == "keep").cast("long").alias("cls")
    )
    flu = lm_fluency(documents).select(
        "doc_id",
        (F.col("fluency_e6") >= C.CURATE_MIN_FLUENCY_E6)
        .cast("long")
        .alias("flu"),
    )
    rd = readability(documents).select(
        "doc_id",
        (F.col("flesch_e3") >= C.READABILITY_MIN_E3).cast("long").alias("rd"),
    )
    cc = ccnet_buckets(documents).select(
        "doc_id", (F.col("bucket") != "tail").cast("long").alias("cc")
    )
    base = (
        cls.join(flu, "doc_id").join(rd, "doc_id").join(cc, "doc_id")
    ).localCheckpoint()
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for a, b in _AGREE_PAIRS:
        aggs += [
            F.sum(F.col(a) * F.col(b)).cast("long").alias(f"{a}_{b}_11"),
            F.sum((1 - F.col(a)) * (1 - F.col(b)))
            .cast("long")
            .alias(f"{a}_{b}_00"),
            F.sum(F.col(a) * (1 - F.col(b)))
            .cast("long")
            .alias(f"{a}_{b}_10"),
            F.sum((1 - F.col(a)) * F.col(b))
            .cast("long")
            .alias(f"{a}_{b}_01"),
        ]
    row = base.agg(*aggs)
    stack = ", ".join(
        f"'{a}', '{b}', {a}_{b}_11, {a}_{b}_00, {a}_{b}_10, {a}_{b}_01"
        for a, b in _AGREE_PAIRS
    )
    stacked = row.selectExpr(
        "n",
        f"stack({len(_AGREE_PAIRS)}, {stack})"
        " as (sig_a, sig_b, n11, n00, n10, n01)",
    )
    staged = stacked.select(
        "sig_a",
        "sig_b",
        "n",
        "n11",
        "n00",
        "n10",
        "n01",
        F.expr("(n11 + n00) * 1000000L DIV n").alias("po"),
        F.expr("(n11 + n10) * 1000000L DIV n").alias("pa"),
        F.expr("(n11 + n01) * 1000000L DIV n").alias("pb"),
    ).withColumn(
        "pe",
        F.expr(
            "(pa * pb) DIV 1000000L"
            " + ((1000000L - pa) * (1000000L - pb)) DIV 1000000L"
        ),
    )
    return staged.select(
        "sig_a",
        "sig_b",
        "n",
        "n11",
        "n00",
        "n10",
        "n01",
        F.col("po").alias("agree_e6"),
        # kappa = (po - pe) / (1 - pe); numerator may be negative, so the
        # positive-dividend shift keeps Spark DIV == DuckDB floor
        F.expr(
            "CASE WHEN pe = 1000000L THEN 0L"
            " ELSE ((po - pe) * 1000000L + 1000000000000L * (1000000L - pe))"
            "      DIV (1000000L - pe) - 1000000000000L END"
        ).cast("long").alias("kappa_e6"),
    )


def corpus_datacard(docs: DataFrame) -> DataFrame:
    """One-row corpus data card (the Datasheets-for-Datasets /
    Data-Cards summary a corpus release ships): size, language/source
    breadth, the dominant language, exact-duplicate rate, the quality
    pass rate (the curate_corpus word/stopword rule), token mass and
    distinct vocabulary — every number re-uses the EXACT arithmetic of
    its standalone operator (exact_dedup's normalized md5,
    curate_corpus's predicate, vocab_topk's token rule), so the card can
    never disagree with the operators it summarizes (the
    curation_funnel discipline).

    Scale shape: one narrow scan reduces every doc to scalar columns,
    localCheckpointed ONCE and consumed by the card aggregate and the
    top-language rollup (independent planning, PLANS.md #11); the
    vocabulary count is its own token-explode agg (map-side combined);
    all three 1-row/1-value frames meet in broadcast crossJoins."""
    from .. import contract as C
    from .dedup import _norm

    t = F.col("text")
    words = F.size(F.split(F.trim(t), C.WS_SPLIT_RE))
    stops = F.regexp_count(t, F.lit(C.QUALITY_STOPWORD_RE))
    base = docs.select(
        "lang",
        "source",
        words.cast("long").alias("n_tok"),
        ((words >= 10) & (stops / words <= 0.5)).cast("long").alias("q"),
        F.md5(_norm(t)).alias("h"),
    ).localCheckpoint(eager=True)
    card = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.count_distinct("source").cast("long").alias("n_sources"),
        F.count_distinct("h").cast("long").alias("n_unique_content"),
        F.sum("q").cast("long").alias("n_quality"),
    )
    top = (
        base.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("lang"))
        .limit(1)
        .select(F.col("lang").alias("top_lang"))
    )
    vocab = (
        docs.select(
            F.explode(
                F.split(F.trim(F.lower(t)), C.WS_SPLIT_RE)
            ).alias("token")
        )
        .where(F.col("token") != "")
        .agg(F.count_distinct("token").cast("long").alias("vocab_size"))
    )
    return (
        card.crossJoin(F.broadcast(top))
        .crossJoin(F.broadcast(vocab))
        .select(
            "n_docs",
            "n_tokens",
            "n_langs",
            "n_sources",
            "top_lang",
            "vocab_size",
            F.expr(
                "(1000000 * (n_docs - n_unique_content)) div n_docs"
            )
            .cast("long")
            .alias("dup_rate_e6"),
            F.expr("(1000000 * n_quality) div n_docs")
            .cast("long")
            .alias("quality_rate_e6"),
        )
    )
