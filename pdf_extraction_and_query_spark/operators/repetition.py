"""Repetition-based quality metrics + cross-document duplicated-passage
detection — the two standard repetition filters of an LLM training-data
curation pass (beyond the reference's own surface, which stops at whole-doc
similarity: src/vector_store/pgvector_client.py retrieves, never filters).

Two operator families over the documents table:

* ``repetition_metrics`` — per-document Gopher-style repetition profile
  (Rae et al. 2021, appendix A1.1, public): for small n the fraction of
  characters inside the single most frequent word n-gram, for larger n the
  fraction of characters inside ALL duplicated n-grams.  Standard curation
  practice drops docs whose fractions exceed per-n thresholds; this emits
  the raw fractions so thresholds stay a policy, not a constant baked into
  the engine.
* ``dup_passages`` / ``dup_passage_stats`` — word-granular analog of exact
  substring deduplication (Lee et al. 2022, "Deduplicating Training Data
  Makes Language Models Better", public): any ``DUP_PASSAGE_K``-word
  shingle occurring in >= 2 distinct documents marks its word interval as
  duplicated; overlapping/adjacent intervals merge into maximal passages
  per document (gaps-and-islands over already-aggregated rows).

Determinism contract (constants in ``contract``): everything is exact
integer arithmetic — counts, char lengths, fixed-point ``_e6`` fractions
via integer division (Spark ``div`` == DuckDB ``//`` on the all-positive
operands); the top-gram tie breaks on (count DESC, gram ASC).  Fractions
are capped at 1e6: overlapping occurrences can cover more characters than
the document holds (e.g. "a a a a" has three "a a" bigrams), and published
implementations leave the raw product uncapped — the cap keeps the column a
fraction, and the cap itself is part of the contract.

Scale shape (10^12 docs):
  * ONE corpus-sized shuffle per family: the (doc, n, gram) / (gram)
    hash-agg with map-side partial aggregation.  The n-gram streams for all
    REP_NS are built in a single narrow pass (array-of-struct concat ->
    one explode), not one scan per n.
  * every window runs over already-aggregated rows and partitions by
    (doc_id[, n]) — per-partition size is bounded by one document's
    distinct-gram count, never by the corpus.
  * ``dup_passages``' join of shingle occurrences against the duplicated-
    gram list is a plain equi-join on gram: the duplicated set's size is
    data-dependent (proportional to duplicated content, not corpus size),
    so it is left to AQE to broadcast when small rather than forced.
  * per-(doc_id, n) grouping after the (doc_id, n)-partitioned window
    introduces NO extra exchange (hash partitioning on a subset of the
    grouping keys already satisfies the clustered distribution).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import contract as C
from .util import fan_out


def _words(text: Column) -> Column:
    """Lowercase whitespace word array, empties dropped — the same token
    contract as textstats.vocab_topk / fulltext postings."""
    return F.filter(
        F.split(F.trim(F.lower(text)), C.WS_SPLIT_RE), lambda x: x != ""
    )


def _grams(words: Column, n: int) -> Column:
    """Array of space-joined word n-grams; empty array when the doc is
    shorter than n (the when-guard keeps sequence() from counting down)."""
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - n + 1),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_metrics(docs: DataFrame) -> DataFrame:
    """Per-(doc_id, n) repetition profile, long format:

      top_cnt      occurrences of the most frequent n-gram
      top_frac_e6  min(1e6, 1e6 * top_cnt * chars(top gram) div denom)
      dup_frac_e6  min(1e6, 1e6 * sum(cnt * chars(gram) | cnt>=2) div denom)

    denom = chars of the single-space-joined normalized words (>=1).  Docs
    shorter than n words emit no row for that n (nothing to measure)."""
    w = fan_out(docs).select("doc_id", _words(F.col("text")).alias("words"))
    w = w.select(
        "doc_id",
        "words",
        F.greatest(F.length(F.array_join("words", " ")), F.lit(1)).alias("denom"),
    )
    # NB: the tagging lambda MUST be single-arg — a two-arg lambda makes
    # transform() pass the element INDEX as the second argument (the
    # F.trim trap from contract.py, in closure form)
    def _tag(n: int):
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    per_n = [F.transform(_grams(F.col("words"), n), _tag(n)) for n in C.REP_NS]
    ex = w.select(
        "doc_id", "denom", F.explode(F.concat(*per_n)).alias("s")
    ).select("doc_id", "denom", F.col("s.n").alias("n"), F.col("s.gram").alias("gram"))
    cnt = ex.groupBy("doc_id", "denom", "n", "gram").agg(F.count("*").alias("cnt"))
    win = Window.partitionBy("doc_id", "n").orderBy(F.desc("cnt"), F.asc("gram"))
    r = cnt.withColumn("rn", F.row_number().over(win))
    per = r.groupBy("doc_id", "n", "denom").agg(
        F.max(F.when(F.col("rn") == 1, F.col("cnt"))).alias("top_cnt"),
        F.max(F.when(F.col("rn") == 1, F.length("gram"))).alias("top_chars"),
        F.sum(
            F.when(F.col("cnt") >= 2, F.col("cnt") * F.length("gram")).otherwise(0)
        ).alias("dup_chars"),
    )
    return per.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n").cast("long").alias("n"),
        F.col("top_cnt").cast("long").alias("top_cnt"),
        F.expr("least((1000000 * top_cnt * top_chars) div denom, 1000000)")
        .cast("long")
        .alias("top_frac_e6"),
        F.expr("least((1000000 * dup_chars) div denom, 1000000)")
        .cast("long")
        .alias("dup_frac_e6"),
    )


def _shingle_occurrences(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, nw, start_w, gram) for every k-word shingle, start_w
    1-based.  Narrow: one scan, one explode."""
    w = fan_out(docs).select("doc_id", _words(F.col("text")).alias("words"))
    w = w.select("doc_id", "words", F.size("words").alias("nw")).where(
        F.col("nw") >= k
    )
    sh = w.select(
        "doc_id",
        "nw",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("nw") - k + 1),
                lambda i: F.array_join(F.slice(F.col("words"), i, k), " "),
            )
        ).alias("pos", "gram"),
    )
    return sh.select(
        "doc_id", "nw", (F.col("pos") + 1).alias("start_w"), "gram"
    )


def _merge_islands(occ: DataFrame, k: int) -> DataFrame:
    """Gaps-and-islands merge of duplicated shingle occurrences
    (doc_id, nw, start_w) into maximal intervals: (doc_id, nw, start_word,
    end_word, n_shingles).  Shared by the batch operator and the streaming
    maintainer (streaming/duppassage.py) so both produce structurally
    identical passages."""
    win = Window.partitionBy("doc_id").orderBy("start_w")
    prev = F.lag("start_w").over(win)
    brk = F.when(prev.isNull() | (F.col("start_w") - prev > k), 1).otherwise(0)
    isl = occ.withColumn(
        "island",
        F.sum(brk).over(win.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return isl.groupBy("doc_id", "nw", "island").agg(
        F.min("start_w").alias("start_word"),
        (F.max("start_w") + k - 1).alias("end_word"),
        F.count("*").alias("n_shingles"),
    )


def _stats_from_passages(p: DataFrame) -> DataFrame:
    """Per-doc coverage rollup of a passage frame — the dup_passage_stats
    output shape, shared with the streaming merged reader."""
    per = p.groupBy("doc_id", "nw").agg(
        F.count("*").alias("n_passages"),
        F.sum(F.col("end_word") - F.col("start_word") + 1).alias("dup_words"),
    )
    return per.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_passages").cast("long").alias("n_passages"),
        F.col("dup_words").cast("long").alias("dup_words"),
        F.col("nw").cast("long").alias("total_words"),
        F.expr("(1000000 * dup_words) div nw").cast("long").alias("coverage_e6"),
    )


def _passages(docs: DataFrame, k: int) -> DataFrame:
    """Merged duplicated word intervals per doc: (doc_id, nw, start_word,
    end_word, n_shingles).

    The cross-doc evidence (gram document-frequency >= 2) is derived
    STRUCTURALLY from one shingle stream: dense_rank over doc_id within
    the gram partition, then max-rank over the same partition ==
    count_distinct(doc_id) — two Window ops sharing ONE gram exchange.
    The previous groupBy(gram) + self-join form planned the stream twice
    (two source scans, two gram shuffles of the full occurrence stream —
    the multi-consumer recompute trap, PLANS.md #11/#44); a hot gram
    skews one partition identically under either shape."""
    sh = _shingle_occurrences(docs, k)
    gw = Window.partitionBy("gram")
    ranked = sh.withColumn(
        "_dr", F.dense_rank().over(gw.orderBy("doc_id"))
    ).withColumn("_dfc", F.max("_dr").over(gw))
    occ = ranked.where(F.col("_dfc") >= 2).select("doc_id", "nw", "start_w")
    return _merge_islands(occ, k)


def dup_passages(docs: DataFrame, k: int = C.DUP_PASSAGE_K) -> DataFrame:
    """Maximal duplicated passages (cross-doc k-word shingle evidence),
    one row per (doc_id, passage): passage_seq numbers passages in reading
    order within the doc."""
    p = _passages(docs, k)
    seq = Window.partitionBy("doc_id").orderBy("start_word")
    return p.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.row_number().over(seq).cast("long").alias("passage_seq"),
        F.col("start_word").cast("long").alias("start_word"),
        F.col("end_word").cast("long").alias("end_word"),
        (F.col("end_word") - F.col("start_word") + 1).cast("long").alias("n_words"),
        F.col("n_shingles").cast("long").alias("n_shingles"),
    )


def dup_passage_stats(docs: DataFrame, k: int = C.DUP_PASSAGE_K) -> DataFrame:
    """Per-doc rollup of duplicated coverage — the number a curation run
    thresholds on (only docs that HAVE duplicated passages emit a row;
    absent doc == coverage 0 by contract)."""
    return _stats_from_passages(_passages(docs, k))


def dup_excise(docs: DataFrame, k: int = C.DUP_PASSAGE_K) -> DataFrame:
    """The REWRITE step of exact substring deduplication (Lee et al. 2022
    §4.1, public): remove every duplicated passage from the documents that
    contain one and emit the surviving text.  ``dup_passages`` reports the
    intervals; this operator applies them — the pair is detect + excise,
    the two halves of the published ExactSubstr pipeline.

    Contract: word-granular over the same ``_words`` normalization the
    detection uses (lowercased, whitespace-split — the excised text is the
    NORMALIZED form, exactly the coordinate system ``start_word/end_word``
    live in).  Only affected documents emit a row (the rewrite is a DELTA:
    at 10^12 docs you rewrite the partitions that changed, never the whole
    corpus).  A fully-duplicated document emits ``kept_words = 0,
    text_deduped = ''`` — the caller drops it, the row is the evidence.

    Scale shape:
      * the interval list per doc is tiny (merged maximal passages), so
        the per-doc rollup exchange carries (doc_id, intervals) — never
        words; the words re-derivation is a NARROW second scan joined to
        that data-dependent affected set (AQE broadcasts it when small).
      * intervals from ``_passages`` are disjoint and sorted per doc (the
        gaps-and-islands merge guarantees consecutive islands are >= 2
        words apart), so kept text is the concatenation of the gap slices
        — built with one zip_with over O(n_intervals) slice calls per doc,
        interpreted-HOF cost proportional to passages, NOT words.
    """
    p = _passages(docs, k)
    ivs = p.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("start_word", "end_word"))
        ).alias("ivs")
    )
    words = docs.select(
        "doc_id", _words(F.col("text")).alias("words")
    ).withColumn("nw", F.size("words"))
    j = words.join(ivs, "doc_id")
    # gap g_i between interval i-1 and i: [end_{i-1}+1, start_i - 1],
    # with sentinels 1 and nw at the ends; empty gaps slice to length 0.
    starts = F.concat(
        F.array(F.lit(1)),
        F.transform(F.col("ivs"), lambda iv: iv["end_word"] + 1),
    )
    ends = F.concat(
        F.transform(F.col("ivs"), lambda iv: iv["start_word"] - 1),
        F.array(F.col("nw")),
    )
    kept = F.flatten(
        F.zip_with(
            starts,
            ends,
            lambda s, e: F.slice(
                F.col("words"), s, F.greatest(F.lit(0), e - s + 1)
            ),
        )
    )
    out = j.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("nw").cast("long").alias("total_words"),
        kept.alias("kept"),
    )
    return out.select(
        "doc_id",
        "total_words",
        F.size("kept").cast("long").alias("kept_words"),
        (F.col("total_words") - F.size("kept")).cast("long").alias(
            "removed_words"
        ),
        F.array_join("kept", " ").alias("text_deduped"),
    )
