"""Distributed BPE tokenizer — trained byte-pair merges over the corpus
word stream, plus encoding surfaces (per-doc token counts, trained subword
vocabulary).

Reference parity: the reference counts tokens with tiktoken at chunk time
(src/chunking/text_chunker.py's length_function is the only tokenizer
surface); a trained subword tokenizer is the training-data-pipeline
extension the task brief asks for beyond whitespace/regex counting
(textstats.token_counts) — the real pipeline tokenizes with a BPE vocab
trained ON the corpus before packing (packing.shard_pack /
pack_sequences consume token counts).

Algorithm (Sennrich et al. 2016, ACL — public literature): start from
characters, repeat: count adjacent symbol pairs weighted by word
frequency, merge the most frequent pair everywhere, for BPE_ROUNDS rounds.
Determinism contract: top pair by (freq DESC, pair ASC — binary UTF-8
order in both engines); merge application is greedy left-to-right
non-overlapping, which equals string ``replace`` because every symbol is
ONE codepoint (merged symbols take private-use markers
chr(BPE_MARKER_BASE+t)).  The whole loop is therefore a pure function of
the corpus, replayable in ANSI SQL by unrolling BPE_ROUNDS rounds (the
kmeans/PageRank unrolled-oracle precedent in plans/registry.py).

100-TB shape:
  * training runs over the DISTINCT-WORD aggregate (one corpus shuffle
    with map-side combine — a stopword appearing 10^11 times moves one
    partial per map task), localCheckpointed once; the corpus is read
    EXACTLY ONCE (tests delete the source under a live loop to prove it).
  * pair counts are DELTA-MAINTAINED (round-4 verdict Next #5): the full
    pair explode runs once at init; each merge round then (a) takes the
    top pair from the materialized pair-count table (TakeOrdered over a
    pair-table-sized frame, driver gets ONE row), (b) filters the word
    table to the words CONTAINING the merged pair (narrow contains scan,
    no explode), (c) pair-explodes only that affected slice twice (old
    form negative, rewritten form positive) and folds the signed delta
    into the pair table, (d) rewrites only affected words.  Identity:
    pc + Σ_aff(pairs(new) − pairs(old)) == Σ_w pairs(new) — bit-equal to
    a full recount, equality-tested in tests/test_bpe.py.  Per-round work
    is a contains-filter over the compact word table plus an explode of
    the affected slice — NOT a full-table pair explode — so a realistic
    ~30k-merge vocab pays 30k cheap rounds instead of 30k corpus-pair
    recounts; word and pair tables are localCheckpointed per round
    (lineage O(1), the CC/kmeans idiom).
  * encoding is pure whole-stage-codegen string ops — the merge chain is
    BPE_ROUNDS nested ``replace`` calls applied to the full lowercased
    text (pairs never contain whitespace, so occurrences cannot straddle
    word boundaries; per-word and whole-text application provably agree —
    unit-tested against a pure-Python reference implementation).  No
    shuffle, no Python worker.
  * vocabulary is one more hash agg over the encoded word table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import contract as C
from .repetition import _words

# training excludes words that collide with the reserved marker range
_MARKER_CLASS = "[%s-%s]" % (
    chr(C.BPE_MARKER_BASE),
    chr(C.BPE_MARKER_BASE + 63),
)


def _marker(t: int) -> str:
    return chr(C.BPE_MARKER_BASE + t)


def word_counts(docs: DataFrame) -> DataFrame:
    """The (sym, cnt) distinct-word frequency table — ONE corpus shuffle
    with map-side partial aggregation; everything downstream (training
    rounds, vocabulary) iterates over this compact aggregate."""
    return (
        docs.select(F.explode(_words(F.col("text"))).alias("sym"))
        .groupBy("sym")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(~F.col("sym").rlike(_MARKER_CLASS))
    )


def _pair_explode(wc: DataFrame) -> DataFrame:
    """Adjacent symbol pairs of each word, weighted by word frequency.
    Every symbol is one codepoint, so pair i = substr(sym, i, 2).  The
    length guard keeps sequence() from counting down (contract sharp
    edge); the oracle's generate_series(1, 0) is empty so it needs none."""
    return wc.where(F.length("sym") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("sym") - 1),
                lambda i: F.col("sym").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "cnt",
    )


def _init_state(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(word table, pair-count table), both eagerly localCheckpointed —
    the LAST moment the corpus is read; every merge round iterates over
    these compact materialized aggregates only (tests delete the source
    files after this call to prove it)."""
    wc = word_counts(docs).localCheckpoint()
    pc = (
        _pair_explode(wc)
        .groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("freq"))
        .localCheckpoint()
    )
    return wc, pc


def _merge_rounds(
    wc: DataFrame, pc: DataFrame, rounds: int, start: int = 0
) -> list[tuple[str, int]]:
    """Delta-maintained merge loop over a prepared (wc, pc) state — see
    the module docstring's 100-TB shape.  ``start`` is the round index of
    the first merge (marker numbering must match the encode chain)."""
    merges: list[tuple[str, int]] = []
    for t in range(start, start + rounds):
        top = (
            pc.where(F.col("freq") > 0)
            .orderBy(F.col("freq").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top:
            raise ValueError(
                f"bpe_train: corpus exhausted after {t} merges "
                f"(needs at least one 2-symbol word per round)"
            )
        pair, freq = top[0]["pair"], int(top[0]["freq"])
        merges.append((pair, freq))
        mark = F.lit(_marker(t))
        # affected slice: only words that CONTAIN the merged pair change
        # any adjacency; everything else keeps its counts verbatim.
        # Checkpoints are LAZY (eager=False): the ONLY action per round is
        # the next round's top-1 collect, which materializes the previous
        # round's state in one cascade — still O(1) lineage, 1 job/round.
        aff = wc.where(F.contains(F.col("sym"), F.lit(pair))).localCheckpoint(
            eager=False
        )
        new_aff = aff.select(
            F.replace(F.col("sym"), F.lit(pair), mark).alias("sym"), "cnt"
        )
        delta = (
            _pair_explode(new_aff)
            .unionByName(
                _pair_explode(aff).select("pair", (-F.col("cnt")).alias("cnt"))
            )
            .groupBy("pair")
            .agg(F.sum("cnt").cast("long").alias("freq"))
        )
        pc = (
            pc.unionByName(delta)
            .groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("freq"))
            .where(F.col("freq") > 0)
            .localCheckpoint(eager=False)
        )
        # one narrow full-table pass (replace is a no-op off the affected
        # slice) — cheaper than filter+union's two scans of wc
        wc = wc.withColumn(
            "sym", F.replace(F.col("sym"), F.lit(pair), mark)
        ).localCheckpoint(eager=False)
    return merges


def bpe_train(
    docs: DataFrame, rounds: int = C.BPE_ROUNDS
) -> list[tuple[str, int]]:
    """Run ``rounds`` merge rounds; return [(pair, freq)] in round order
    (the merged symbol for round t is _marker(t)).  Driver-side state is
    metadata only — one (pair, freq) row per round.  Pair counts are
    delta-maintained between rounds (module docstring; bit-equal to a
    full per-round recount, equality-tested)."""
    wc, pc = _init_state(docs)
    return _merge_rounds(wc, pc, rounds)


def _bpe_train_recount(
    docs: DataFrame, rounds: int = C.BPE_ROUNDS
) -> list[tuple[str, int]]:
    """The pre-delta reference loop — full pair recount every round.  Kept
    as the semantic spec for the equality test (the brute-twin discipline:
    PLANS.md #14); NOT the production path."""
    wc = word_counts(docs).localCheckpoint()
    merges: list[tuple[str, int]] = []
    for t in range(rounds):
        top = (
            _pair_explode(wc)
            .groupBy("pair")
            .agg(F.sum("cnt").cast("long").alias("freq"))
            .orderBy(F.col("freq").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top:
            raise ValueError(f"corpus exhausted after {t} merges")
        pair, freq = top[0]["pair"], int(top[0]["freq"])
        merges.append((pair, freq))
        wc = wc.withColumn(
            "sym", F.replace(F.col("sym"), F.lit(pair), F.lit(_marker(t)))
        )
    return merges


def _expansions(merges: list[tuple[str, int]]) -> list[str]:
    """Human-readable expansion per round: markers resolve through earlier
    rounds (earlier expansions are already fully resolved, so one pass
    suffices)."""
    exp_of: dict[str, str] = {}
    out = []
    for t, (pair, _) in enumerate(merges):
        exp = "".join(exp_of.get(ch, ch) for ch in pair)
        exp_of[_marker(t)] = exp
        out.append(exp)
    return out


def _merge_chain(col: Column, merges: list[tuple[str, int]]) -> Column:
    """Apply the trained merges in round order — BPE_ROUNDS nested
    replaces, pure codegen."""
    for t, (pair, _) in enumerate(merges):
        col = F.replace(col, F.lit(pair), F.lit(_marker(t)))
    return col


def _expand_chain(col: Column, merges: list[tuple[str, int]]) -> Column:
    """Resolve marker symbols back to readable text — reverse replaces in
    DESCENDING round order (a pair may contain earlier markers)."""
    for t in range(len(merges) - 1, -1, -1):
        col = F.replace(col, F.lit(_marker(t)), F.lit(merges[t][0]))
    return col


def bpe_merges(docs: DataFrame, rounds: int = C.BPE_ROUNDS) -> DataFrame:
    """Driver/oracle surface of training: one row per merge round —
    (round, pair, expansion, freq)."""
    merges = bpe_train(docs, rounds)
    exps = _expansions(merges)
    return docs.sparkSession.createDataFrame(
        [
            (t, merges[t][0], exps[t], merges[t][1])
            for t in range(len(merges))
        ],
        "round long, pair string, expansion string, freq long",
    )


def bpe_token_counts(
    docs: DataFrame, rounds: int = C.BPE_ROUNDS
) -> DataFrame:
    """Per-doc token counts under the trained tokenizer: after the merge
    chain every remaining non-whitespace codepoint is one token.  Applied
    to the full lowercased text (pairs never contain whitespace — see
    module docstring), so the plan is NARROW pure-codegen string ops:
    zero shuffle, no Python worker (plan-asserted in test_bpe)."""
    merges = bpe_train(docs, rounds)
    lt = F.lower(F.col("text"))
    n_chars = F.length(F.regexp_replace(lt, r"\s", "")).cast("long")
    n_bpe = F.length(
        F.regexp_replace(_merge_chain(lt, merges), r"\s", "")
    ).cast("long")
    return docs.select(
        "doc_id",
        F.size(_words(F.col("text"))).cast("long").alias("n_words"),
        n_chars.alias("n_chars"),
        n_bpe.alias("n_bpe_tokens"),
    ).withColumn(
        "compression_micro",
        F.when(
            F.col("n_chars") > 0,
            F.expr("(n_bpe_tokens * 1000000) div n_chars"),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )


def token_fertility(docs: DataFrame, rounds: int = C.BPE_ROUNDS) -> DataFrame:
    """Per-LANGUAGE tokenizer-fertility report — the health metric a
    tokenizer owner checks before committing a vocab to a multilingual
    pretraining run: BPE tokens per word (fertility, fixed-point e3) and
    chars per token, by document language.  High fertility on a language
    means the tokenizer fragments it (its corpus share effectively shrinks
    in token space).

    Same zero-shuffle encode as :func:`bpe_token_counts` (pure-codegen
    nested replaces) with ``lang`` carried through the narrow projection,
    folded by ONE map-side-combined aggregate over ~|langs| groups — the
    corpus never shuffles, only per-language summary rows do."""
    merges = bpe_train(docs, rounds)
    lt = F.lower(F.col("text"))
    per = docs.select(
        "lang",
        F.size(_words(F.col("text"))).cast("long").alias("w"),
        F.length(F.regexp_replace(lt, r"\s", "")).cast("long").alias("ch"),
        F.length(F.regexp_replace(_merge_chain(lt, merges), r"\s", ""))
        .cast("long")
        .alias("tok"),
    )
    return per.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("n_words"),
        F.sum("tok").cast("long").alias("n_bpe_tokens"),
        F.expr("(1000 * sum(tok)) div greatest(sum(w), 1)")
        .cast("long")
        .alias("fertility_e3"),
        F.expr("(1000 * sum(ch)) div greatest(sum(tok), 1)")
        .cast("long")
        .alias("chars_per_token_e3"),
    )


def bpe_vocab(docs: DataFrame, rounds: int = C.BPE_ROUNDS) -> DataFrame:
    """The trained subword vocabulary with corpus frequencies: encode the
    distinct-word table, explode single-codepoint symbols weighted by word
    count, aggregate.  One extra hash agg over the compact word table."""
    merges = bpe_train(docs, rounds)
    wc = word_counts(docs).withColumn(
        "sym", _merge_chain(F.col("sym"), merges)
    )
    toks = wc.where(F.length("sym") >= 1).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("sym")),
                lambda i: F.col("sym").substr(i, F.lit(1)),
            )
        ).alias("sym1"),
        "cnt",
    )
    agg = toks.groupBy("sym1").agg(
        F.sum("cnt").cast("long").alias("n_occurrences")
    )
    return agg.select(
        F.col("sym1").alias("token"),
        _expand_chain(F.col("sym1"), merges).alias("expansion"),
        "n_occurrences",
    )
