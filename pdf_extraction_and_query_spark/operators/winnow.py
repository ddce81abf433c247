"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD —
public; the MOSS algorithm).

The reference repo deduplicates nothing (its retrieval layer ranks, never
filters — src/vector_store/pgvector_client.py); winnowing joins the
LLM-data-pipeline dedup family as the member with a LOCAL GUARANTEE the
probabilistic members (MinHash, SimHash, SRP) lack: any substring of at
least t = WINNOW_W + WINNOW_K - 1 shared words produces at least one
shared fingerprint — detection is certain, not expected.  With the
contract constants t = 8 words, the same sensitivity as the
``DUP_PASSAGE_K`` exact-substring detector; winnowing stores ~2/WINNOW_W
fingerprints per token instead of every shingle.

Algorithm (paper §4, "robust winnowing"): hash every word K-gram, slide a
window of W consecutive hashes, in each window select the minimum hash —
rightmost occurrence on ties — and emit the distinct (position, hash)
selections per document.

Determinism contract (constants in ``contract``): word hash =
``textstats.poly_hash`` (codepoint fold mod HASH_MOD); gram hash = the
polynomial fold of the K word hashes (exact int64 — K=4 word hashes
< 1e9+7 keep every intermediate < 2^63 / 31); rightmost-min tie-break =
``min`` over the (hash, -pos) pair, identical lexicographic struct/list
comparison in Spark and DuckDB.

Scale shape (10^12 docs):
  * the interpreted per-char hash fold runs once per DISTINCT WORD
    (vocab-sized), never per token — token rows join the hashed vocab on
    ``word`` (AQE broadcasts the vocab when small; at web scale it is a
    plain shuffle of single-word rows, strictly narrower than
    dup_passages' gram-string exchange).
  * gram hashing is ``lead()`` windows + integer arithmetic — pure
    whole-stage codegen, zero higher-order (interpreted) expressions on
    the hot path; the selection min-window shares the SAME (doc_id, pos)
    sort, so both window passes cost one doc-keyed exchange.
  * per-partition window state is one document's gram stream; the
    selection output is ~2n/W rows per doc before ``distinct``.
  * :func:`winnow_matches` prunes fingerprints with document frequency
    > WINNOW_MAX_DF before the pair join (boilerplate-grade fingerprints
    would otherwise square) — the stop-shingle device of
    ``dedup.ngram_jaccard_pruned``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import contract as C
from .repetition import _words
from .textstats import poly_hash
from .util import fan_out


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp_pos, fp): the distinct winnowing selections per doc.
    ``fp_pos`` is the 1-based word position where the selected K-gram
    starts.  Docs shorter than WINNOW_K words emit no row; docs with
    fewer grams than WINNOW_W get one window covering all grams (the
    frame truncates at the partition end)."""
    tok = fan_out(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(_words(F.col("text"))).alias("pos0", "word"),
    )
    vocab = (
        tok.select("word")
        .distinct()
        .select("word", poly_hash(F.col("word")).alias("wh"))
    )
    th = tok.join(vocab, "word").select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "wh"
    )
    ww = Window.partitionBy("doc_id").orderBy("pos")
    leads = th.select(
        "doc_id",
        "pos",
        "wh",
        *[F.lead("wh", j).over(ww).alias(f"l{j}") for j in range(1, C.WINNOW_K)],
    )
    gexpr = F.col("wh")
    for j in range(1, C.WINNOW_K):
        gexpr = (gexpr * C.HASH_BASE + F.col(f"l{j}")) % C.HASH_MOD
    g = leads.where(F.col(f"l{C.WINNOW_K - 1}").isNotNull()).select(
        "doc_id", "pos", gexpr.cast("long").alias("h")
    )
    win = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, C.WINNOW_W - 1)
    )
    s = g.select(
        "doc_id",
        "pos",
        F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np")))
        .over(win)
        .alias("sel"),
        F.max("pos").over(Window.partitionBy("doc_id")).alias("m"),
    )
    starts = s.where(
        F.col("pos") <= F.greatest(F.col("m") - C.WINNOW_W + 1, F.lit(1))
    )
    return (
        starts.select(
            "doc_id",
            (-F.col("sel.np")).cast("long").alias("fp_pos"),
            F.col("sel.h").cast("long").alias("fp"),
        )
        .distinct()
    )


def winnow_matches(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, n_shared, overlap_e6): document pairs sharing at
    least WINNOW_MIN_SHARED fingerprints, after dropping boilerplate-grade
    fingerprints (doc frequency > WINNOW_MAX_DF).  ``overlap_e6 =
    (1e6 * n_shared) div least(n_fp_a, n_fp_b)`` — a containment-style
    score: a short doc fully winnow-contained in a long one scores 1e6
    regardless of the length gap."""
    # the fingerprint frame feeds sizes, document frequency AND both pair
    # sides — multiple references plan independently (PLANS.md #11/#30),
    # so without the checkpoint the whole explode+join+window pipeline
    # would run up to 4x.  The checkpointed frame is (doc_id, fp) — two
    # longs per row, no text.
    fps = (
        winnow_fingerprints(docs)
        .select("doc_id", "fp")
        .distinct()
        .localCheckpoint()
    )
    sizes = fps.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_fp"))
    dfreq = fps.groupBy("fp").agg(F.count("*").alias("df"))
    kept = fps.join(
        dfreq.where(F.col("df") <= C.WINNOW_MAX_DF).select("fp"), "fp"
    )
    a = kept.select(F.col("doc_id").alias("doc_a"), "fp")
    b = kept.select(F.col("doc_id").alias("doc_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= C.WINNOW_MIN_SHARED)
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("nb"))
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.expr("(1000000 * n_shared) div least(na, nb)")
            .cast("long")
            .alias("overlap_e6"),
        )
    )


def winnow_source_matrix(docs: DataFrame) -> DataFrame:
    """Cross-source syndication matrix: the :func:`winnow_matches` pair
    graph rolled up to (source, source) — which feeds republish each
    other's passages (wire-service syndication, mirror sites, scraped
    re-posts), including the diagonal (intra-source self-syndication).
    Pair orientation is canonicalized lexicographically (least/greatest)
    so A->B and B->A land in one cell.

    Scale shape: the heavy work is winnow_matches (already blocked +
    df-pruned); the rollup attaches sources via two COLUMN-PRUNED
    (doc_id, source) scans joined against the sparse
    above-threshold pair frame, then one |sources|^2-bounded fold."""
    m = winnow_matches(docs)
    src = docs.select("doc_id", "source")
    j = m.join(
        src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")),
        "doc_a",
    ).join(
        src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")),
        "doc_b",
    )
    return (
        j.groupBy(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("n_shared").cast("long").alias("n_shared_total"),
            F.max("overlap_e6").cast("long").alias("max_overlap_e6"),
        )
    )
