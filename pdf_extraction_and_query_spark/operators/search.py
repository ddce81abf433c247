"""Vector similarity search + query-side operators.

Reference parity:
  * brute-force cosine top-k  == pgvector `ORDER BY embedding <=> q LIMIT k`
    (src/vector_store/pgvector_client.py:193-218);
  * enrichment join           == the N+1 per-result document lookups
    (src/api/services/rag_service.py:166-181) -> one broadcast hash join;
  * similarity buckets        == scripts/query_documents.py:134-141;
  * pagination                == pgvector_client.py:350-377.

Determinism: scores are fixed-point int64 (`round(x * 1e6)` per component,
exact integer dot product) so ranking and the DuckDB oracle are bit-stable;
cosine uses the same integers through IEEE-deterministic sqrt/divide.

Scale notes: the query side is broadcast (queries are tiny); candidates
stream map-side — top-k is a per-partition partial top-k then a final merge
(Spark's TakeOrderedAndProject for single-query; window row_number over the
per-query partition for multi-query, which shuffles once on q_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import contract as C


def _e6(x: Column) -> Column:
    return F.round(x.cast("double") * C.FIXED_POINT).cast("long")


def fixed_point_vec(v: Column, dim: int = C.EMBED_DIM) -> Column:
    return F.transform(F.slice(v, 1, dim), _e6)


def _dot(a: Column, b: Column, dim: int = C.EMBED_DIM) -> Column:
    """Exact integer dot product of two fixed-point vectors. Expression
    form — higher-order functions evaluate INTERPRETED (~0.2 ms/row at
    dim 64), so this stays on TINY frames only (probe lists, shortlists,
    centroid×query crosses, LUTs); corpus-sized scoring passes use the
    bit-identical :func:`_dot_vec` (test_srp_kernel equality)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _dot_vec(a: Column, b: Column) -> Column:
    """Arrow-vectorized twin of :func:`_dot` for corpus-sized frames: one
    int64 einsum per batch. Exact — |dot| <= 64 * 1e6 * 1e6 < 2^63 and
    every term is integer, so the result is bit-identical to the
    expression form and the DuckDB oracle."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def dots(x: pd.Series, y: pd.Series) -> pd.Series:
        if x.empty:
            return pd.Series([], dtype="int64")
        A = np.stack(x.to_numpy()).astype(np.int64, copy=False)
        B = np.stack(y.to_numpy()).astype(np.int64, copy=False)
        return pd.Series(np.einsum("ij,ij->i", A, B))

    return dots(a, b)


def _score_vec(a: Column, b: Column) -> Column:
    """Vectorized (dot_e12, cos) struct for corpus-sized scoring passes
    that also surface cosine: the int64 dot and squared norms are exact
    (< 2^53, int64->float64 conversion exact), sqrt/multiply/divide are
    IEEE correctly rounded in numpy and the JVM alike — both fields are
    bit-identical to the expression forms (`_dot`/`_sq_norm` composition);
    any display rounding stays JVM-side."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<dot_e12:long,cos:double>")
    def score(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        if x.empty:
            return pd.DataFrame({"dot_e12": pd.Series([], dtype="int64"),
                                 "cos": pd.Series([], dtype="float64")})
        A = np.stack(x.to_numpy()).astype(np.int64, copy=False)
        B = np.stack(y.to_numpy()).astype(np.int64, copy=False)
        dot = np.einsum("ij,ij->i", A, B)
        na = np.sqrt(np.einsum("ij,ij->i", A, A).astype(np.float64))
        nb = np.sqrt(np.einsum("ij,ij->i", B, B).astype(np.float64))
        return pd.DataFrame(
            {"dot_e12": dot, "cos": dot.astype(np.float64) / (na * nb)}
        )

    return score(a, b)


def _sq_norm(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Exact top-k of (… , dot_e12) with deterministic tie-break and a
    1-based rank column. orderBy+limit compiles to TakeOrderedAndProject
    (per-partition partial top-k + driver merge of k·P rows)."""
    w = Window.orderBy(F.desc("dot_e12"), F.asc("vec_id"))
    return (
        scored.orderBy(F.desc("dot_e12"), F.asc("vec_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )


def _centroids(embeddings: DataFrame, n_centroids: int) -> DataFrame:
    """Deterministic stand-in for trained k-means centroids: the first
    ``n_centroids`` vectors, fixed-point."""
    return embeddings.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cent_id"),
        fixed_point_vec(F.col("embedding")).alias("cv"),
    )


def assign_to_centroids(cand: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment against a GIVEN centroid set:
    ``cand`` = (vec_id, ev), ``cents`` = (cent_id, cv), both fixed-point.
    Broadcast the tiny centroid set, score map-side, keep the argmax via
    one row_number window (single shuffle on vec_id).  Also the streaming
    incremental-insert primitive (streaming/ivf.py): new vectors assign to
    the FROZEN build-time centroids, the standard IVF insert rule."""
    scored = cand.join(F.broadcast(cents)).select(
        "vec_id", "ev", "cent_id", _dot_vec(F.col("ev"), F.col("cv")).alias("cdot")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cdot"), F.asc("cent_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select("vec_id", "ev", "cent_id")
    )


def _ivf_assign(embeddings: DataFrame, n_centroids: int) -> DataFrame:
    """Corpus-derived-centroid assignment — shared verbatim by the inline
    ivf_topk and the persisted ivf_build so the two paths cannot drift."""
    return assign_to_centroids(
        embeddings.select("vec_id", fixed_point_vec(F.col("embedding")).alias("ev")),
        _centroids(embeddings, n_centroids),
    )


def with_query(embeddings: DataFrame, query_vec_id: int = 0) -> DataFrame:
    """Attach the query vector (fixed-point) to every candidate row via a
    broadcast cross join — one tiny build side, no shuffle of candidates."""
    q = (
        embeddings.where(F.col("vec_id") == query_vec_id)
        .select(fixed_point_vec(F.col("embedding")).alias("qv"))
    )
    cand = embeddings.select(
        "vec_id", fixed_point_vec(F.col("embedding")).alias("ev")
    )
    return cand.crossJoin(F.broadcast(q))


def vector_topk(embeddings: DataFrame, k: int = C.TOPK, query_vec_id: int = 0) -> DataFrame:
    """Brute-force exact top-k by integer dot product (cosine order for
    L2-normalized embeddings). orderBy+limit compiles to
    TakeOrderedAndProject: per-partition partial top-k, driver merge of k*P
    rows — no full sort, no shuffle of the corpus."""
    scored = with_query(embeddings, query_vec_id).select(
        "vec_id", _dot_vec(F.col("ev"), F.col("qv")).alias("dot_e12")
    )
    return _rank_topk(scored, k)


def vector_topk_multi(
    embeddings: DataFrame, n_queries: int = C.MULTI_QUERY_N, k: int = C.MULTI_TOPK
) -> DataFrame:
    """Batch search: broadcast the query set, score all (query, candidate)
    pairs map-side, per-query top-k via one row_number window (single
    shuffle on q_id)."""
    qs = (
        embeddings.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("q_id"),
            fixed_point_vec(F.col("embedding")).alias("qv"),
        )
    )
    cand = embeddings.select(
        "vec_id", fixed_point_vec(F.col("embedding")).alias("ev")
    )
    scored = cand.join(F.broadcast(qs)).select(
        "q_id", "vec_id", _dot_vec(F.col("ev"), F.col("qv")).alias("dot_e12")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("dot_e12"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "dot_e12")
    )


def hard_negatives(
    embeddings: DataFrame, n_queries: int = C.MULTI_QUERY_N, k: int = C.MULTI_TOPK
) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training: per query,
    the top-k most-similar candidates carrying a DIFFERENT label — the
    pairs a contrastive loss learns the most from (the self-hit is excluded
    automatically: it shares the query's label).

    Same scale shape as :func:`vector_topk_multi`: broadcast the tiny query
    set, score all pairs map-side with the exact fixed-point dot, drop
    same-label pairs BEFORE the shuffle, one q_id row_number window — the
    corpus moves through exactly one exchange of (n_queries × corpus)
    summary rows already filtered to cross-label pairs."""
    qs = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").cast("long").alias("q_label"),
        fixed_point_vec(F.col("embedding")).alias("qv"),
    )
    cand = embeddings.select(
        "vec_id",
        F.col("label").cast("long").alias("neg_label"),
        fixed_point_vec(F.col("embedding")).alias("ev"),
    )
    scored = (
        cand.join(F.broadcast(qs))
        .where(F.col("neg_label") != F.col("q_label"))
        .select(
            "q_id",
            "q_label",
            "vec_id",
            "neg_label",
            _dot_vec(F.col("ev"), F.col("qv")).alias("dot_e12"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("dot_e12"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("q_id", "q_label", "vec_id", "neg_label", "rank", "dot_e12")
    )


def triplet_mining(
    embeddings: DataFrame, n_queries: int = C.MULTI_QUERY_N
) -> DataFrame:
    """Triplet mining for metric-learning audits: per query (anchor), the
    NEAREST SAME-label candidate (hardest positive, self excluded) and the
    NEAREST CROSS-label candidate (hardest negative), with the exact
    fixed-point margin ``pos_dot - neg_dot`` and its sign — negative
    margin means the corpus embedding violates the triplet constraint at
    that anchor (what one checks before/after contrastive fine-tuning).

    Scale shape: broadcast query set, map-side score + pos/neg tag, then
    an explicit q_id repartition — HashPartitioning(q_id) satisfies BOTH
    the (q_id, is_pos) ranking window and the final (q_id, q_label) fold
    (subset rule, PLANS.md #37), so the whole plan pays exactly one hash
    exchange (plan-pinned in tests/test_retrieval_eval.py)."""
    qs = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").cast("long").alias("q_label"),
        fixed_point_vec(F.col("embedding")).alias("qv"),
    )
    cand = embeddings.select(
        "vec_id",
        F.col("label").cast("long").alias("c_label"),
        fixed_point_vec(F.col("embedding")).alias("ev"),
    )
    scored = (
        cand.join(F.broadcast(qs))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "q_label",
            "vec_id",
            (F.col("c_label") == F.col("q_label")).alias("is_pos"),
            _dot_vec(F.col("ev"), F.col("qv")).alias("dot_e12"),
        )
    )
    w = Window.partitionBy("q_id", "is_pos").orderBy(
        F.desc("dot_e12"), F.asc("vec_id")
    )
    top = (
        scored.repartition("q_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    pos = F.when(F.col("is_pos"), F.col("vec_id"))
    neg = F.when(~F.col("is_pos"), F.col("vec_id"))
    out = top.groupBy("q_id", "q_label").agg(
        F.max(pos).cast("long").alias("pos_id"),
        F.max(F.when(F.col("is_pos"), F.col("dot_e12"))).alias("pos_dot_e12"),
        F.max(neg).cast("long").alias("neg_id"),
        F.max(F.when(~F.col("is_pos"), F.col("dot_e12"))).alias("neg_dot_e12"),
    )
    return out.select(
        "q_id",
        "q_label",
        "pos_id",
        "pos_dot_e12",
        "neg_id",
        "neg_dot_e12",
        (F.col("pos_dot_e12") - F.col("neg_dot_e12")).alias("margin_e12"),
        F.when(F.col("pos_dot_e12") > F.col("neg_dot_e12"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("margin_ok"),
    )


def topk_enriched(embeddings: DataFrame, documents: DataFrame, k: int = C.TOPK) -> DataFrame:
    """Result enrichment: top-k hits joined to their parent documents —
    the reference's N+1 loop as ONE broadcast hash join (build side = the k
    hits, probe = documents ... broadcast the tiny top-k)."""
    hits = vector_topk(embeddings, k)
    return (
        documents.join(
            F.broadcast(hits), documents["doc_id"] == hits["vec_id"]
        )
        .select("rank", "vec_id", "dot_e12", "lang", "source", "n_chars")
    )


def similarity_buckets(embeddings: DataFrame, query_vec_id: int = 0) -> DataFrame:
    """Histogram of cosine similarity vs the query: >0.8 / 0.6-0.8 /
    0.4-0.6 / <0.4 (scripts/query_documents.py:134-141). Cosine from exact
    integer dot + IEEE sqrt (bit-stable across engines)."""
    scored = with_query(embeddings, query_vec_id).select(
        "vec_id",
        _score_vec(F.col("ev"), F.col("qv")).getField("cos").alias("cos"),
    )
    bucket = F.lit("minimal")
    for thr, name in reversed(C.SIM_BUCKETS):
        bucket = F.when(F.col("cos") > thr, F.lit(name)).otherwise(bucket)
    return (
        scored.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
    )


def paginate_documents(
    documents: DataFrame, limit: int = C.PAGE_LIMIT, offset: int = C.PAGE_OFFSET
) -> DataFrame:
    """ORDER BY ... LIMIT l OFFSET o (reference: pgvector_client.py:350-377)
    with a deterministic order (n_chars desc, doc_id tie-break).

    Scale shape: ``orderBy(...).limit(offset + limit)`` compiles to
    TakeOrderedAndProject — per-partition partial top-(l+o) then a driver
    merge of (l+o)·P rows — and the row_number window that numbers the page
    runs over that ALREADY-REDUCED (l+o)-row frame, so nothing ever sorts
    or single-tasks the full table.  (The previous shape was a global
    no-partition-key window: the entire documents table moved into ONE
    task — correct, but a scale-killer at 10^12 docs; round-3 verdict
    What's-wrong #2.)  tests/test_plan_shapes.py asserts the physical plan
    contains TakeOrderedAndProject and no Window over the base scan."""
    top = (
        documents.select("doc_id", "n_chars")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(offset + limit)
    )
    w = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        top.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") > offset)
    )


def ivf_topk(
    embeddings: DataFrame,
    k: int = C.TOPK,
    query_vec_id: int = 0,
    n_centroids: int = C.IVF_CENTROIDS,
    n_probe: int = C.IVF_PROBE,
) -> DataFrame:
    """IVF-style approximate top-k — the scale path for similarity search:
    assign every vector to its nearest centroid (broadcast the tiny centroid
    set, one narrow scoring pass + one row_number shuffle), then search only
    the ``n_probe`` clusters nearest the query. At 10^12 scale the
    assignment is precomputed and the probe prunes ~(1 - n_probe/n_lists)
    of the corpus from the scan; here centroids are the first
    ``n_centroids`` vectors (deterministic stand-in for trained k-means).
    Integer fixed-point scoring keeps it oracle-exact."""
    assigned = _ivf_assign(embeddings, n_centroids)
    # probe list: clusters nearest the query vector
    q = (
        embeddings.where(F.col("vec_id") == query_vec_id)
        .select(fixed_point_vec(F.col("embedding")).alias("qv"))
    )
    probes = (
        _centroids(embeddings, n_centroids)
        .crossJoin(F.broadcast(q))
        .select("cent_id", _dot(F.col("cv"), F.col("qv")).alias("qdot"))
        .orderBy(F.desc("qdot"), F.asc("cent_id"))
        .limit(n_probe)
        .select("cent_id")
    )
    pruned = assigned.join(F.broadcast(probes), "cent_id")
    hits = pruned.crossJoin(F.broadcast(q)).select(
        "vec_id", _dot_vec(F.col("ev"), F.col("qv")).alias("dot_e12")
    )
    return _rank_topk(hits, k)


def ivf_topk_multi(
    embeddings: DataFrame,
    n_queries: int = C.MULTI_QUERY_N,
    k: int = C.MULTI_TOPK,
    n_centroids: int = C.IVF_CENTROIDS,
    n_probe: int = C.IVF_PROBE,
) -> DataFrame:
    """Batch IVF search: assignment computed ONCE for the whole query set,
    per-query probe lists from the tiny (centroids x queries) cross (a
    broadcast, n_queries*n_probe rows), then candidates scored only inside
    each query's probed clusters — one row_number shuffle on q_id, same
    shape as :func:`vector_topk_multi` but over the pruned candidate set."""
    assigned = _ivf_assign(embeddings, n_centroids)
    qs = (
        embeddings.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("q_id"),
            fixed_point_vec(F.col("embedding")).alias("qv"),
        )
    )
    wp = Window.partitionBy("q_id").orderBy(F.desc("qdot"), F.asc("cent_id"))
    probes = (
        _centroids(embeddings, n_centroids)
        .crossJoin(F.broadcast(qs))
        .select("q_id", "cent_id", _dot(F.col("cv"), F.col("qv")).alias("qdot"))
        .withColumn("prank", F.row_number().over(wp))
        .where(F.col("prank") <= n_probe)
        .select("q_id", "cent_id")
    )
    pruned = assigned.join(F.broadcast(probes), "cent_id")
    hits = pruned.join(F.broadcast(qs), "q_id").select(
        "q_id", "vec_id", _dot_vec(F.col("ev"), F.col("qv")).alias("dot_e12")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("dot_e12"), F.asc("vec_id"))
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "dot_e12")
    )


def ivf_recall(
    embeddings: DataFrame,
    n_queries: int = C.MULTI_QUERY_N,
    k: int = C.MULTI_TOPK,
) -> DataFrame:
    """Recall@k of the IVF path against the brute-force ground truth, per
    query — the evaluation loop an ANN deployment runs before trusting an
    index config (reference analog: the retrieval-quality comparison in
    evaluation/CHUNKING_COMPARISON_RESULTS.md, re-aimed at index recall).
    Fixed-point ``recall_micro = floor(n_hits * 1e6 / k)``; a left-semi
    join on (q_id, vec_id) counts ground-truth rows the IVF result found.
    Both sides are tiny (n_queries * k rows) — the cost is the two
    searches, which scan once each."""
    brute = vector_topk_multi(embeddings, n_queries, k)
    approx = ivf_topk_multi(embeddings, n_queries, k)
    found = brute.join(
        approx.select("q_id", "vec_id"), ["q_id", "vec_id"], "left_semi"
    )
    return (
        brute.groupBy("q_id")
        .agg(F.count("*").alias("n_truth"))
        .join(
            found.groupBy("q_id").agg(F.count("*").alias("n_hits")),
            "q_id",
            "left",
        )
        .select(
            F.col("q_id").cast("long").alias("q_id"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.floor(F.coalesce("n_hits", F.lit(0)) * 1_000_000 / F.col("n_truth"))
            .cast("long")
            .alias("recall_micro"),
        )
    )


def ivf_build(
    embeddings: DataFrame,
    index_path: str,
    n_centroids: int = C.IVF_CENTROIDS,
) -> None:
    """Build phase of the IVF index — the 10^12-scale shape where
    :func:`ivf_topk` inlines assignment per query: assign every vector to
    its nearest centroid ONCE (broadcast centroids, one row_number window)
    and persist (vec_id, ev) PARTITIONED BY cent_id through the table shim.
    At query time the probed clusters are partition directories, so the
    scan prunes (1 - n_probe/n_lists) of the corpus before reading a byte
    (PartitionFilters — see test_ivf_index plan assertion)."""
    from ..sources import tables

    assigned = _ivf_assign(embeddings, n_centroids)
    tables.overwrite_partitions(assigned, index_path, ["cent_id"])


def ivf_topk_prebuilt(
    spark,
    embeddings: DataFrame,
    index_path: str,
    k: int = C.TOPK,
    query_vec_id: int = 0,
    n_centroids: int = C.IVF_CENTROIDS,
    n_probe: int = C.IVF_PROBE,
) -> DataFrame:
    """Search phase over an :func:`ivf_build` index: pick the ``n_probe``
    centroids nearest the query (tiny driver-side plan step — n_probe ints
    of query-planning metadata, not a data collect), scan ONLY those
    partitions, exact-score the survivors, TakeOrderedAndProject. Results
    are identical to :func:`ivf_topk` by construction (same assignment,
    same probe rule, same fixed-point scoring)."""
    from ..sources import tables

    q = (
        embeddings.where(F.col("vec_id") == query_vec_id)
        .select(fixed_point_vec(F.col("embedding")).alias("qv"))
    )
    probe_rows = (
        _centroids(embeddings, n_centroids)
        .crossJoin(F.broadcast(q))
        .select("cent_id", _dot(F.col("cv"), F.col("qv")).alias("qdot"))
        .orderBy(F.desc("qdot"), F.asc("cent_id"))
        .limit(n_probe)
        .collect()
    )
    probe_ids = [r["cent_id"] for r in probe_rows]
    idx = tables.read_table(spark, index_path).where(F.col("cent_id").isin(probe_ids))
    hits = idx.crossJoin(F.broadcast(q)).select(
        "vec_id", _dot_vec(F.col("ev"), F.col("qv")).alias("dot_e12")
    )
    return _rank_topk(hits, k)


def vector_topk_filtered(
    embeddings: DataFrame,
    documents: DataFrame,
    source: str = "src1",
    k: int = C.TOPK,
    query_vec_id: int = 0,
) -> DataFrame:
    """Search with a document filter (reference: optional document_id filter,
    src/vector_store/pgvector_client.py:199-201, generalized to a metadata
    predicate): candidates restricted via broadcast semi-join on the
    filtered documents before scoring — the filter prunes the scan BEFORE
    any distance work."""
    allowed = documents.where(F.col("source") == source).select(
        F.col("doc_id").alias("vec_id")
    )
    cand = embeddings.join(F.broadcast(allowed), "vec_id", "semi")
    scored = cand.select(
        "vec_id", fixed_point_vec(F.col("embedding")).alias("ev")
    ).crossJoin(
        F.broadcast(
            embeddings.where(F.col("vec_id") == query_vec_id).select(
                fixed_point_vec(F.col("embedding")).alias("qv")
            )
        )
    ).select("vec_id", _dot_vec(F.col("ev"), F.col("qv")).alias("dot_e12"))
    return _rank_topk(scored, k)


def search_response(
    embeddings: DataFrame, documents: DataFrame, k: int = C.TOPK, query_vec_id: int = 0
) -> DataFrame:
    """Response shaping (scripts/query_documents.py:127-164): each hit
    carries a ``PREVIEW_CHARS``-char content preview and a cosine similarity
    label. Ranking stays on the exact integer dot product (the same order
    pgvector's distance ORDER BY produces for the stored metric); the
    similarity column is display surface, computed from the same integers
    through IEEE-deterministic sqrt/divide."""
    scored = with_query(embeddings, query_vec_id).select(
        "vec_id", _score_vec(F.col("ev"), F.col("qv")).alias("s")
    ).select(
        "vec_id",
        F.col("s.dot_e12").alias("dot_e12"),
        F.round(F.col("s.cos"), 6).alias("similarity"),
    )
    hits = _rank_topk(scored, k)
    return (
        documents.join(F.broadcast(hits), documents["doc_id"] == hits["vec_id"])
        .select(
            "rank",
            "vec_id",
            "similarity",
            F.substring("text", 1, C.PREVIEW_CHARS).alias("preview"),
        )
    )


def eval_by_category(
    embeddings: DataFrame, documents: DataFrame, n_queries: int = C.MULTI_QUERY_N
) -> DataFrame:
    """Evaluation-harness aggregates (scripts/analyze_results.py:40-60,
    evaluate_queries.py:225-231): batch-search hits grouped by the matched
    document's category with per-category hit count, query coverage, and
    mean/max score. Means are ratios of exact integers (deterministic)."""
    hits = vector_topk_multi(embeddings, n_queries=n_queries)
    joined = documents.join(
        F.broadcast(hits), documents["doc_id"] == hits["vec_id"]
    )
    return joined.groupBy("source").agg(
        F.count("*").alias("n_hits"),
        F.count_distinct("q_id").alias("n_queries"),
        F.round(F.sum("dot_e12") / F.count("*"), 4).alias("avg_dot_e12"),
        F.max("dot_e12").alias("max_dot_e12"),
    )


def stub_embed_components(docs: DataFrame, dim: int = C.EMBED_DIM) -> DataFrame:
    """Driver-comparable surface for :func:`stub_embed`: the embedding
    exploded to (doc_id, dim_i, comp_e6) scalar rows — fixed-point int64
    components so the frame is sortable/hashable by any canonicalizer
    (array-typed output columns break frame-sort comparison).

    Plan shape matters here (both measured at 5k docs):
      * posexplode_OUTER, not posexplode — the non-outer form triggers
        Catalyst's InferFiltersFromGenerate, which prepends a
        ``size(...) > 0`` Filter re-inlining the whole embedding expression
        tree as an interpreted predicate (minutes, not seconds);
      * normalize AFTER the Generate — ``nrm`` captured inside the unit
        transform's lambda re-evaluates its aggregate per array element
        (CollapseProject re-inlines a once-referenced alias); as a Generate
        input attribute it is materialized once per document.
    """
    staged = _stub_embed_staged(docs, dim)
    ex = staged.select(
        "doc_id", "norm", "nrm", F.posexplode_outer("comps").alias("dim_i", "comp")
    )
    unit_e6 = _e6(F.round(F.col("comp") / F.col("nrm"), 6))
    return ex.select(
        "doc_id",
        F.col("dim_i").cast("long").alias("dim_i"),
        F.when(F.col("norm") == "", F.lit(0).cast("long"))
        .otherwise(unit_e6)
        .alias("comp_e6"),
    )


def _stub_embed_staged(docs: DataFrame, dim: int = C.EMBED_DIM) -> DataFrame:
    """(doc_id, norm, comps, nrm) — raw hash-derived components plus the L2
    norm as a scalar column. comps/nrm are materialized between selects —
    an expression referenced inside a transform() lambda re-evaluates per
    element."""
    from .textstats import poly_hash

    norm_text = F.trim(F.regexp_replace(F.lower(F.col("text")), C.WS_SPLIT_RE, " "))
    staged = docs.select(
        "doc_id", norm_text.alias("norm"), poly_hash(norm_text).alias("fp")
    )
    # REAL materialization barrier for fp: CollapseProject re-inlines any
    # once-referenced alias into its consumer — here into the comps
    # transform's lambda, where the poly-hash aggregate would re-evaluate
    # PER ELEMENT (64 x |text| per doc; measured ~20s for 5k docs vs ~2s
    # with the barrier). Projection tricks don't survive the
    # ColumnPruning+CollapseProject fixpoint; an exchange does.
    n_part = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    staged = staged.repartition(n_part, "doc_id")
    staged = staged.select(
        "doc_id",
        "norm",
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: ((F.col("fp") * 31 + i) % 1009 - 504).cast("double"),
        ).alias("comps"),
    )
    return staged.select(
        "doc_id",
        "norm",
        "comps",
        F.sqrt(
            F.aggregate(
                F.transform("comps", lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("nrm"),
    )


def stub_embed(docs: DataFrame, dim: int = C.EMBED_DIM) -> DataFrame:
    """Deterministic stub embedder (the sentence-transformers operator
    interface, src/embeddings/sentence_transformer_embedder.py:85-164,
    with a hash-derived unit vector instead of a model — model weights are
    out of sandbox scope). L2-normalized like the reference (normalize=True)
    so cosine == dot."""
    staged = _stub_embed_staged(docs, dim)
    # empty text -> zero vector, never a model call (reference contract:
    # src/embeddings/sentence_transformer_embedder.py:95-97, 126-137)
    zero = F.array_repeat(F.lit(0.0), dim)
    unit = F.transform("comps", lambda x: F.round(x / F.col("nrm"), 6))
    return staged.select(
        "doc_id",
        F.when(F.col("norm") == "", zero).otherwise(unit).alias("embedding"),
    )


def retrieval_eval(
    embeddings: DataFrame,
    n_queries: int = C.RETRIEVAL_EVAL_N,
    k: int = C.RETRIEVAL_EVAL_K,
) -> DataFrame:
    """Per-query rank-sensitive retrieval quality against the label ground
    truth — the automated form of the reference's evaluation harness
    (scripts/evaluate_queries.py runs 40 queries with per-query
    expected_docs from evaluation/ma_test_queries.json and collects manual
    0-4 scores; here relevance is machine-checkable: a hit is relevant iff
    it carries the QUERY VECTOR'S label, the standard ANN-benchmark
    convention, self-hit excluded).

    Metrics are exact integers (cross-engine deterministic, the fixed-point
    ranking-key contract): ``n_rel`` relevant hits in the top-k,
    ``first_rel_rank`` (0 = none), ``mrr_micro = 1e6 div first_rel_rank``,
    ``precision_micro = n_rel * 1e6 div k``.  Ranks are positions in the
    returned top-k INCLUDING the self-hit — the "query is a corpus member"
    convention is pinned by the oracle, not left to the reader.

    Scale shape: rides :func:`vector_topk_multi` (broadcast query set,
    map-side scoring, one q_id shuffle) plus ONE extra 2-column pruned
    scan of the corpus to label the n_queries*k surviving hits (broadcast
    join — the hits frame never exceeds metadata size); query labels join
    broadcast onto the same tiny frame."""
    hits = vector_topk_multi(embeddings, n_queries, k)
    labels = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("label").cast("long").alias("label"),
    )
    q_lab = labels.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("q_label")
    )
    labeled = (
        labels.join(F.broadcast(hits), "vec_id")
        .join(F.broadcast(q_lab), "q_id")
        .withColumn(
            "rel",
            (
                (F.col("label") == F.col("q_label"))
                & (F.col("vec_id") != F.col("q_id"))
            ).cast("long"),
        )
    )
    per_q = labeled.groupBy("q_id", "q_label").agg(
        F.sum("rel").cast("long").alias("n_rel"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("fr"),
    )
    return per_q.select(
        F.col("q_id").cast("long").alias("q_id"),
        F.col("q_label").alias("label"),
        "n_rel",
        F.coalesce("fr", F.lit(0)).cast("long").alias("first_rel_rank"),
        F.when(F.col("fr").isNotNull(), F.expr("1000000 div fr"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("mrr_micro"),
        F.expr(f"(n_rel * 1000000) div {k}")
        .cast("long")
        .alias("precision_micro"),
    )


def retrieval_ndcg(
    embeddings: DataFrame,
    n_queries: int = C.RETRIEVAL_EVAL_N,
    k: int = C.RETRIEVAL_EVAL_K,
) -> DataFrame:
    """nDCG@k per query — the rank-position-weighted complement of
    :func:`retrieval_eval` (MRR sees only the FIRST relevant hit;
    nDCG credits every one by position).  Binary relevance (label
    match, self excluded), discounts from the AUTHORED fixed-point
    table ``contract.NDCG_DISC_E6`` (the HLL_LN64_E6 precedent — log2
    runs at authoring time, so the metric is exact int64 cross-engine):
    ``dcg_e6 = Σ rel_i · DISC[i]``, ``idcg_e6 = Σ first-n_rel
    discounts``, ``ndcg_e6 = dcg·1e6 div idcg`` (0 when nothing is
    relevant).

    Scale shape: identical to retrieval_eval — broadcast-labeled top-k
    hits frame (n_queries·k rows), one metadata-sized fold; the
    discount lookup is a literal array index, the IDCG prefix sum an
    interpreted HOF over a ≤k-element slice of the SAME literal (fine:
    it runs on n_queries rows, not the corpus)."""
    hits = vector_topk_multi(embeddings, n_queries, k)
    labels = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("label").cast("long").alias("label"),
    )
    q_lab = labels.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("q_label")
    )
    disc = F.array(*[F.lit(v).cast("long") for v in C.NDCG_DISC_E6])
    labeled = (
        labels.join(F.broadcast(hits), "vec_id")
        .join(F.broadcast(q_lab), "q_id")
        .withColumn(
            "rel",
            (
                (F.col("label") == F.col("q_label"))
                & (F.col("vec_id") != F.col("q_id"))
            ).cast("long"),
        )
        .withColumn("disc", disc[F.col("rank").cast("int") - 1])
    )
    per_q = labeled.groupBy("q_id", "q_label").agg(
        F.sum("rel").cast("long").alias("n_rel"),
        F.sum(F.col("rel") * F.col("disc")).cast("long").alias("dcg_e6"),
    )
    idcg = F.aggregate(
        F.slice(disc, 1, F.col("n_rel").cast("int")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return per_q.withColumn("idcg_e6", idcg).select(
        F.col("q_id").cast("long").alias("q_id"),
        F.col("q_label").alias("label"),
        "n_rel",
        "dcg_e6",
        "idcg_e6",
        F.when(
            F.col("n_rel") > 0, F.expr("dcg_e6 * 1000000L DIV idcg_e6")
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("ndcg_e6"),
    )


def retrieval_eval_by_label(
    embeddings: DataFrame,
    n_queries: int = C.RETRIEVAL_EVAL_N,
    k: int = C.RETRIEVAL_EVAL_K,
) -> DataFrame:
    """Per-category rollup of :func:`retrieval_eval` — the reference's
    by-category report shape (scripts/evaluate_queries.py:240-255 groups
    results by category and averages scores).  Means are integer ratios of
    exact sums (``sum div count``), so the rollup is cross-engine exact.
    One hash agg over the n_queries-row eval frame — metadata-sized."""
    per_q = retrieval_eval(embeddings, n_queries, k)
    return per_q.groupBy("label").agg(
        F.count("*").cast("long").alias("n_queries"),
        F.sum("n_rel").cast("long").alias("n_rel_total"),
        F.sum((F.col("first_rel_rank") > 0).cast("long"))
        .cast("long")
        .alias("n_queries_hit"),
        F.expr("sum(mrr_micro) div count(*)")
        .cast("long")
        .alias("mean_mrr_micro"),
        F.expr("sum(precision_micro) div count(*)")
        .cast("long")
        .alias("mean_precision_micro"),
    )


def _ivf_ranked(
    embeddings: DataFrame, n_centroids: int, n_probe: int
) -> DataFrame:
    """The shared IVF blocking frame for corpus-wide neighbor operators
    (:func:`knn_join`, :func:`knn_classify`): every vector ranked against
    every centroid (one broadcast scoring pass, one vec_id window), kept
    to ``rn <= n_probe``.  ``rn == 1`` is the inverted-list assignment,
    ``rn <= n_probe`` the probe set — a vector's probe list always starts
    with its own list.  localCheckpointed because the two roles are
    separate plan branches (PLANS.md #11); at production scale this frame
    IS the persisted ivf_build assignment, already on disk."""
    cand = embeddings.select(
        "vec_id", fixed_point_vec(F.col("embedding")).alias("ev")
    )
    scored = cand.join(F.broadcast(_centroids(embeddings, n_centroids))).select(
        "vec_id", "ev", "cent_id", _dot_vec(F.col("ev"), F.col("cv")).alias("cdot")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cdot"), F.asc("cent_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n_probe)
        .localCheckpoint()
    )


def knn_join(
    embeddings: DataFrame,
    k: int = C.KNN_K,
    n_centroids: int = C.IVF_CENTROIDS,
    n_probe: int = C.IVF_PROBE,
) -> DataFrame:
    """All-kNN join: EVERY corpus vector gets its ``k`` nearest neighbors
    (self excluded) — the batch kNN-graph build behind kNN-LM retrieval
    corpora, semantic-dedup graphs, and item-item recommenders.  Brute
    force is O(n^2) dots; this is the IVF-blocked form: each query meets
    only the candidate lists of its ``n_probe`` nearest centroids.

    One broadcast scoring pass ranks every (vector, centroid) pair; the
    SAME ranked frame yields both roles — ``rn == 1`` is the candidate's
    inverted-list assignment, ``rn <= n_probe`` is the query's probe set
    (a vector's probe list always starts with its own list, so the join
    below never loses the self-block).  The ranked frame is consumed by
    two plan branches, which Spark plans independently (PLANS.md #11), so
    it is localCheckpointed once — at production scale this frame IS the
    persisted IVF assignment (``ivf_build``), already on disk.

    Both sides shuffle once on ``cent_id`` into a GROUPED MATMUL kernel
    (cogrouped ``applyInPandas``): per list, one Q @ N^T einsum scores the
    whole block and emits only each query's per-LIST top-k — top-k
    distributes over unions (any global top-k edge is in its own list's
    top-k), so the q_id exchange then merges k rows per probed list, not
    list-sized pair sets.  The row-wise join twin (materializing every
    candidate pair with both dim-64 vectors) measured 7.4 s vs ~1 s at
    sf0.1 — the Arrow transfer of 1.5M x 128-int pair rows, not the dots,
    was the cost (PLANS.md #14 family); it survives as
    :func:`_knn_join_rowwise`, the semantic spec, bit-equality-tested.
    Parallelism is bounded by the list count — n_lists grows ~sqrt(n)
    at scale (and the fan-in is pinned by an explicit repartition on
    cent_id, the grouped-map AQE caveat).  Output: (q_id, nb_id, rank,
    dot_e12), rank 1-based, deterministic (dot desc, nb_id asc)
    tie-break — bit-stable vs the DuckDB replay."""
    ranked = _ivf_ranked(embeddings, n_centroids, n_probe)
    shuffle_n = int(
        embeddings.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    blocked = _block_topk_pairs(
        _knn_probe_rows(ranked), _knn_assign_rows(ranked), k, shuffle_n
    )
    return _knn_rank(blocked, k)


def _knn_probe_rows(ranked: DataFrame) -> DataFrame:
    return ranked.select(
        F.col("vec_id").alias("q_id"), F.col("ev").alias("qv"), "cent_id"
    )


def _knn_assign_rows(ranked: DataFrame) -> DataFrame:
    return ranked.where(F.col("rn") == 1).select(
        "cent_id", F.col("vec_id").alias("nb_id"), F.col("ev").alias("nv")
    )


def _knn_rank(pairs: DataFrame, k: int) -> DataFrame:
    """Global per-query top-k + 1-based rank over (q_id, nb_id, dot_e12)
    candidate rows — one skinny q_id exchange."""
    wk = Window.partitionBy("q_id").orderBy(F.desc("dot_e12"), F.asc("nb_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(wk).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            F.col("q_id").cast("long").alias("q_id"),
            F.col("nb_id").cast("long").alias("nb_id"),
            "rank",
            F.col("dot_e12").cast("long").alias("dot_e12"),
        )
    )


def _block_topk_pairs(
    probes: DataFrame, assigned: DataFrame, k: int, shuffle_n: int
) -> DataFrame:
    """Grouped-matmul per-list scoring: cogroup probe and assignment rows
    by cent_id; per list, ONE int64 ``Q @ N^T`` scores the block exactly
    (|dot| <= 64e12 << 2^63) and a lexsort keeps each query's top-k with
    the global (dot desc, nb asc) tie-break — so the per-list partials
    merge to the exact global top-k downstream.  Self-pairs are masked to
    int64-min before the sort and dropped on emit.  Explicit repartition
    pins the fan-in (AQE coalescing is blind to per-group Python cost —
    CLAUDE.md sharp edge)."""
    import numpy as np
    import pandas as pd

    def block(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "q_id": pd.Series([], dtype="int64"),
                "nb_id": pd.Series([], dtype="int64"),
                "dot_e12": pd.Series([], dtype="int64"),
            }
        )
        if left.empty or right.empty:
            return empty
        Q = np.stack(left["qv"].to_numpy()).astype(np.int64, copy=False)
        N = np.stack(right["nv"].to_numpy()).astype(np.int64, copy=False)
        q_ids = left["q_id"].to_numpy()
        nb_ids = right["nb_id"].to_numpy()
        D = Q @ N.T
        # mask self-pairs to min+1: the sort key is -D, and -(int64 min)
        # overflows back to itself (would sort the self-pair FIRST);
        # -(min+1) = int64 max sorts it last.  Real dots are bounded by
        # 64e12, so the sentinel can never collide.
        sentinel = np.iinfo(np.int64).min + 1
        D[q_ids[:, None] == nb_ids[None, :]] = sentinel
        kk = min(k, D.shape[1])
        # per-row order by (dot desc, nb asc): lexsort is stable,
        # secondary key first
        order = np.lexsort(
            (np.broadcast_to(nb_ids, D.shape), -D), axis=1
        )[:, :kk]
        rows = np.repeat(q_ids, kk)
        cols = order.ravel()
        dots = D[np.repeat(np.arange(D.shape[0]), kk), cols]
        keep = dots != sentinel
        return pd.DataFrame(
            {
                "q_id": rows[keep],
                "nb_id": nb_ids[cols][keep],
                "dot_e12": dots[keep],
            }
        )

    return (
        probes.repartition(shuffle_n, "cent_id")
        .groupBy("cent_id")
        .cogroup(assigned.repartition(shuffle_n, "cent_id").groupBy("cent_id"))
        .applyInPandas(block, "q_id long, nb_id long, dot_e12 long")
    )


def _knn_join_rowwise(
    embeddings: DataFrame,
    k: int = C.KNN_K,
    n_centroids: int = C.IVF_CENTROIDS,
    n_probe: int = C.IVF_PROBE,
) -> DataFrame:
    """Row-wise join twin of :func:`knn_join` — the semantic spec (every
    candidate pair materialized, `_dot_vec` scoring, one global window).
    Kept for the bit-equality test; 7x slower at sf0.1 because the
    cent_id exchange carries both dim-64 vectors in every pair row."""
    ranked = _ivf_ranked(embeddings, n_centroids, n_probe)
    pairs = (
        _knn_probe_rows(ranked)
        .join(_knn_assign_rows(ranked), "cent_id")
        .where(F.col("q_id") != F.col("nb_id"))
        .select("q_id", "nb_id", _dot_vec(F.col("qv"), F.col("nv")).alias("dot_e12"))
    )
    return _knn_rank(pairs, k)


def mmr_topk(
    embeddings: DataFrame,
    k: int = C.MMR_K,
    pool: int = C.MMR_POOL,
    query_vec_id: int = 0,
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified retrieval (Carbonell &
    Goldstein 1998, public): greedily pick ``k`` results from the
    relevance top-``pool`` shortlist, each pick maximizing
    ``MMR_LAMBDA_NUM * rel_e12 - MMR_LAMBDA_COMP * max_sim_e12`` where
    ``max_sim_e12`` is the candidate's max integer dot against the
    already-selected set (0 for the first pick by contract — pure
    relevance).  Ties break to the smaller vec_id; all arithmetic is
    int64 (|7 * dot| <= 7 * 64e12 << 2^63), so the selection sequence is
    bit-stable vs the DuckDB unrolled replay.

    Scale shape: the DISTRIBUTED part is the shortlist — orderBy+limit
    compiles to TakeOrderedAndProject over the corpus (per-partition
    partial top-pool, driver merge).  The greedy itself is inherently
    sequential over O(pool) rows x O(k) rounds; it runs on the collected
    shortlist — a metadata-sized collect (pool rows of dim-64 vectors,
    the codebook/probe-list precedent), exactly where production
    re-rankers run their final stage."""
    spark = embeddings.sparkSession
    short = (
        with_query(embeddings, query_vec_id)
        .select("vec_id", "ev", _dot_vec(F.col("ev"), F.col("qv")).alias("rel_e12"))
        .orderBy(F.desc("rel_e12"), F.asc("vec_id"))
        .limit(pool)
    )
    cand = {
        int(r["vec_id"]): (np.asarray(r["ev"], dtype=np.int64), int(r["rel_e12"]))
        for r in short.collect()
    }
    return spark.createDataFrame(_mmr_greedy(cand, k), _MMR_SCHEMA)


def _mmr_greedy(
    cand: dict[int, tuple["np.ndarray", int]], k: int
) -> list[tuple[int, int, int, int, int]]:
    """The sequential MMR recurrence over one collected shortlist —
    shared by the single-query and batch forms.  Returns
    (rank, vec_id, rel_e12, max_sim_e12, mmr_score) tuples."""
    picked: list[tuple[int, int, int, int, int]] = []
    sel_vecs: list[np.ndarray] = []
    for rank in range(1, min(k, len(cand)) + 1):
        best = None
        for vid in sorted(cand):  # ascending id = deterministic tie-break
            ev, rel = cand[vid]
            ms = max((int(ev @ s) for s in sel_vecs), default=0)
            score = C.MMR_LAMBDA_NUM * rel - C.MMR_LAMBDA_COMP * ms
            if best is None or score > best[4]:
                best = (rank, vid, rel, ms, score)
        picked.append(tuple(int(x) for x in best))
        sel_vecs.append(cand.pop(best[1])[0])
    return picked


_MMR_SCHEMA = (
    "rank long, vec_id long, rel_e12 long, max_sim_e12 long, mmr_score long"
)


def mmr_topk_multi(
    embeddings: DataFrame,
    n_queries: int = C.MULTI_QUERY_N,
    k: int = C.MMR_K,
    pool: int = C.MMR_POOL,
) -> DataFrame:
    """Batch MMR: diversified top-k for the first ``n_queries`` query
    vectors in one pass.  The distributed half is ONE broadcast
    query-set scoring pass + a single q_id row_number window (the
    vector_topk_multi shape) keeping each query's top-``pool``; the
    greedy runs per query over the collected shortlists
    (n_queries x pool rows of dim-64 ints — metadata-sized).  Selection
    sequences are bit-identical to running :func:`mmr_topk` per query
    (tests pin it), and the DuckDB twin unrolls the recurrence with a
    per-q_id QUALIFY argmax per round."""
    spark = embeddings.sparkSession
    qs = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        fixed_point_vec(F.col("embedding")).alias("qv"),
    )
    cand = embeddings.select(
        "vec_id", fixed_point_vec(F.col("embedding")).alias("ev")
    )
    scored = cand.join(F.broadcast(qs)).select(
        "q_id", "vec_id", "ev", _dot_vec(F.col("ev"), F.col("qv")).alias("rel_e12")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("rel_e12"), F.asc("vec_id"))
    rows = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= pool)
        .collect()
    )
    pools: dict[int, dict[int, tuple[np.ndarray, int]]] = {}
    for r in rows:
        pools.setdefault(int(r["q_id"]), {})[int(r["vec_id"])] = (
            np.asarray(r["ev"], dtype=np.int64),
            int(r["rel_e12"]),
        )
    out = [
        (q,) + pick
        for q in sorted(pools)
        for pick in _mmr_greedy(pools[q], k)
    ]
    return spark.createDataFrame(out, "q_id long, " + _MMR_SCHEMA)


def knn_classify(
    embeddings: DataFrame,
    k: int = C.KNN_CLASSIFY_K,
    seed_mod: int = C.KNN_SEED_MOD,
    n_centroids: int = C.IVF_CENTROIDS,
    n_probe: int = C.IVF_PROBE,
) -> DataFrame:
    """kNN label propagation — the weak-supervision labeling stage of a
    training-data pipeline: a trusted SEED subset (``vec_id % seed_mod ==
    0``, a pure row function so the split is deterministic, resumable,
    and replayable in SQL) carries labels; every other vector takes the
    majority vote of its ``k`` nearest seed neighbors, candidates blocked
    to the query's IVF probe lists exactly like :func:`knn_join`.

    Scale shape: the ranked frame is the shared IVF assignment
    (:func:`_ivf_ranked`); scoring is the same cogrouped per-list matmul
    kernel as :func:`knn_join` (finding #34 — pair rows never carry
    vectors) over the SEED slice of the assignment only (the candidate
    side is already 1/seed_mod of the corpus before the exchange); the
    label join happens AFTER the skinny global top-k (k rows per query),
    not on pair rows; vote + argmax are two more skinny q_id exchanges.
    Queries whose probe lists hold no seed get no row (explicit
    abstention — at production k/probe sizes this is the long-tail
    escalation queue, not silent mislabeling).

    Output: (vec_id, pred_label, n_votes, true_label, correct) — carrying
    the held-back true label makes the frame double as the propagation
    quality report (``correct`` is exact because the fixture labels every
    vector; production would have NULL true labels outside eval slices).
    """
    ranked = _ivf_ranked(embeddings, n_centroids, n_probe)
    labels = embeddings.select("vec_id", F.col("label").cast("long").alias("label"))
    shuffle_n = int(
        embeddings.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    return classify_from_ranked(ranked, labels, k, seed_mod, shuffle_n)


def classify_from_ranked(
    ranked: DataFrame,
    labels: DataFrame,
    k: int,
    seed_mod: int,
    shuffle_n: int,
) -> DataFrame:
    """The classify tail shared by the inline :func:`knn_classify` and
    the streaming-maintained form (streaming/knn.knn_classify_merged):
    ``ranked`` is any `_ivf_ranked`-shaped frame (vec_id, ev, cent_id,
    rn), ``labels`` = (vec_id, label long)."""
    seeds = _knn_assign_rows(ranked).where(F.col("nb_id") % seed_mod == 0)
    probes = _knn_probe_rows(ranked).where(F.col("q_id") % seed_mod != 0)
    topk = _knn_rank(_block_topk_pairs(probes, seeds, k, shuffle_n), k).join(
        labels.select(
            F.col("vec_id").alias("nb_id"), F.col("label").alias("nb_label")
        ),
        "nb_id",
    )
    votes = topk.groupBy("q_id", "nb_label").agg(F.count(F.lit(1)).alias("n_votes"))
    wv = Window.partitionBy("q_id").orderBy(F.desc("n_votes"), F.asc("nb_label"))
    pred = (
        votes.withColumn("vr", F.row_number().over(wv))
        .where(F.col("vr") == 1)
        .select(
            F.col("q_id").alias("vec_id"),
            F.col("nb_label").alias("pred_label"),
            F.col("n_votes").cast("long").alias("n_votes"),
        )
    )
    return pred.join(labels, "vec_id").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        "pred_label",
        "n_votes",
        F.col("label").alias("true_label"),
        (F.col("pred_label") == F.col("label")).cast("long").alias("correct"),
    )


def knn_classify_accuracy(
    embeddings: DataFrame,
    k: int = C.KNN_CLASSIFY_K,
    seed_mod: int = C.KNN_SEED_MOD,
) -> DataFrame:
    """Per-true-label propagation quality rollup over
    :func:`knn_classify`: coverage (how many unlabeled vectors got a
    vote at all) and accuracy (integer micro units).  One skinny
    true_label exchange over the classify output."""
    cls = knn_classify(embeddings, k=k, seed_mod=seed_mod)
    return (
        cls.groupBy("true_label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classified"),
            F.sum("correct").cast("long").alias("n_correct"),
        )
        .select(
            "true_label",
            "n_classified",
            "n_correct",
            F.expr("n_correct * 1000000L DIV n_classified").alias("accuracy_micro"),
        )
    )


def mutual_knn_pairs(
    embeddings: DataFrame,
    k: int = C.KNN_K,
    n_centroids: int = C.IVF_CENTROIDS,
    n_probe: int = C.IVF_PROBE,
) -> DataFrame:
    """Mutual-kNN edge set: (a, b) kept iff b is in kNN(a) AND a is in
    kNN(b) — the standard parameter-free near-dup graph (no cosine
    threshold to tune: mutuality itself is the selectivity, so the same
    setting works on corpora with different similarity distributions).
    Feeds :func:`~..operators.dedup.knn_dedup_clusters`.

    Scale shape: the graph is built once (:func:`knn_join`,
    localCheckpointed here because BOTH orientations consume it — two
    references plan independently, PLANS.md #11), then one self
    equi-join on the 5-rows-per-vector edge table — k·n rows a side,
    never the corpus.  Output canonical (vec_a < vec_b), dot carried
    from the forward edge (symmetric by construction)."""
    g = knn_join(embeddings, k, n_centroids, n_probe).localCheckpoint()
    fwd = g.select(
        F.col("q_id").alias("vec_a"), F.col("nb_id").alias("vec_b"), "dot_e12"
    )
    rev = g.select(F.col("nb_id").alias("vec_a"), F.col("q_id").alias("vec_b"))
    return (
        fwd.join(rev, ["vec_a", "vec_b"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "dot_e12")
    )


def ivf_stats(
    embeddings: DataFrame, n_centroids: int = C.IVF_CENTROIDS
) -> DataFrame:
    """IVF index-health report: per-inverted-list population plus its
    share and load factor (1e6 = perfectly balanced) — what an operator
    reads before trusting probe-count recall math, since a skewed list
    both hurts the blocked joins (hot block) and distorts recall (a probe
    into a mega-list scans half the corpus).  One skinny cent_id agg over
    the assignment; the totals ride a broadcast 1-row aggregate."""
    assigned = _ivf_assign(embeddings, n_centroids).select("cent_id")
    sizes = assigned.groupBy("cent_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors")
    )
    tot = sizes.agg(
        F.sum("n_vectors").alias("total"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    return (
        sizes.crossJoin(F.broadcast(tot))
        .select(
            F.col("cent_id").cast("long").alias("cent_id"),
            "n_vectors",
            F.expr("n_vectors * 1000000L DIV total").alias("share_micro"),
            # int64 bound: n_vectors * n_lists ~ total, so the product is
            # ~ total * 1e6 — exact while the indexed corpus stays under
            # ~9e12 vectors; past that, compute load from share_micro
            F.expr("n_vectors * n_lists * 1000000L DIV total").alias(
                "load_micro"
            ),
        )
    )


def label_separation(embeddings: DataFrame) -> DataFrame:
    """Embedding-space class-separation report: pairwise cosine between
    per-label centroids — the diagnostic an owner reads before trusting
    label-supervised operators (kNN classify, hard negatives, triplet
    mining): centroids near cosine 1 mean the classes are inseparable in
    this embedding space.  Centroid components are integer per-dim means
    (``(sum + n·1e6) div n − 1e6`` — positive-dividend shift so Spark DIV
    truncation == DuckDB floor for negative sums); cosine follows the
    `_pair_cos_r6` contract (exact int64 dots, IEEE sqrt/divide, round 6).

    Scale shape: ONE corpus pass (posexplode + map-side-combined
    (label, dim) aggregate); everything after runs on the
    |labels|·EMBED_DIM centroid frame (localCheckpointed — three plan
    branches consume it, PLANS.md #11), and the pair matrix is
    |labels|² rows."""
    comp = embeddings.select(
        F.col("label").cast("long").alias("label"),
        F.posexplode(fixed_point_vec(F.col("embedding"))).alias("dim", "v"),
    )
    cent = (
        comp.groupBy("label", "dim")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "label",
            "dim",
            F.expr("(s + n * 1000000L) DIV n - 1000000L").alias("c"),
            "n",
        )
        .localCheckpoint()
    )
    norms = cent.groupBy("label").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
        F.max("n").cast("long").alias("n"),
    )
    a = cent.select(F.col("label").alias("label_a"), "dim", F.col("c").alias("ca"))
    b = cent.select(F.col("label").alias("label_b"), "dim", F.col("c").alias("cb"))
    dots = (
        a.join(b, "dim")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("dotp"))
    )
    na = F.broadcast(
        norms.select(
            F.col("label").alias("label_a"),
            F.col("ss").alias("ss_a"),
            F.col("n").alias("n_a"),
        )
    )
    nb = F.broadcast(
        norms.select(
            F.col("label").alias("label_b"),
            F.col("ss").alias("ss_b"),
            F.col("n").alias("n_b"),
        )
    )
    return (
        dots.join(na, "label_a")
        .join(nb, "label_b")
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            F.when(
                (F.col("ss_a") == 0) | (F.col("ss_b") == 0),
                F.lit(0.0),
            )
            .otherwise(
                F.round(
                    F.col("dotp")
                    / (
                        F.sqrt(F.col("ss_a").cast("double"))
                        * F.sqrt(F.col("ss_b").cast("double"))
                    ),
                    6,
                )
            )
            .alias("cos_r6"),
        )
    )


def isotropy_report(embeddings: DataFrame) -> DataFrame:
    """Embedding-anisotropy report (Ethayarajh 2019's diagnostic, exact
    integer form): ``iso_e6 = centroid_sq_norm * 1e6 div mean_sq_norm``
    — the corpus centroid's squared norm as a fraction of the mean
    squared vector norm.  Near 0 = isotropic (directions cancel); near
    1e6 = a dominant common direction (cosine similarities inflated
    corpus-wide — the known failure mode that breaks cosine-threshold
    dedup and similarity bucketing).  One scalar row.

    Scale shape: one posexplode + per-dim map-side-combined aggregate
    (EMBED_DIM rows out), one fold over those 64 rows.  int64 bounds
    hold at ANY corpus size: the centroid component is the per-dim
    INTEGER MEAN (the label_separation positive-dividend shift, so
    Spark DIV == DuckDB floor on negative sums), giving
    ``centroid_sq <= 64e12`` unconditionally; under the L2-normalized
    contract ``centroid_sq <= mean_sq ~= 1e12`` so the 1e6-scaled
    ratio stays ~1e18 < 2^63."""
    comp = embeddings.select(
        F.posexplode(fixed_point_vec(F.col("embedding"))).alias("dim", "v")
    )
    per_dim = comp.groupBy("dim").agg(
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ssq"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        F.expr("(s + n * 1000000L) DIV n - 1000000L").alias("m"), "ssq", "n"
    )
    return per_dim.agg(
        F.max("n").cast("long").alias("n"),
        F.sum("ssq").cast("long").alias("sum_sq_norm_e12"),
        F.sum(F.col("m") * F.col("m")).cast("long").alias("centroid_sq_norm_e12"),
    ).select(
        "n",
        "sum_sq_norm_e12",
        F.expr("sum_sq_norm_e12 DIV n").alias("mean_sq_norm_e12"),
        "centroid_sq_norm_e12",
        F.expr(
            "centroid_sq_norm_e12 * 1000000L DIV (sum_sq_norm_e12 DIV n)"
        ).alias("iso_e6"),
    )


def knn_brute(embeddings: DataFrame, k: int = C.KNN_K) -> DataFrame:
    """Exact all-kNN ground truth: every (a, b) pair scored, per-query
    top-k — O(n^2) dots, the small-scale YARDSTICK for
    :func:`knn_recall` (the ngram_jaccard-brute precedent; at corpus
    scale the blocked :func:`knn_join` is the operator, this is the
    evaluation denominator run on a sample)."""
    c = embeddings.select("vec_id", fixed_point_vec(F.col("embedding")).alias("ev"))
    a = c.select(F.col("vec_id").alias("q_id"), F.col("ev").alias("qv"))
    pairs = a.join(c, a.q_id != c.vec_id).select(
        "q_id",
        F.col("vec_id").alias("nb_id"),
        _dot_vec(F.col("qv"), F.col("ev")).alias("dot_e12"),
    )
    return _knn_rank(pairs, k)


def _ivf_ranked_sided(
    embeddings: DataFrame, n_centroids: int, n_probe: int
) -> DataFrame:
    """:func:`_ivf_ranked` carrying a deterministic two-corpus split
    ``side = label % 2`` (the bitext stand-in for a language column —
    the fixture has no lang field; a real deployment substitutes it).
    Kept separate so the shared helper's plan (pinned by the knn tests)
    never changes."""
    cand = embeddings.select(
        "vec_id",
        F.pmod(F.col("label").cast("long"), F.lit(2)).alias("side"),
        fixed_point_vec(F.col("embedding")).alias("ev"),
    )
    scored = cand.join(F.broadcast(_centroids(embeddings, n_centroids))).select(
        "vec_id", "side", "ev", "cent_id",
        _dot_vec(F.col("ev"), F.col("cv")).alias("cdot"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cdot"), F.asc("cent_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n_probe)
        .localCheckpoint()
    )


def bitext_margin_pairs(
    embeddings: DataFrame,
    k: int = C.KNN_K,
    n_centroids: int = C.IVF_CENTROIDS,
    n_probe: int = C.IVF_PROBE,
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, the CCMatrix /
    LASER parallel-corpus miner): corpus split into two sides (here the
    deterministic ``label % 2`` stand-in for a language column); each
    side-0 anchor is paired with its nearest side-1 candidate and scored
    by the DISTANCE-margin criterion — how much the pair's similarity
    exceeds the mean of both endpoints' top-k cross-side neighborhoods.
    All-integer form: ``margin2k_e12 = 2k*dot - fwd_topk_sum -
    bwd_topk_sum`` (the avg margin scaled by 2k — same ordering, no
    division, |2k*dot| <= 2*5*64e12 << 2^63), plus ``is_mutual`` (the
    anchor is ALSO its candidate's best match — the high-precision
    filter).  Sums run over min(k, available) neighbors; an anchor whose
    candidate has no reverse neighborhood keeps NULL bwd/margin.

    Scale shape: one sided IVF ranking pass feeds BOTH directions'
    probe/assignment roles; each direction is the grouped-matmul
    per-list top-k kernel of :func:`knn_join` (never all-pairs), the
    per-anchor fold reuses each direction's q_id window exchange
    (subset rule, PLANS.md #37), and the final fwd⋈bwd join carries
    only skinny per-anchor stats rows."""
    ranked = _ivf_ranked_sided(embeddings, n_centroids, n_probe)
    shuffle_n = int(
        embeddings.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )

    def _probes(side: int) -> DataFrame:
        return ranked.where(F.col("side") == side).select(
            F.col("vec_id").alias("q_id"), F.col("ev").alias("qv"), "cent_id"
        )

    def _assigned(side: int) -> DataFrame:
        return ranked.where((F.col("rn") == 1) & (F.col("side") == side)).select(
            "cent_id", F.col("vec_id").alias("nb_id"), F.col("ev").alias("nv")
        )

    def _agg(pairs: DataFrame) -> DataFrame:
        top = _knn_rank(pairs, k)
        return top.groupBy("q_id").agg(
            F.sum("dot_e12").cast("long").alias("sum_e12"),
            F.max(F.when(F.col("rank") == 1, F.col("nb_id")))
            .cast("long")
            .alias("best_nb"),
            F.max(F.when(F.col("rank") == 1, F.col("dot_e12")))
            .cast("long")
            .alias("best_dot"),
        )

    fwd = _agg(_block_topk_pairs(_probes(0), _assigned(1), k, shuffle_n))
    bwd = _agg(_block_topk_pairs(_probes(1), _assigned(0), k, shuffle_n)).select(
        F.col("q_id").alias("b_id"),
        F.col("sum_e12").alias("bwd_sum_e12"),
        F.col("best_nb").alias("b_best"),
    )
    return fwd.join(bwd, fwd.best_nb == bwd.b_id, "left").select(
        F.col("q_id").alias("src_id"),
        F.col("best_nb").alias("tgt_id"),
        F.col("best_dot").alias("dot_e12"),
        F.col("sum_e12").alias("fwd_sum_e12"),
        "bwd_sum_e12",
        (
            F.lit(2 * k).cast("long") * F.col("best_dot")
            - F.col("sum_e12")
            - F.col("bwd_sum_e12")
        ).alias("margin2k_e12"),
        F.coalesce(F.col("b_best") == F.col("q_id"), F.lit(False)).alias(
            "is_mutual"
        ),
    )


def knn_recall(embeddings: DataFrame, k: int = C.KNN_K) -> DataFrame:
    """Graph-quality rollup for the IVF-blocked kNN join: ONE row —
    edge recall of :func:`knn_join` against the exact :func:`knn_brute`
    graph, plus rank-1 (nearest-neighbor) recall, both fixed-point.
    The evaluation an owner runs before trusting the blocked graph for
    dedup or retrieval (the ivf_recall/pq_recall precedent, aimed at the
    all-pairs operator)."""
    approx = knn_join(embeddings, k).localCheckpoint()
    brute = knn_brute(embeddings, k).localCheckpoint()
    hits = brute.join(
        approx.select("q_id", "nb_id"), ["q_id", "nb_id"], "left_semi"
    )
    hits1 = brute.where(F.col("rank") == 1).join(
        approx.where(F.col("rank") == 1).select("q_id", "nb_id"),
        ["q_id", "nb_id"],
        "left_semi",
    )
    return (
        brute.agg(F.count(F.lit(1)).alias("n_truth"))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
        .crossJoin(hits1.agg(F.count(F.lit(1)).alias("n_hits_rank1")))
        .crossJoin(
            brute.select("q_id").distinct().agg(
                F.count(F.lit(1)).alias("n_queries")
            )
        )
        .select(
            F.col("n_queries").cast("long").alias("n_queries"),
            F.col("n_truth").cast("long").alias("n_truth"),
            F.col("n_hits").cast("long").alias("n_hits"),
            F.expr("n_hits * 1000000L DIV n_truth").alias("recall_micro"),
            F.col("n_hits_rank1").cast("long").alias("n_hits_rank1"),
            F.expr("n_hits_rank1 * 1000000L DIV n_queries").alias(
                "recall1_micro"
            ),
        )
    )


def _prefix_dots_vec(a: Column, b: Column) -> Column:
    """Arrow kernel: the MRL_DIMS prefix dots of two fixed-point vectors
    in ONE pass (cumulative einsum over each prefix slice) — exact int64
    like :func:`_dot_vec`; returns array<long> aligned with
    contract.MRL_DIMS."""
    from pyspark.sql.functions import pandas_udf

    dims = C.MRL_DIMS

    @pandas_udf("array<long>")
    def pdots(x: pd.Series, y: pd.Series) -> pd.Series:
        if x.empty:
            return pd.Series([], dtype="object")
        A = np.stack(x.to_numpy()).astype(np.int64, copy=False)
        B = np.stack(y.to_numpy()).astype(np.int64, copy=False)
        P = A * B
        cs = np.cumsum(P, axis=1)
        out = np.stack([cs[:, d - 1] for d in dims], axis=1)
        return pd.Series(list(out))

    return pdots(a, b)


def mrl_recall(
    embeddings: DataFrame,
    n_queries: int = C.MULTI_QUERY_N,
    k: int = C.TOPK,
) -> DataFrame:
    """Matryoshka truncation-quality report (contract MRL note):
    (q_id, dim, n_overlap, recall_e6) — how much of the full-dim brute
    top-k each prefix dimension preserves.

    Scale shape: ONE broadcast-query scoring pass computes every prefix
    dot simultaneously (cumulative sums inside the Arrow kernel — never
    |MRL_DIMS| corpus passes), one (q_id, dim)-keyed row_number window
    over the scored frame, and the overlap join runs on the tiny
    (n_queries * |MRL_DIMS| * k) ranked frame."""
    # the full-dim frame anchors recall: if EMBED_DIM leaves MRL_DIMS the
    # report silently flatlines at 0 instead of failing (round-4 ADVICE.md;
    # mirrored by the comment at contract.MRL_DIMS)
    assert C.EMBED_DIM in C.MRL_DIMS, (
        f"mrl_recall needs the full dimension {C.EMBED_DIM} in MRL_DIMS "
        f"{C.MRL_DIMS} as the recall anchor"
    )
    qs = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        fixed_point_vec(F.col("embedding")).alias("qv"),
    )
    cand = embeddings.select(
        "vec_id", fixed_point_vec(F.col("embedding")).alias("ev")
    )
    scored = (
        cand.join(F.broadcast(qs))
        .select(
            "q_id",
            "vec_id",
            _prefix_dots_vec(F.col("ev"), F.col("qv")).alias("pd"),
            F.array(*[F.lit(d).cast("long") for d in C.MRL_DIMS]).alias(
                "dims"
            ),
        )
        .select(
            "q_id",
            "vec_id",
            F.explode(F.arrays_zip("dims", "pd")).alias("z"),
        )
        .select(
            "q_id",
            "vec_id",
            F.col("z.dims").cast("long").alias("dim"),
            F.col("z.pd").cast("long").alias("dot"),
        )
    )
    w = Window.partitionBy("q_id", "dim").orderBy(
        F.desc("dot"), F.asc("vec_id")
    )
    # the ranked frame feeds both sides of the overlap comparison —
    # pin it once (n_queries * |MRL_DIMS| * k rows) or the whole scoring
    # pass plans twice (PLANS.md #11)
    ranked = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "dim", "vec_id")
        .localCheckpoint(eager=True)
    )
    full = ranked.where(F.col("dim") == C.EMBED_DIM).select(
        F.col("q_id").alias("fq"), F.col("vec_id").alias("fv")
    )
    # left join + flag (NOT a semi join): a (q_id, dim) group with ZERO
    # overlap must still emit its recall-0 row
    return (
        ranked.join(
            F.broadcast(full),
            (ranked.q_id == full.fq) & (ranked.vec_id == full.fv),
            "left",
        )
        .groupBy("q_id", "dim")
        .agg(
            F.sum(F.col("fv").isNotNull().cast("long"))
            .cast("long")
            .alias("n_overlap")
        )
        .select(
            F.col("q_id").cast("long").alias("q_id"),
            "dim",
            "n_overlap",
            F.expr(f"(1000000 * n_overlap) div {k}").cast("long").alias(
                "recall_e6"
            ),
        )
    )
