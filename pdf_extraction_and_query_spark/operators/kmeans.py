"""Trained k-means centroids (Lloyd's algorithm) over the embedding corpus
— the trained upgrade to the IVF family's deterministic first-N centroid
stand-in (reference analog: pgvector's ivfflat builds lists by k-means;
src/vector_store/pgvector_client.py's index DDL).

Determinism contract: init = the first KM_K corpus vectors (fixed-point
int64), assignment = exact int64 L2^2 argmin (ties -> smaller cent_id),
update = element-wise floor(sum / count) with the division done in float64
(|sum| <= cluster_rows * 1e6, exactly representable while clusters stay
under 2^53/1e6 ~ 9e9 rows — true even at a 10^12 corpus once k grows with
it; beyond that both engines would switch to exact big-int floor division
— DuckDB's `//` truncates toward zero, so it is NOT that operator), and
floor agrees bit-for-bit with the DuckDB oracle's
floor(cast(sum as double) / count); empty clusters carry the previous
centroid.  The whole loop is therefore a pure function of the
corpus — resumable, partitioning-invariant, and replayable in ANSI SQL by
unrolling KM_ITERS rounds (the PageRank unrolled-oracle precedent).

100-TB shape per iteration: ONE narrow Arrow assignment pass against the
broadcast centroid matrix (no shuffle — the pq_assign precedent), then one
skinny (cent_id, dim, val) shuffle with map-side partial aggregation (the
exchange carries at most k * EMBED_DIM rows per map task, never vectors).
Centroids are metadata (k x 64 ints) and live driver-side between rounds,
exactly like the PQ codebook.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import contract as C
from .search import fixed_point_vec, _dot_vec


def _init_np(embeddings: DataFrame, k: int) -> np.ndarray:
    """(k, EMBED_DIM) int64 init matrix = first-k corpus vectors, ordered
    by vec_id (metadata-sized collect)."""
    rows = (
        embeddings.where(F.col("vec_id") < k)
        .select("vec_id", fixed_point_vec(F.col("embedding")).alias("cv"))
        .orderBy("vec_id")
        .collect()
    )
    assert len(rows) == k, f"kmeans: expected {k} init vectors, got {len(rows)}"
    return np.array([r.cv for r in rows], dtype=np.int64)


def _assign_l2(cents: np.ndarray):
    """Arrow kernel: nearest centroid by exact L2^2 = (||c||^2 - 2 x.c)
    (the ||x||^2 term is constant per row — dropping it preserves order and
    ties, the pq.py _encode_kernel argument).  All intermediates are
    integer-valued float64 < 2^53: exact, so ties break exactly like the
    oracle's ORDER BY d, cent_id (np.argmin = first occurrence = smallest
    cent_id for rows ordered by cent_id)."""
    from pyspark.sql.functions import pandas_udf

    cf = cents.astype(np.float64)
    c2 = np.einsum("ij,ij->i", cf, cf)

    @pandas_udf("long")
    def assign(ev: pd.Series) -> pd.Series:
        if ev.empty:
            return pd.Series([], dtype="int64")
        E = np.stack(ev.to_numpy()).astype(np.float64)
        d = c2[None, :] - 2.0 * (E @ cf.T)
        return pd.Series(d.argmin(axis=1).astype(np.int64))

    return assign


def kmeans_np(
    embeddings: DataFrame, k: int = C.KM_K, iters: int = C.KM_ITERS
) -> np.ndarray:
    """Run ``iters`` Lloyd rounds; return the (k, EMBED_DIM) int64 trained
    centroid matrix.  Feed it to semdedup(cents=...) /
    ivf_topk_trained-style consumers as a FROZEN quantizer."""
    cents = _init_np(embeddings, k)
    ev = embeddings.select("vec_id", fixed_point_vec(F.col("embedding")).alias("ev"))
    for _ in range(iters):
        assigned = ev.select(_assign_l2(cents)(F.col("ev")).alias("cent_id"), "ev")
        sums = (
            assigned.select("cent_id", F.posexplode("ev").alias("dim", "val"))
            .groupBy("cent_id", "dim")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        nxt = cents.copy()  # empty clusters carry the previous centroid
        for r in sums:
            nxt[r.cent_id, r.dim] = int(np.floor(r.s / r.cnt))
        cents = nxt
    return cents


def _cents_df(embeddings: DataFrame, cents: np.ndarray) -> DataFrame:
    """Trained centroid matrix as a (cent_id, cv) frame — broadcast-sized,
    the shape search.assign_to_centroids consumes."""
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        [(i, [int(x) for x in cents[i]]) for i in range(len(cents))],
        "cent_id long, cv array<long>",
    )


def kmeans_centroids(
    embeddings: DataFrame, k: int = C.KM_K, iters: int = C.KM_ITERS
) -> DataFrame:
    """Driver/oracle surface of the trained quantizer: one scalar row per
    (cent_id, dim) — k * EMBED_DIM rows."""
    cents = kmeans_np(embeddings, k, iters)
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        [
            (int(i), int(j), int(cents[i, j]))
            for i in range(cents.shape[0])
            for j in range(cents.shape[1])
        ],
        "cent_id long, dim long, value long",
    )


def ivf_topk_trained(
    embeddings: DataFrame,
    k: int = C.TOPK,
    query_vec_id: int = 0,
    n_centroids: int = C.KM_K,
    iters: int = C.KM_ITERS,
    n_probe: int = C.IVF_PROBE,
) -> DataFrame:
    """ivf_topk against TRAINED centroids: assignment and probe selection
    both by exact L2^2 against the Lloyd quantizer (FAISS IVF semantics —
    trained lists are not unit vectors, so max-dot assignment would be
    wrong); candidate scoring stays the search metric (int64 inner
    product), ranked by TakeOrderedAndProject."""
    cents = kmeans_np(embeddings, n_centroids, iters)
    cf = cents.astype(np.float64)
    ev = embeddings.select("vec_id", fixed_point_vec(F.col("embedding")).alias("ev"))
    assigned = ev.select("vec_id", "ev", _assign_l2(cents)(F.col("ev")).alias("cent_id"))

    q_rows = (
        embeddings.where(F.col("vec_id") == query_vec_id)
        .select(fixed_point_vec(F.col("embedding")).alias("qv"))
        .collect()
    )
    qv = np.array(q_rows[0].qv, dtype=np.float64)
    d = np.einsum("ij,ij->i", cf, cf) - 2.0 * (cf @ qv)  # exact, see _assign_l2
    probe_ids = [int(i) for i in np.argsort(d, kind="stable")[:n_probe]]

    spark = embeddings.sparkSession
    q = spark.createDataFrame([([int(x) for x in qv],)], "qv array<long>")
    pruned = assigned.where(F.col("cent_id").isin(probe_ids))
    hits = pruned.crossJoin(F.broadcast(q)).select(
        "vec_id", _dot_vec(F.col("ev"), F.col("qv")).alias("dot_e12")
    )
    from .search import _rank_topk

    return _rank_topk(hits, k)
