"""Randomized equality sweep for bitext_margin_pairs: an independent
pure-numpy replay of the WHOLE contract (fixed-point encode, IVF
centroid ranking with (cdot desc, cent_id asc) tie-break, probe/assign
roles, cross-side pairing, per-anchor top-k with (dot desc, nb asc)
tie-break, sums, margins, mutual flag) must match the engine on random
frames — the same style as the range-join and eventflow fuzz suites.
Components are drawn from an integer grid / 1e6 so fixed-point encode
is rounding-free in both implementations.
"""

from __future__ import annotations

import random

import numpy as np

from pdf_extraction_and_query_spark.operators import search as S


def _replay(vecs, labels, k, ncent, nprobe):
    ev = np.array(vecs, dtype=np.int64)  # already e6 integers
    n = len(vecs)
    sides = [lb % 2 for lb in labels]
    cents = ev[:ncent]
    # per-vector centroid ranking: cdot desc, cent_id asc
    probes, assign = {}, {}
    for v in range(n):
        cd = ev[v] @ cents.T
        order = sorted(range(ncent), key=lambda c: (-cd[c], c))
        probes[v] = set(order[:nprobe])
        assign[v] = order[0]
    # cross-side pairs inside probed lists
    pairs = {}  # q -> list[(dot, nb)]
    for q in range(n):
        for nb in range(n):
            if sides[q] == sides[nb]:
                continue
            if assign[nb] in probes[q]:
                pairs.setdefault(q, []).append(
                    (int(ev[q] @ ev[nb]), nb)
                )
    agg = {}
    for q, lst in pairs.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        top = lst[:k]
        agg[q] = (
            sum(d for d, _ in top),
            top[0][1],
            top[0][0],
        )
    out = {}
    for q in agg:
        if sides[q] != 0:
            continue
        fwd_sum, best_nb, best_dot = agg[q]
        b = agg.get(best_nb)
        bwd_sum = b[0] if b else None
        margin = (
            2 * k * best_dot - fwd_sum - bwd_sum
            if bwd_sum is not None
            else None
        )
        mutual = bool(b) and b[1] == q
        out[q] = (best_nb, best_dot, fwd_sum, bwd_sum, margin, mutual)
    return out


def test_bitext_fuzz_matches_numpy_replay(spark):
    rng = random.Random(20260820)
    for trial in range(3):
        n = rng.choice([12, 20, 28])
        dim = rng.choice([4, 8])
        ncent = rng.choice([3, 4])
        nprobe = 2
        k = rng.choice([2, 3])
        vecs = [
            [rng.randint(-9, 9) * 100_000 for _ in range(dim)]
            for _ in range(n)
        ]
        labels = [rng.randint(0, 5) for _ in range(n)]
        emb = spark.createDataFrame(
            [
                (i, [x / 1e6 for x in vecs[i]], labels[i])
                for i in range(n)
            ],
            "vec_id long, embedding array<double>, label long",
        )
        got = {
            r["src_id"]: (
                r["tgt_id"],
                r["dot_e12"],
                r["fwd_sum_e12"],
                r["bwd_sum_e12"],
                r["margin2k_e12"],
                r["is_mutual"],
            )
            for r in S.bitext_margin_pairs(
                emb, k=k, n_centroids=ncent, n_probe=nprobe
            ).collect()
        }
        want = _replay(vecs, labels, k, ncent, nprobe)
        assert got == want, f"trial {trial}: {got} != {want}"
