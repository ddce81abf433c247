"""Property tests: the as-of window formulation and the chained-window
funnel must match brute-force Python oracles on randomized event streams
— including adversarial ts collisions the fixture never produces (the
unit suite pins specific edges; this sweeps the space)."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators import eventflow as EV

_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)
_TYPES = ("signup", "click", "purchase", "view")


def _gen(seed: int, n: int):
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        # coarse ts grid -> frequent collisions within and across users
        us = rng.randrange(0, 40) * 1_000
        rows.append(
            (
                i,
                base + dt.timedelta(microseconds=us),
                rng.randrange(0, 4),
                rng.choice(_TYPES),
                1.0,
                "{}",
            )
        )
    return rows


def _key(r):
    # the contract total order: (ts_us, event_id)
    return (int(r[1].timestamp() * 1_000_000), r[0])


def _brute_asof(rows):
    out = {}
    for r in rows:
        if r[3] != C.ASOF_LEFT:
            continue
        cands = [
            x
            for x in rows
            if x[3] == C.ASOF_RIGHT and x[2] == r[2]
            and int(x[1].timestamp() * 1_000_000)
            < int(r[1].timestamp() * 1_000_000)
        ]
        best = max(cands, key=_key, default=None)
        out[r[0]] = best[0] if best else None
    return out


def _brute_funnel(rows):
    out = {}
    users = {r[2] for r in rows}
    for u in users:
        mine = sorted((r for r in rows if r[2] == u), key=_key)
        ks = []
        prev = None
        for step in C.FUNNEL_STEPS:
            cands = [
                r for r in mine
                if r[3] == step and (prev is None or _key(r) > _key(prev))
            ]
            if not cands:
                break
            prev = min(cands, key=_key)
            ks.append(prev)
        if not ks:
            continue
        level = len(ks)
        completed = 0
        if level == len(C.FUNNEL_STEPS):
            span = _key(ks[-1])[0] - _key(ks[0])[0]
            completed = int(span <= C.FUNNEL_HORIZON_US)
        out[u] = (level, completed)
    return out


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_asof_matches_brute_force(spark, seed):
    rows = _gen(seed, 120)
    df = spark.createDataFrame(rows, _SCHEMA)
    got = {
        r["event_id"]: r["match_event_id"]
        for r in EV.asof_join_events(df).collect()
    }
    assert got == _brute_asof(rows)


@pytest.mark.parametrize("seed", [11, 12, 13, 14, 15])
def test_funnel_matches_brute_force(spark, seed):
    rows = _gen(seed, 120)
    df = spark.createDataFrame(rows, _SCHEMA)
    got = {
        r["user_id"]: (r["level"], r["completed"])
        for r in EV.event_funnel(df).collect()
    }
    assert got == _brute_funnel(rows)


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_range_join_matches_naive_on_random_intervals(spark, seed):
    """Bucketized range join == naive containment join on randomized
    interval sets: lengths from sub-bucket to many-bucket, arbitrary
    overlaps (a point inside k intervals emits k rows), boundary
    alignment at exact bucket multiples."""
    from pdf_extraction_and_query_spark import contract as C
    from pdf_extraction_and_query_spark.operators.eventflow import range_join

    rng = random.Random(seed)
    B = C.RANGE_BUCKET_S
    iv = [
        (
            rng.randrange(0, 3),
            i,
            (s := rng.randrange(0, 6 * B)),
            s + rng.choice([0, 5, B - 1, B, 3 * B + 7]),
        )
        for i, _ in enumerate(range(40))
    ]
    pts = [
        (rng.randrange(0, 4), 1000 + j, rng.randrange(0, 8 * B))
        for j in range(120)
    ] + [(u, 2000 + i, s) for (u, i, s, e) in iv[:10]]  # exact starts
    ivdf = spark.createDataFrame(
        iv, "user_id long, iv_id long, start_epoch long, end_epoch long"
    )
    pdf = spark.createDataFrame(pts, "user_id long, event_id long, ts_s long")
    got = sorted(
        (r["event_id"], r["iv_id"])
        for r in range_join(pdf, ivdf, keys=["user_id"]).collect()
    )
    naive = sorted(
        (p_eid, i_id)
        for (p_u, p_eid, p_ts) in pts
        for (i_u, i_id, i_s, i_e) in iv
        if p_u == i_u and i_s <= p_ts <= i_e
    )
    assert got == naive
