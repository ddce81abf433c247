"""Event-stream analytics: as-of join tie/strictness semantics, funnel
ordering + horizon edges, retention arithmetic, HDR sketch merge law and
error bound — plus the fixture properties the oracles rely on (exact
2-decimal values, no per-user right-type ts ties for the ASOF oracle)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators import eventflow as EV
from pdf_extraction_and_query_spark.operators import sketches as SK

SF_DIR = "/root/testdata/sf0.001"

_SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"


def _ev(spark, rows):
    """rows: (event_id, us_offset, user_id, event_type[, value])."""
    base = dt.datetime(2024, 1, 1)
    data = [
        (
            r[0],
            base + dt.timedelta(microseconds=r[1]),
            r[2],
            r[3],
            float(r[4]) if len(r) > 4 else 1.0,
            "{}",
        )
        for r in rows
    ]
    return spark.createDataFrame(data, _SCHEMA)


# ---------------------------------------------------------------- fixture
def test_fixture_properties_back_the_oracles():
    con = duckdb.connect()
    # `value` is exactly 2-decimal -> round(value*100) is exact fixed-point
    bad = con.sql(
        f"SELECT count(*) FROM '{SF_DIR}/events.parquet' "
        "WHERE abs(value * 100 - round(value * 100)) > 1e-6 OR value < 0"
    ).fetchone()[0]
    assert bad == 0
    # no per-user right-type ts ties -> DuckDB ASOF (strict <) coincides
    # with the contract tie rule (max event_id among equal right ts)
    ties = con.sql(
        f"SELECT count(*) FROM (SELECT user_id, ts FROM '{SF_DIR}/events.parquet' "
        f"WHERE event_type = '{C.ASOF_RIGHT}' GROUP BY 1, 2 HAVING count(*) > 1)"
    ).fetchone()[0]
    assert ties == 0
    con.close()


# ----------------------------------------------------------------- as-of
def test_asof_strictly_earlier_and_tie_break(spark):
    rows = [
        # user 1: two clicks at the SAME ts before the purchase -> the
        # contract picks max event_id; a click AT the purchase ts is
        # excluded (strict <); a later click never matches
        (10, 1_000, 1, "click"),
        (11, 1_000, 1, "click"),
        (12, 5_000, 1, "click"),  # exactly at purchase ts -> excluded
        (13, 5_000, 1, "purchase"),
        (14, 9_000, 1, "click"),
        # user 2: purchase with no prior click -> null match
        (20, 2_000, 2, "purchase"),
        (21, 3_000, 2, "click"),
        (22, 7_000, 2, "purchase"),
    ]
    out = {
        r["event_id"]: r
        for r in EV.asof_join_events(_ev(spark, rows)).collect()
    }
    assert set(out) == {13, 20, 22}
    assert out[13]["match_event_id"] == 11  # max event_id at the tied ts
    assert out[13]["lag_us"] == 4_000
    assert out[20]["match_event_id"] is None
    assert out[20]["lag_us"] is None
    assert out[22]["match_event_id"] == 21
    assert out[22]["lag_us"] == 4_000


def test_asof_matches_duckdb_asof_join(spark):
    """The Spark window formulation == DuckDB's native ASOF LEFT JOIN on
    the real fixture (independent algorithms, same answer)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = {
        r["event_id"]: (r["match_event_id"], r["lag_us"])
        for r in EV.asof_join_events(ev).collect()
    }
    con = duckdb.connect()
    exp = con.sql(
        f"""
        WITH e AS (SELECT event_id, user_id, epoch_us(ts) ts_us, event_type
                   FROM '{SF_DIR}/events.parquet')
        SELECT l.event_id, r.event_id, l.ts_us - r.ts_us
        FROM (SELECT * FROM e WHERE event_type = '{C.ASOF_LEFT}') l
        ASOF LEFT JOIN (SELECT * FROM e WHERE event_type = '{C.ASOF_RIGHT}') r
          ON l.user_id = r.user_id AND r.ts_us < l.ts_us
        """
    ).fetchall()
    con.close()
    assert got == {e: (m, g) for e, m, g in exp}


# ---------------------------------------------------------------- funnel
def test_funnel_order_strictness_and_horizon(spark):
    h = C.FUNNEL_HORIZON_US
    rows = [
        # user 1: click BEFORE signup doesn't count; the later click does
        (10, 1_000, 1, "click"),
        (11, 2_000, 1, "signup"),
        (12, 3_000, 1, "click"),
        (13, 4_000, 1, "purchase"),
        # user 2: click at EXACTLY the signup ts (larger event_id) counts
        # (strictly after in the (ts, event_id) order)
        (20, 1_000, 2, "signup"),
        (21, 1_000, 2, "click"),
        (22, 2_000, 2, "purchase"),
        # user 3: purchase exactly AT the horizon -> completed
        (30, 0, 3, "signup"),
        (31, 500, 3, "click"),
        (32, h, 3, "purchase"),
        # user 4: purchase one us past the horizon -> level 3, not completed
        (40, 0, 4, "signup"),
        (41, 500, 4, "click"),
        (42, h + 1, 4, "purchase"),
        # user 5: no signup -> no row
        (50, 1_000, 5, "click"),
        (51, 2_000, 5, "purchase"),
        # user 6: signup only -> level 1
        (60, 1_000, 6, "signup"),
    ]
    out = {r["user_id"]: r for r in EV.event_funnel(_ev(spark, rows)).collect()}
    assert set(out) == {1, 2, 3, 4, 6}
    assert (out[1]["level"], out[1]["completed"]) == (3, 1)
    assert out[1]["t2_us"] > out[1]["t1_us"]
    assert (out[2]["level"], out[2]["completed"]) == (3, 1)
    assert (out[3]["level"], out[3]["completed"]) == (3, 1)
    assert (out[4]["level"], out[4]["completed"]) == (3, 0)
    assert (out[6]["level"], out[6]["t2_us"], out[6]["t3_us"]) == (1, None, None)


def test_funnel_report_composition(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    f = EV.event_funnel(ev).collect()
    rep = EV.funnel_report(ev).collect()[0]
    n1 = sum(1 for r in f if r["level"] >= 1)
    n2 = sum(1 for r in f if r["level"] >= 2)
    n3 = sum(1 for r in f if r["level"] >= 3)
    nc = sum(r["completed"] for r in f)
    assert (rep["n_step1"], rep["n_step2"], rep["n_step3"], rep["n_completed"]) == (
        n1, n2, n3, nc,
    )
    assert rep["conv1_2_e6"] == 1_000_000 * n2 // max(n1, 1)
    assert rep["completion_e6"] == 1_000_000 * nc // max(n1, 1)


# ------------------------------------------------------------- retention
def test_retention_cohort_arithmetic(spark):
    wk = C.WEEK_S * 1_000_000
    rows = [
        # cohort week 2817 (2024-01-01 falls in epoch week 2817): users
        # 1,2 active week 0; user 1 returns in week 1; user 2 in week 2
        (10, 0, 1, "view"),
        (11, wk + 5, 1, "view"),
        (12, 10, 2, "view"),
        (13, 2 * wk + 5, 2, "view"),
        # user 3 first appears in week 1 -> its own cohort
        (14, wk + 50, 3, "view"),
    ]
    out = {
        (r["cohort_week"], r["age_weeks"]): r
        for r in EV.retention_cohorts(_ev(spark, rows)).collect()
    }
    c0 = dt.datetime(2024, 1, 1).timestamp() // C.WEEK_S
    assert (c0, 0) in out and out[(c0, 0)]["n_active"] == 2
    assert out[(c0, 0)]["retained_e6"] == 1_000_000
    assert out[(c0, 1)]["n_active"] == 1
    assert out[(c0, 1)]["n_cohort"] == 2
    assert out[(c0, 1)]["retained_e6"] == 500_000
    assert out[(c0, 2)]["n_active"] == 1
    assert out[(c0 + 1, 0)]["n_active"] == 1


def test_retention_age_cap(spark):
    wk = C.WEEK_S * 1_000_000
    rows = [(10, 0, 1, "view"),
            (11, (C.RETENTION_MAX_WEEKS + 3) * wk, 1, "view")]
    ages = {
        r["age_weeks"]
        for r in EV.retention_cohorts(_ev(spark, rows)).collect()
    }
    assert ages == {0}


# ------------------------------------------------------------ HDR sketch
def test_hdr_merge_law(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    whole = {
        (r["key"], r["bucket"]): (r["lb"], r["cnt"])
        for r in SK.hdr_sketch(ev).collect()
    }
    merged = {
        (r["key"], r["bucket"]): (r["lb"], r["cnt"])
        for r in SK.hdr_merge(SK.hdr_sketch(a), SK.hdr_sketch(b)).collect()
    }
    assert whole == merged


def test_hdr_estimate_bounds(spark):
    """est <= exact (lower bounds) and relative error < 2^-(S-1)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    bound = 1_000_000 // (1 << (C.HDR_SUB_BITS - 1))
    for r in SK.hdr_quantiles(ev).collect():
        for p in C.HDR_PCTS:
            est, exact, err = r[f"est{p}_e2"], r[f"exact{p}_e2"], r[f"err{p}_e6"]
            assert est <= exact
            assert err <= 0
            assert -err <= bound, (p, est, exact, err)


def test_hdr_bucket_monotone(spark):
    """bucket(v) is nondecreasing in v and lb(v) <= v < lb + 2^e —
    the property that makes cumulative-count quantile readout exact."""
    vals = list(range(0, 300)) + [2**k + d for k in range(8, 17) for d in (-1, 0, 1)]
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1), 1, "t", v / 100.0, "{}") for i, v in enumerate(sorted(vals))],
        _SCHEMA,
    )
    sk = SK.hdr_sketch(df)
    rows = sk.orderBy("bucket").collect()
    lbs = [r["lb"] for r in rows]
    assert lbs == sorted(lbs)
    s = C.HDR_SUB_BITS
    for r in rows:
        e = max(0, r["bucket"] // (1 << s))
        assert r["lb"] <= max(vals)
        assert r["lb"] % (1 << e) == 0


# ------------------------------------------------------------ range join
def test_range_join_matches_naive_join(spark):
    """Bucketized equi-join == the naive containment join on intervals
    that span multiple buckets, sub-bucket intervals, boundary points,
    and points outside every interval."""
    B = C.RANGE_BUCKET_S
    iv = spark.createDataFrame(
        [
            (1, 10, 0, 2 * B + 100),      # spans 3 buckets
            (1, 11, 3 * B, 3 * B + 5),    # sub-bucket
            (2, 20, 50, 60),
        ],
        "user_id long, iv_id long, start_epoch long, end_epoch long",
    )
    pts = spark.createDataFrame(
        [
            (1, 100, 0),            # at interval start (inclusive)
            (1, 101, 2 * B + 100),  # at interval end (inclusive)
            (1, 102, 2 * B + 101),  # one past the end -> no match
            (1, 103, 3 * B + 2),    # inside the sub-bucket interval
            (2, 104, 55),
            (2, 105, 3 * B),        # no interval for user 2 there
            (3, 106, 55),           # user with no intervals
        ],
        "user_id long, event_id long, ts_s long",
    )
    from pdf_extraction_and_query_spark.operators.eventflow import range_join

    got = sorted(
        (r["event_id"], r["iv_id"])
        for r in range_join(pts, iv, keys=["user_id"]).collect()
    )
    naive = sorted(
        (r["event_id"], r["iv_id"])
        for r in pts.join(iv, "user_id")
        .where("ts_s >= start_epoch and ts_s <= end_epoch")
        .collect()
    )
    assert got == naive
    assert got == [(100, 10), (101, 10), (103, 11), (104, 20)]


def test_range_join_plan_has_no_cross_product(spark):
    """The whole point: the physical plan must be a hash/sort-merge
    equi-join on (keys, bucket), never BroadcastNestedLoopJoin or
    CartesianProduct."""
    from pdf_extraction_and_query_spark.operators import eventflow as EVF

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    plan = (
        EVF.session_attribution(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_session_attribution_partitions_events(spark):
    """Sessions partition each user's events (gap rule), so attribution
    emits exactly one row per event and every event lands in the session
    sessionize assigned around it."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    from pdf_extraction_and_query_spark.operators.eventflow import (
        session_attribution,
    )

    out = session_attribution(ev).collect()
    assert len(out) == ev.count()
    assert len({r["event_id"] for r in out}) == len(out)
    for r in out[:50]:
        assert r["start_epoch"] <= r["ts_s"] <= r["end_epoch"]


# -------------------------------------------------------- rollup cascade
def test_rollup_cascade_equals_direct(spark):
    """The cascade invariant, Spark-side: daily re-aggregated FROM the
    hourly partials == daily computed directly from raw events (the
    oracle proves the same cross-engine; this pins it in-plan), and the
    hour->day register max-merge == day-grain registers computed
    directly (the merge law that lets count-distinct cascade)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    day = "cast(floor(unix_timestamp(ts) / 86400) * 86400 as long)"
    direct = {
        (r["event_type"], r["day_epoch"]): (
            r["n"], r["mn"], r["mx"], r["sm"], r["du"]
        )
        for r in ev.selectExpr(
            "event_type",
            f"{day} as day_epoch",
            "cast(round(value * 100) as long) as v",
            "user_id",
        )
        .groupBy("event_type", "day_epoch")
        .agg(
            F.count("*").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.sum("v").alias("sm"),
            F.count_distinct("user_id").alias("du"),
        )
        .collect()
    }
    casc = EV.rollup_cascade(ev).collect()
    assert len(casc) == len(direct)
    bound = 1_000_000  # HLL est within 2x at tiny per-group cardinalities
    for r in casc:
        n, mn, mx, sm, du = direct[(r["event_type"], r["day_epoch"])]
        assert (r["n_events"], r["min_value_e2"], r["max_value_e2"],
                r["sum_value_e2"], r["users_exact"]) == (n, mn, mx, sm, du)
        assert abs(r["err_e6"]) <= bound

    merged = EV.rollup_user_registers(ev, bucket_s=3600)
    dayr = (F.floor(F.col("bucket_epoch") / 86400) * 86400).cast("long")
    from_hours = sorted(
        map(
            tuple,
            merged.groupBy("event_type", dayr.alias("bucket_epoch"), "j")
            .agg(F.max("rank").alias("rank"))
            .collect(),
        )
    )
    direct_regs = sorted(
        map(tuple, EV.rollup_user_registers(ev, bucket_s=86400).collect())
    )
    assert from_hours == direct_regs


# ------------------------------------------------------------- anomalies
def test_rollup_anomalies_median_mad_semantics(spark):
    """Lower-median rank rule, MAD over deviations, and the k*MAD flag on
    a handcrafted frame: type A has hours [2,2,2,3,100] -> med 2, devs
    [0,0,0,1,98] -> mad 0 -> threshold k*max(mad,1)=3 -> only the
    100-event hour flags; even-count type B takes the LOWER median."""
    rows = []
    eid = 0
    # type A: 4 calm hours + 1 spike
    for h, n in enumerate([2, 2, 2, 3, 100]):
        for _ in range(n):
            rows.append((eid, h * 3600 * 1_000_000 + eid, 1, "a"))
            eid += 1
    # type B: counts [1, 3] -> lower median = 1
    for h, n in enumerate([1, 3]):
        for _ in range(n):
            rows.append((eid, h * 3600 * 1_000_000 + eid, 1, "b"))
            eid += 1
    out = {
        (r["event_type"], r["hour_epoch"]): r
        for r in EV.rollup_anomalies(_ev(spark, rows)).collect()
    }
    base = int(dt.datetime(2024, 1, 1).timestamp())
    a = [out[("a", base + h * 3600)] for h in range(5)]
    assert all(r["med"] == 2 and r["mad"] == 0 for r in a)
    assert [r["is_anomaly"] for r in a] == [0, 0, 0, 0, 1]
    b = [out[("b", base + h * 3600)] for h in range(2)]
    assert all(r["med"] == 1 for r in b)  # lower median of [1, 3]


# ------------------------------------------------------------ plan shapes
def test_asof_and_funnel_are_single_exchange(spark):
    """The scale claims in the module docstring, pinned: as-of and funnel
    plans contain exactly ONE Exchange (the user_id shuffle) — the
    chained funnel windows and the per-user collapse all reuse it —
    and the event_type filter reaches the scan."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    for df in (EV.asof_join_events(ev), EV.event_funnel(ev)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        assert "PushedFilters: [In(event_type" in plan or "DataFilters: [event_type" in plan, plan


def test_event_interarrival_hand_computed(spark):
    """User 1: events at 0, 100, 350 µs -> gaps 100 (type b), 250
    (type a); user 2: single event -> no gap; gaps key by the LATER
    event's type; exact min/mean/max per type; HDR estimate >= the
    true value (bucket lower bound is a floor of a covering bucket)."""
    ev = _ev(
        spark,
        [
            (1, 0, 1, "a"),
            (2, 100, 1, "b"),
            (3, 350, 1, "a"),
            (4, 500, 2, "a"),
        ],
    )
    rows = {r["event_type"]: r for r in EV.event_interarrival(ev).collect()}
    assert set(rows) == {"a", "b"}
    a = rows["a"]
    assert (a["n"], a["min_us"], a["mean_us"], a["max_us"]) == (1, 250, 250, 250)
    b = rows["b"]
    assert (b["n"], b["min_us"], b["max_us"]) == (1, 100, 100)
    # single-value keys: every estimate is that value's bucket floor
    for r in rows.values():
        for p in C.HDR_PCTS:
            assert r[f"est{p}_us"] <= r["max_us"]
            assert r[f"est{p}_us"] >= 0


def test_event_interarrival_gap_zero_and_tie_order(spark):
    """Simultaneous events for one user: the (ts_us, event_id) total
    order makes the gap 0 and keys it by the higher event_id's type."""
    ev = _ev(spark, [(1, 0, 1, "a"), (2, 0, 1, "b")])
    rows = {r["event_type"]: r for r in EV.event_interarrival(ev).collect()}
    assert set(rows) == {"b"}
    assert (rows["b"]["n"], rows["b"]["min_us"]) == (1, 0)
