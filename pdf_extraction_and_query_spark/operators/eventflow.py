"""Event-stream analytics over the events table — the operational twin of
the corpus operators: as-of join, ordered conversion funnel, and weekly
retention cohorts.  These are the operators Spark has no built-in for
(as-of join, windowFunnel) re-expressed as window/aggregate compositions,
the task brief's "composition of existing DataFrame ops" tier.

Reference parity: the reference's analytics surface is batch aggregates
over evaluation runs (scripts/analyze_results.py:40-60); this family is
the extension surface the brief asks for beyond it (event-time analytics a
training-data platform runs over its ingestion/usage telemetry).

Determinism contract (contract.py EVT_*, FUNNEL_*, RETENTION_*): no
double ever aggregates — timestamps are exact epoch microseconds, every
ordering is the (ts_us, event_id) total order encoded as the fixed-width
sortable string key EVT_KEY_FMT (byte-wise min/compare is engine-neutral;
struct min is not portable to the DuckDB oracle).

Scale notes (100 TB design):
  * asof_join_events: ONE exchange on user_id; the window state is O(1)
    per row (last-seen right summary), never a per-user buffer.  The
    event_type filter pushes to the scan.
  * event_funnel: the three chained "earliest admissible step" minima are
    unbounded windows over the SAME user_id partitioning — one exchange,
    three pipelined Window operators, and the final per-user collapse
    reuses the partitioning (no second exchange).  The join-per-step
    alternative (the oracle's formulation) would re-shuffle the event
    stream once per step.
  * retention_cohorts: cohort week is a window min over the same single
    user_id exchange; the (user, week) collapse reuses the partitioning;
    only the (cohort, age) summary frame (users x weeks upper bound,
    heavily collapsed) crosses the second exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import contract as C


def _evt_key(ts_us: Column, event_id: Column) -> Column:
    """The (ts_us, event_id) total order as a fixed-width sortable string
    (contract EVT_KEY_FMT)."""
    return F.format_string(C.EVT_KEY_FMT, ts_us, event_id)


def _evt_base(events: DataFrame, types: tuple[str, ...]) -> DataFrame:
    """(user_id, event_type, event_id, ts_us, k) for the given types —
    the narrow pushed-down projection every operator here starts from."""
    # the fixture ts is TIMESTAMP_NTZ: unix_micros() rejects it and a cast
    # to TIMESTAMP would inject the session timezone — wall-clock diff from
    # the epoch is tz-independent and equals DuckDB epoch_us exactly
    ts_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    ).cast("long")
    return events.where(F.col("event_type").isin(*types)).select(
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        F.col("event_id").cast("long").alias("event_id"),
        ts_us.alias("ts_us"),
        _evt_key(ts_us, F.col("event_id")).alias("k"),
    )


def asof_join_events(
    events: DataFrame,
    left_type: str = C.ASOF_LEFT,
    right_type: str = C.ASOF_RIGHT,
) -> DataFrame:
    """As-of join: each ``left_type`` event matched to the latest
    STRICTLY-earlier ``right_type`` event of the same user (DuckDB
    ``ASOF LEFT JOIN ... ON r.ts_us < l.ts_us`` semantics; ties on right
    ts broken by max event_id — contract.py).

    Shape: instead of a range join (quadratic in collisions) the two
    streams stay ONE stream: a single user_id window ordered so that at
    equal ts every left row sorts BEFORE every right row, with frame
    ``rowsBetween(unboundedPreceding, -1)`` — so a right event at exactly
    the left ts is outside the frame (strict <), and ``last(right_summary,
    ignorenulls)`` is the as-of match.  One exchange; O(1) window state.
    """
    ev = _evt_base(events, (left_type, right_type))
    # left rows order before right rows at equal ts -> strict-< frame
    type_rank = F.when(F.col("event_type") == left_type, F.lit(0)).otherwise(
        F.lit(1)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", type_rank, "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    right_summary = F.when(
        F.col("event_type") == right_type,
        F.struct(
            F.col("ts_us").alias("r_ts_us"),
            F.col("event_id").alias("r_event_id"),
        ),
    )
    j = ev.withColumn("r", F.last(right_summary, ignorenulls=True).over(w))
    return j.where(F.col("event_type") == left_type).select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("r.r_event_id").cast("long").alias("match_event_id"),
        F.col("r.r_ts_us").cast("long").alias("match_ts_us"),
        (F.col("ts_us") - F.col("r.r_ts_us")).cast("long").alias("lag_us"),
    )


def event_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = C.FUNNEL_STEPS,
    horizon_us: int = C.FUNNEL_HORIZON_US,
) -> DataFrame:
    """Ordered conversion funnel (ClickHouse windowFunnel analog): per
    user, step k is the EARLIEST ``steps[k]`` event strictly after the
    chosen step k-1 event in the (ts_us, event_id) order; ``completed``
    iff the last step lands within ``horizon_us`` of step 1.  Users with
    no step-1 event emit no row.

    One exchange on user_id; the chained minima are pipelined unbounded
    windows over that partitioning (module docstring).
    """
    ev = _evt_base(events, steps)
    w = Window.partitionBy("user_id")
    cur = ev
    prev_k = None
    for i, step in enumerate(steps):
        admissible = F.col("event_type") == step
        if prev_k is not None:
            admissible = admissible & (F.col("k") > F.col(prev_k))
        cur = cur.withColumn(
            f"k{i + 1}", F.min(F.when(admissible, F.col("k"))).over(w)
        )
        prev_k = f"k{i + 1}"
    ks = [f"k{i + 1}" for i in range(len(steps))]
    per_user = (
        cur.groupBy("user_id")
        .agg(*[F.min(k).alias(k) for k in ks])
        .where(F.col("k1").isNotNull())
    )
    ts_cols = [
        F.substring(F.col(k), 1, 20).cast("long").alias(f"t{i + 1}_us")
        for i, k in enumerate(ks)
    ]
    level = sum(
        (F.col(k).isNotNull().cast("long") for k in ks),
        F.lit(0).cast("long"),
    )
    last_t = F.substring(F.col(ks[-1]), 1, 20).cast("long")
    first_t = F.substring(F.col(ks[0]), 1, 20).cast("long")
    completed = (
        F.col(ks[-1]).isNotNull() & ((last_t - first_t) <= F.lit(horizon_us))
    ).cast("long")
    return per_user.select(
        "user_id",
        *ts_cols,
        level.alias("level"),
        completed.alias("completed"),
    )


def funnel_report(events: DataFrame) -> DataFrame:
    """ONE row: users entering each funnel step, completions within the
    horizon, and fixed-point step conversions — the dashboard read over
    :func:`event_funnel`'s per-user frame (which is already a per-user
    summary; this is a tiny second aggregate)."""
    f = event_funnel(events)
    n = len(C.FUNNEL_STEPS)
    aggs = [
        F.sum((F.col("level") >= i + 1).cast("long")).alias(f"n_step{i + 1}")
        for i in range(n)
    ] + [F.sum("completed").cast("long").alias("n_completed")]
    rep = f.agg(*aggs)
    convs = [
        F.expr(
            f"(1000000 * n_step{i + 1}) div greatest(n_step{i}, 1)"
        ).alias(f"conv{i}_{i + 1}_e6")
        for i in range(1, n)
    ]
    completion = F.expr(
        "(1000000 * n_completed) div greatest(n_step1, 1)"
    ).alias("completion_e6")
    return rep.select(
        *[F.col(f"n_step{i + 1}").cast("long") for i in range(n)],
        F.col("n_completed").cast("long"),
        *convs,
        completion,
    )


def retention_cohorts(
    events: DataFrame, max_weeks: int = C.RETENTION_MAX_WEEKS
) -> DataFrame:
    """Weekly retention matrix: cohort = epoch-aligned week of the user's
    first event; one row per (cohort_week, age_weeks) with the number of
    cohort users active at that age and the fixed-point retained ratio
    (age 0 is the cohort size by construction — a user's first event is
    in the cohort week).

    One exchange on user_id (cohort window + (user, week) collapse share
    it); the (cohort, age) rollup and the cohort-size window run over the
    collapsed summary frame only.
    """
    week = F.floor(F.unix_timestamp("ts") / C.WEEK_S).cast("long")
    ev = events.select(F.col("user_id").cast("long").alias("user_id"), week.alias("week"))
    w = Window.partitionBy("user_id")
    with_cohort = ev.withColumn("cohort_week", F.min("week").over(w))
    active = (
        with_cohort.groupBy("user_id", "cohort_week", "week")
        .agg(F.count("*").alias("_n"))
        .withColumn("age_weeks", (F.col("week") - F.col("cohort_week")).cast("long"))
        .where(F.col("age_weeks") <= max_weeks)
    )
    mat = active.groupBy("cohort_week", "age_weeks").agg(
        F.count("*").cast("long").alias("n_active")
    )
    wc = Window.partitionBy("cohort_week")
    return mat.withColumn(
        "n_cohort",
        F.max(F.when(F.col("age_weeks") == 0, F.col("n_active")))
        .over(wc)
        .cast("long"),
    ).select(
        "cohort_week",
        "age_weeks",
        "n_active",
        "n_cohort",
        F.expr("(1000000 * n_active) div greatest(n_cohort, 1)")
        .cast("long")
        .alias("retained_e6"),
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_col: str = "ts_s",
    start_col: str = "start_epoch",
    end_col: str = "end_epoch",
    bucket_s: int = C.RANGE_BUCKET_S,
) -> DataFrame:
    """Generic bucketized range (interval-containment) join — the operator
    Spark would otherwise plan as a BroadcastNestedLoopJoin (quadratic in
    collisions): each interval explodes to the ``bucket_s``-wide epoch
    buckets it covers, each point hashes to exactly ONE bucket, and the
    join is a plain shuffled equi-join on (*keys, bucket) followed by the
    containment filter.  A point lies in one bucket only, so no post-join
    dedup is needed (contract.py RANGE_BUCKET_S).  Inclusive on both ends.

    100-TB shape: one hash exchange per side on (*keys, bucket); interval
    fanout is ceil(length/bucket)+1 summary rows per interval; no
    cross-product plan node ever appears (asserted in
    tests/test_eventflow.py)."""
    ib = intervals.withColumn(
        "_rb",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {bucket_s}"),
                F.expr(f"{end_col} div {bucket_s}"),
            )
        ),
    )
    pb = points.withColumn("_rb", F.expr(f"{point_col} div {bucket_s}"))
    return (
        pb.join(ib, [*keys, "_rb"])
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_rb")
    )


def session_attribution(events: DataFrame) -> DataFrame:
    """Every event attributed to the session window containing it — the
    range-join demo over :func:`~..operators.stats.sessionize`'s interval
    table (at 10^12 events the intervals are the maintained session store,
    not recomputed inline).  The gap rule makes sessions partition each
    user's events, so the output has exactly one row per event (invariant
    unit-tested)."""
    from .stats import sessionize

    pts = events.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("ts_s"),
    )
    return range_join(pts, sessionize(events), keys=["user_id"]).select(
        "event_id",
        "user_id",
        "event_type",
        "ts_s",
        F.col("session_id").cast("long").alias("session_id"),
        "start_epoch",
        "end_epoch",
    )


def rollup_hourly(events: DataFrame) -> DataFrame:
    """The hourly continuous-aggregate partial table (hypertable rollup):
    per (event_type, hour) count / min / max / SUM over exact fixed-point
    values — every column re-folds associatively to coarser grains, which
    is the cascade invariant :func:`rollup_cascade` tests.  The value sum
    is exact int64 (value_e2 is exact fixed-point), unlike a float sum
    which would be order-dependent and could NOT be cascaded
    deterministically.  ONE map-side-combined exchange."""
    from .sketches import _value_e2

    hour = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    return events.groupBy(
        F.col("event_type"), hour.alias("hour_epoch")
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.min(_value_e2(F.col("value"))).cast("long").alias("min_value_e2"),
        F.max(_value_e2(F.col("value"))).cast("long").alias("max_value_e2"),
        F.sum(_value_e2(F.col("value"))).cast("long").alias("sum_value_e2"),
    )


def rollup_user_registers(events: DataFrame, bucket_s: int = 3600) -> DataFrame:
    """(event_type, bucket_epoch, j, rank): per-group HLL registers over
    the DISTINCT active users — the sketch that makes count-distinct
    cascade (register max-merge over any regrouping == the registers of
    the union set).  poly_hash runs once per distinct (group, user)
    (PLANS.md #31)."""
    from .sketches import _hll_rank
    from .textstats import poly_hash

    bucket = (
        F.floor(F.unix_timestamp("ts") / bucket_s) * bucket_s
    ).cast("long")
    du = (
        events.select(
            "event_type",
            bucket.alias("bucket_epoch"),
            F.col("user_id").cast("long").alias("user_id"),
        )
        .distinct()
    )
    h = du.select(
        "event_type",
        "bucket_epoch",
        poly_hash(F.col("user_id").cast("string")).alias("h"),
    )
    jr = h.select(
        "event_type",
        "bucket_epoch",
        (F.col("h") % C.HLL_M).cast("long").alias("j"),
        _hll_rank(F.expr(f"h div {C.HLL_M}")).alias("r"),
    )
    return jr.groupBy("event_type", "bucket_epoch", "j").agg(
        F.max("r").cast("long").alias("rank")
    )


def cascade_from_partials(hourly: DataFrame, hregs: DataFrame) -> DataFrame:
    """The daily cascade read tail every partial source shares (inline
    hourly partials or the streaming index's merged base ∪ deltas):
    count/min/max/sum re-fold from the hourly frame; count-distinct
    cascades through the register frame (hour max-merged to day) into
    the per-group HLL estimate.  No exact-audit column here — a stream
    never kept the users (the batch :func:`rollup_cascade` joins the
    audit alongside)."""
    from .sketches import hll_estimate_by_group

    day = (F.floor(F.col("hour_epoch") / C.DAY_S) * C.DAY_S).cast("long")
    daily = (
        hourly.groupBy(F.col("event_type"), day.alias("day_epoch"))
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.min("min_value_e2").cast("long").alias("min_value_e2"),
            F.max("max_value_e2").cast("long").alias("max_value_e2"),
            F.sum("sum_value_e2").cast("long").alias("sum_value_e2"),
        )
    )
    dayr = (F.floor(F.col("bucket_epoch") / C.DAY_S) * C.DAY_S).cast("long")
    dregs = hregs.groupBy(
        "event_type", dayr.alias("day_epoch"), "j"
    ).agg(F.max("rank").cast("long").alias("rank"))
    est = hll_estimate_by_group(dregs, ["event_type", "day_epoch"]).select(
        "event_type", "day_epoch", F.col("est").alias("users_est")
    )
    return daily.join(est, ["event_type", "day_epoch"])


def rollup_cascade(events: DataFrame) -> DataFrame:
    """Daily rollup RE-AGGREGATED FROM THE HOURLY PARTIALS (the
    continuous-aggregate cascade — at 10^12 events the daily job reads
    the hourly summary table, never raw events): count/min/max/sum
    re-fold exactly; the non-foldable COUNT DISTINCT cascades through
    the per-hour HLL registers (max-merged to days), with the exact
    per-day distinct count computed alongside as the audit column (the
    ivf_recall / hll_vocab self-auditing shape).  Cascade == direct
    equality and the register merge law are pinned in
    tests/test_eventflow.py."""
    base = cascade_from_partials(
        rollup_hourly(events), rollup_user_registers(events, bucket_s=3600)
    )
    day_direct = (F.floor(F.unix_timestamp("ts") / C.DAY_S) * C.DAY_S).cast(
        "long"
    )
    exact = events.groupBy(
        F.col("event_type"), day_direct.alias("day_epoch")
    ).agg(F.count_distinct(F.col("user_id")).cast("long").alias("users_exact"))
    return base.join(exact, ["event_type", "day_epoch"]).select(
        "event_type",
        "day_epoch",
        "n_events",
        "min_value_e2",
        "max_value_e2",
        "sum_value_e2",
        "users_est",
        "users_exact",
        F.expr(
            "(1000000 * (users_est - users_exact))"
            " div greatest(users_exact, 1)"
        )
        .cast("long")
        .alias("err_e6"),
    )


def _median_by_counting(df: DataFrame, key: str, val: str) -> DataFrame:
    """(key, med): the LOWER MEDIAN of ``val`` per ``key`` at rank
    ceil(n/2), computed by counting over the distinct-value frame — never
    a per-key sort of raw rows (the short_outliers device)."""
    vc = df.groupBy(key, val).agg(F.count("*").alias("_c"))
    wk = Window.partitionBy(key)
    wv = wk.orderBy(val).rowsBetween(Window.unboundedPreceding, 0)
    cum = vc.select(
        key,
        val,
        F.sum("_c").over(wv).alias("_cum"),
        F.sum("_c").over(wk).alias("_n"),
    )
    return cum.groupBy(key).agg(
        F.min(
            F.when(F.expr("_cum >= (_n + 1) div 2"), F.col(val))
        )
        .cast("long")
        .alias("med")
    )


def rollup_anomalies(events: DataFrame, k: int = C.ANOM_K) -> DataFrame:
    """Hourly rate-spike detection over the continuous-aggregate partials
    (the monitoring read a 10^12-event platform runs on its OWN summary
    table, never raw events): per event_type the median and MAD of the
    hourly counts — both exact integers by counting (contract.ANOM_K) —
    and a flag for hours deviating more than k·MAD.  Every frame past
    ``rollup_hourly`` is summary-sized (hours × types)."""
    hourly = rollup_hourly(events).select(
        "event_type", "hour_epoch", "n_events"
    )
    med = _median_by_counting(hourly, "event_type", "n_events")
    dev = hourly.join(med, "event_type").withColumn(
        "dev", F.abs(F.col("n_events") - F.col("med")).cast("long")
    )
    mad = _median_by_counting(dev, "event_type", "dev").withColumnRenamed(
        "med", "mad"
    )
    return (
        dev.join(mad, "event_type")
        .select(
            "event_type",
            "hour_epoch",
            "n_events",
            "med",
            "mad",
            (
                F.col("dev") > F.lit(k) * F.greatest(F.col("mad"), F.lit(1))
            )
            .cast("long")
            .alias("is_anomaly"),
        )
    )


def event_interarrival(events: DataFrame) -> DataFrame:
    """Per-event-type inter-arrival distribution: gap = microseconds
    since the SAME USER's previous event (any type; (ts_us, event_id)
    total order, the contract.EVT_KEY_FMT tie rule), keyed by the LATER
    event's type, summarized by the HDR log-bucket sketch (est50/90/99
    bucket lower bounds, unit = µs) plus the exact min/max/mean — the
    burstiness / engagement-cadence report next to value_quantiles'
    value distributions.

    Scale shape: one user_id window exchange for the lag (reused
    unchanged from the sessionize family), then a (key, bucket)
    map-side-combined aggregate (sketch-sized) and a per-key exact
    aggregate (|types| rows); the join of the two summaries is
    metadata-sized."""
    from .. import contract as C
    from .sketches import hdr_estimates_from_sketch

    ts_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    ).cast("long")
    base = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        F.col("event_id").cast("long").alias("event_id"),
        ts_us.alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    g = (
        base.withColumn("prev", F.lag("ts_us").over(w))
        .where(F.col("prev").isNotNull())
        .select(
            F.col("event_type").alias("key"),
            (F.col("ts_us") - F.col("prev")).alias("v"),
        )
    )
    s = C.HDR_SUB_BITS
    e = F.greatest(
        F.length(F.conv(F.col("v"), 10, 2)).cast("int") - F.lit(s), F.lit(0)
    )
    coords = g.select(
        "key",
        F.col("v").alias("v"),
        e.alias("_e"),
    ).select(
        "key",
        (F.col("_e").cast("long") * (1 << s) + F.expr("shiftright(v, _e)"))
        .alias("bucket"),
        F.expr("shiftleft(shiftright(v, _e), _e)").cast("long").alias("lb"),
    )
    sk = coords.groupBy("key", "bucket").agg(
        F.max("lb").cast("long").alias("lb"),
        F.count("*").cast("long").alias("cnt"),
    )
    est = hdr_estimates_from_sketch(sk).select(
        "key",
        "n",
        *[
            F.col(f"est{p}_e2").alias(f"est{p}_us")
            for p in C.HDR_PCTS
        ],
    )
    exact = g.groupBy("key").agg(
        F.min("v").cast("long").alias("min_us"),
        F.max("v").cast("long").alias("max_us"),
        F.expr("sum(v) DIV count(*)").cast("long").alias("mean_us"),
    )
    return est.join(exact, "key").select(
        F.col("key").alias("event_type"),
        "n",
        "min_us",
        "mean_us",
        "max_us",
        *[f"est{p}_us" for p in C.HDR_PCTS],
    )
