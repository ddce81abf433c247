"""Mergeable corpus sketches: count-min heavy hitters and an
exact-integer HyperLogLog — the bounded-memory summaries a 10^12-doc
pipeline keeps where exact tables would not fit or merge.

Public algorithms: Cormode & Muthukrishnan 2005 (count-min sketch),
Flajolet et al. 2007 (HyperLogLog).  The reference repo keeps no corpus
summaries at all (its stats endpoint counts rows in Postgres,
src/vector_store/pgvector_client.py:379-401); sketches join the
LLM-data-pipeline family as the monitoring/telemetry members: a crawler
fleet emits per-partition sketches, the coordinator merges them
cell-wise (CMS: +, HLL: max) without ever shuffling the vocabulary.

Determinism contract (constants in ``contract``): both sketches hash
with ``textstats.poly_hash`` (codepoint fold mod HASH_MOD) and both
final estimates are exact int64 arithmetic — the CMS estimate is a min
of integer cell counts; the HLL harmonic mean runs in fixed point
(S = Σ 2^(HLL_SHIFT − M_j), raw = (α_num·m²·2^shift) div (α_den·S)) so
even the APPROXIMATE answers value-hash across engines.  The
small-range HLL correction needs ln(m/V) — but V has only HLL_M
possible values, so it ships as an AUTHORED fixed-point lookup table
(contract.HLL_LN64_E6: libm ran once at authoring time, never at query
time), keeping the CORRECTED estimate exact-int64 too.

Scale shape (10^12 docs):
  * both sketches reduce the corpus in ONE map-side-combined hash
    aggregation over the distinct-token frame (the interpreted poly_hash
    runs once per DISTINCT token — PLANS.md #31); the sketch itself is
    CMS_D×CMS_W (resp. HLL_M) rows — driver-safe, broadcast-safe.
  * mergeability is tested, not just claimed: sketch(A ∪ B) ==
    cell-wise merge(sketch(A), sketch(B)) exactly, because both cell
    updates (sum, max) are associative integer folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import contract as C
from .textstats import poly_hash


def _token_counts(docs: DataFrame) -> DataFrame:
    """(token, cnt) — the FTS tokenizer contract, one corpus hash-agg."""
    return (
        docs.select(
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), C.WS_SPLIT_RE)
            ).alias("token")
        )
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _cms_bucket(i: int, token) -> F.Column:
    return (poly_hash(F.concat(F.lit(f"cms{i}:"), token)) % C.CMS_W).cast(
        "long"
    )


def cms_sketch(docs: DataFrame) -> DataFrame:
    """The count-min table (row, bucket, cnt) — at most CMS_D * CMS_W
    rows; absent cells are zero.  Rows fan out via one posexplode over
    the CMS_D bucket coordinates of each DISTINCT token."""
    return cms_sketch_from_counts(_token_counts(docs))


def cms_heavy_hitters(docs: DataFrame, k: int = C.CMS_TOPK) -> DataFrame:
    """The audit row per top-K exact token: its true count, the CMS
    estimate (min over rows of its cells), and the overcount — the CMS
    one-sided-error guarantee makes ``overcount >= 0`` an invariant.

    The token-count frame feeds the sketch AND the top-K — independent
    planning (PLANS.md #11), so it is localCheckpointed (vocab-sized
    summary rows, no text)."""
    tc = _token_counts(docs).localCheckpoint()
    sk = cms_sketch_from_counts(tc)
    top = (
        tc.orderBy(F.desc("cnt"), F.asc("token"))
        .limit(int(k))
        .withColumnRenamed("cnt", "exact_cnt")
    )
    probes = top.select(
        "token",
        "exact_cnt",
        F.posexplode(
            F.array(*[_cms_bucket(i, F.col("token")) for i in range(C.CMS_D)])
        ).alias("row", "bucket"),
    )
    est = (
        probes.join(F.broadcast(sk), ["row", "bucket"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("cnt").cast("long").alias("cms_est"))
    )
    return est.select(
        "token",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("overcount"),
    )


def cms_sketch_from_counts(tc: DataFrame) -> DataFrame:
    """:func:`cms_sketch` over an already-aggregated (token, cnt) frame —
    the merge seam: per-partition / per-batch count frames sketch
    independently and the sketches add cell-wise."""
    coords = tc.select(
        "cnt",
        F.posexplode(
            F.array(*[_cms_bucket(i, F.col("token")) for i in range(C.CMS_D)])
        ).alias("row", "bucket"),
    )
    return coords.groupBy("row", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_estimate(sk: DataFrame, tokens: list[str]) -> DataFrame:
    """(token, cms_est) for explicit probe tokens against a sketch table —
    the read side every sketch source shares (inline or the streaming
    index's merged cells).  A token whose cells are all absent estimates
    0 (left join, coalesce) — count-min's answer for a never-seen key."""
    spark = sk.sparkSession
    tok = spark.createDataFrame([(t,) for t in sorted(set(tokens))],
                                "token string")
    probes = tok.select(
        "token",
        F.posexplode(
            F.array(*[_cms_bucket(i, F.col("token")) for i in range(C.CMS_D)])
        ).alias("row", "bucket"),
    )
    return (
        probes.join(F.broadcast(sk), ["row", "bucket"], "left")
        .groupBy("token")
        .agg(
            F.coalesce(F.min("cnt"), F.lit(0)).cast("long").alias("cms_est")
        )
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two count-min tables — the distributed-combine
    operation (associative, commutative)."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def _hll_rank(v: F.Column) -> F.Column:
    """HLL_VBITS - bitlength(v) + 1; v = 0 -> HLL_VBITS + 1.  bitlength
    via the base-2 string — exact for all non-negative int64."""
    return (
        F.when(v == 0, F.lit(C.HLL_VBITS + 1))
        .otherwise(C.HLL_VBITS - F.length(F.conv(v, 10, 2)) + 1)
        .cast("long")
    )


def hll_registers(docs: DataFrame) -> DataFrame:
    """(j, rank): the HLL_M register table over the corpus vocabulary —
    register j = poly_hash(token) % m, rank = leading-zero rank of the
    quotient; merge of two register tables = per-register max.  Registers
    never hit by any token are absent (implicitly rank 0)."""
    return hll_registers_from_tokens(_token_counts(docs).select("token"))


def hll_registers_from_tokens(tok: DataFrame) -> DataFrame:
    """:func:`hll_registers` over an already-distinct (token) frame — the
    merge seam (per-batch register tables combine by per-register max)."""
    h = tok.select(poly_hash(F.col("token")).alias("h"))
    jr = h.select(
        (F.col("h") % C.HLL_M).cast("long").alias("j"),
        _hll_rank(F.expr(f"h div {C.HLL_M}")).alias("r"),
    )
    return jr.groupBy("j").agg(F.max("r").cast("long").alias("rank"))


def hll_vocab(docs: DataFrame) -> DataFrame:
    """ONE self-auditing row: m, registers hit, the fixed-point harmonic
    sum S, the raw HLL estimate, the small-range-corrected estimate
    (authored ln table — module docstring), and the exact distinct-token
    count next to it (the ivf_recall / pq_recall precedent: the sketch
    answer and its ground truth in one report).  err_e6 is the corrected
    estimate's signed fixed-point relative error."""
    # one corpus derivation feeds registers AND the exact audit count —
    # independent planning (PLANS.md #11), so it is localCheckpointed
    tc = _token_counts(docs).localCheckpoint()
    regs = hll_registers_from_tokens(tc.select("token"))
    exact = tc.agg(F.count("*").cast("long").alias("exact_distinct"))
    return (
        hll_estimate_from_registers(regs)
        .crossJoin(F.broadcast(exact))
        .select(
            "m",
            "n_registers_hit",
            "s",
            "est_raw",
            "est",
            "exact_distinct",
            F.expr(
                "(1000000 * (est - exact_distinct)) div "
                "greatest(exact_distinct, 1)"
            )
            .cast("long")
            .alias("err_e6"),
        )
    )


def _hll_estimate_tail(agg: DataFrame, keys: list[str]) -> DataFrame:
    """(keys…, m, n_registers_hit, s, est_raw, est) from an aggregated
    (n_registers_hit, s_hit) frame — the arithmetic shared by the global
    estimator and the per-group cascade estimator."""
    m, shift = C.HLL_M, C.HLL_SHIFT
    return (
        agg.select(
            *keys,
            F.lit(m).cast("long").alias("m"),
            "n_registers_hit",
            # registers never hit contribute 2^shift each (rank 0)
            (
                F.col("s_hit")
                + (F.lit(m) - F.col("n_registers_hit"))
                * F.lit(1 << shift).cast("long")
            )
            .cast("long")
            .alias("s"),
        )
        .select(
            *keys,
            "m",
            "n_registers_hit",
            "s",
            F.expr(
                f"({C.HLL_ALPHA_NUM} * {m} * {m} * cast({1 << shift} as bigint))"
                f" div ({C.HLL_ALPHA_DEN} * s)"
            )
            .cast("long")
            .alias("est_raw"),
        )
        .select(
            *keys,
            "m",
            "n_registers_hit",
            "s",
            "est_raw",
            # Flajolet small-range correction: est = m * ln(m/V) via the
            # authored fixed-point table (contract.HLL_LN64_E6)
            F.when(
                (F.col("est_raw") < C.HLL_SMALL_RANGE_MAX)
                & (F.col("n_registers_hit") < m),
                F.floor(
                    (
                        F.lit(m)
                        * F.element_at(
                            F.array(*[F.lit(v) for v in C.HLL_LN64_E6]),
                            (F.lit(m) - F.col("n_registers_hit") + 1).cast(
                                "int"
                            ),
                        )
                    ).cast("long")
                    / F.lit(1_000_000)
                ),
            )
            .otherwise(F.col("est_raw"))
            .cast("long")
            .alias("est"),
        )
    )


def _hll_s_hit() -> list:
    return [
        F.count("*").cast("long").alias("n_registers_hit"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {C.HLL_SHIFT} - rank)"))
        .cast("long")
        .alias("s_hit"),
    ]


def hll_estimate_from_registers(regs: DataFrame) -> DataFrame:
    """ONE row (m, n_registers_hit, s, est_raw, est) from a register
    table — the read side every register source shares (inline-derived or
    the streaming index's merged base ∪ deltas); the stream keeps ONLY
    registers (that is the sketch's point), so this carries no exact
    audit columns."""
    return _hll_estimate_tail(regs.agg(*_hll_s_hit()), [])


def hll_estimate_by_group(regs: DataFrame, keys: list[str]) -> DataFrame:
    """Per-group estimates from a KEYED register table (keys…, j, rank) —
    the distinct-count-that-cascades device: registers merge by max across
    any regrouping (hour → day, partition → corpus), so one register
    table per fine group serves every coarser rollup exactly
    (eventflow.rollup_cascade)."""
    return _hll_estimate_tail(regs.groupBy(*keys).agg(*_hll_s_hit()), keys)


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Per-register max of two register tables — the distributed-combine
    operation (associative, commutative, idempotent)."""
    return (
        a.unionByName(b).groupBy("j").agg(F.max("rank").cast("long").alias("rank"))
    )


def _bloom_pos(i: int, key) -> F.Column:
    return (poly_hash(F.concat(F.lit(f"bf{i}:"), key)) % C.BLOOM_BITS).cast(
        "long"
    )


def bloom_build(keys: DataFrame) -> DataFrame:
    """(word_idx, bits): the Bloom word table over a (key) frame — at most
    BLOOM_BITS/BLOOM_WORD rows, built in one map-side-combined bit_or
    aggregation; merge of two tables = per-word OR."""
    pos = keys.select(
        F.explode(
            F.array(*[_bloom_pos(i, F.col("key")) for i in range(C.BLOOM_K)])
        ).alias("p")
    )
    return (
        pos.select(
            F.expr(f"p div {C.BLOOM_WORD}").cast("long").alias("word_idx"),
            F.expr(
                f"shiftleft(cast(1 as bigint), cast(p % {C.BLOOM_WORD} as int))"
            ).alias("m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("m").cast("long").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Per-word OR of two Bloom tables — the distributed-combine
    operation (associative, commutative, idempotent)."""
    return (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.bit_or("bits").cast("long").alias("bits"))
    )


def bloom_probe(bloom: DataFrame, keys: DataFrame) -> DataFrame:
    """(key, maybe): maybe = every one of the key's BLOOM_K bits is set.
    The word table (<= 32 rows) broadcasts; a word no insert ever touched
    is absent and coalesces to 0 (bit unset)."""
    pr = keys.select(
        "key",
        F.explode(
            F.array(*[_bloom_pos(i, F.col("key")) for i in range(C.BLOOM_K)])
        ).alias("p"),
    ).select(
        "key",
        F.expr(f"p div {C.BLOOM_WORD}").cast("long").alias("word_idx"),
        F.expr(
            f"shiftleft(cast(1 as bigint), cast(p % {C.BLOOM_WORD} as int))"
        ).alias("m"),
    )
    j = pr.join(F.broadcast(bloom), "word_idx", "left")
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("m")) != 0
    ).cast("int")
    return j.groupBy("key").agg((F.min(hit) == 1).alias("maybe"))


def bloom_contamination(docs: DataFrame) -> DataFrame:
    """The Bloom-pre-filtered train/eval contamination report — the
    at-scale shape of ``dedup.contamination_check``: the eval split's
    distinct shingles compress to a <=32-row word table (vs broadcasting
    the full shingle set), every training doc reports its shingle count,
    Bloom maybe-hits, EXACT hits (the audit), and the false-positive
    count — ``n_bloom_hits >= n_exact_hits`` is the no-false-negative
    guarantee (unit-tested invariant), so Bloom-negative shingles are
    safe to skip in the exact pass.

    Scale shape: Bloom probes hash once per DISTINCT train shingle
    (PLANS.md #31) against the broadcast word table; the exact audit is
    the same broadcast eval-shingle join contamination_check pays; one
    doc-keyed count aggregation."""
    from .dedup import doc_shingles

    sh = doc_shingles(docs)
    is_eval = (F.col("doc_id") % C.EVAL_MOD) == C.EVAL_RESIDUE
    eval_sh = sh.where(is_eval).select("sh").distinct()
    train = sh.where(~is_eval)
    bloom = bloom_build(eval_sh.withColumnRenamed("sh", "key"))
    probe = bloom_probe(
        bloom, train.select("sh").distinct().withColumnRenamed("sh", "key")
    ).withColumnRenamed("key", "sh")
    hits = (
        train.join(probe, "sh")
        .join(
            F.broadcast(eval_sh.withColumn("_hit", F.lit(1))), "sh", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(F.col("maybe").cast("long"))
            .cast("long")
            .alias("n_bloom_hits"),
            F.count("_hit").cast("long").alias("n_exact_hits"),
        )
    )
    base = docs.where(~is_eval).select(F.col("doc_id").cast("long").alias("doc_id"))
    return (
        base.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_bloom_hits", F.lit(0))
            .cast("long")
            .alias("n_bloom_hits"),
            F.coalesce("n_exact_hits", F.lit(0))
            .cast("long")
            .alias("n_exact_hits"),
        )
        .withColumn(
            "n_false_pos",
            (F.col("n_bloom_hits") - F.col("n_exact_hits")).cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# HDR-style log-bucketed quantile sketch (the HdrHistogram public design):
# the mergeable quantile summary for latency/value distributions.  Bucket
# arithmetic is pure int64 (contract.HDR_SUB_BITS; see contract.py for the
# (e, m) derivation and the error bound), merge = per-(key, bucket) count
# sum, and the quantile readout plus its EXACT audit both run over
# summary-sized frames (distinct buckets / distinct values), never a raw
# sort.


def _value_e2(v) -> F.Column:
    """Fixed-point e2 of the events `value` double — exact for the
    2-decimal fixture (asserted in tests/test_eventflow.py)."""
    return F.round(v * 100).cast("long")


def hdr_sketch(events: DataFrame, key: str = "event_type") -> DataFrame:
    """(key, bucket, lb, cnt): the per-key log-bucket histogram over the
    fixed-point value — ONE map-side-combined hash aggregation; the
    result is ~(e_max * 2^HDR_SUB_BITS) rows per key."""
    base = events.select(
        F.col(key).alias("key"), _value_e2(F.col("value")).alias("_hdr_n")
    ).withColumn(
        "_hdr_e",
        F.greatest(
            F.length(F.conv(F.col("_hdr_n"), 10, 2)).cast("int")
            - F.lit(C.HDR_SUB_BITS),
            F.lit(0),
        ),
    )
    s = C.HDR_SUB_BITS
    coords = base.select(
        "key",
        (
            F.col("_hdr_e").cast("long") * (1 << s)
            + F.expr("shiftright(_hdr_n, _hdr_e)")
        ).alias("bucket"),
        F.expr("shiftleft(shiftright(_hdr_n, _hdr_e), _hdr_e)")
        .cast("long")
        .alias("lb"),
    )
    return coords.groupBy("key", "bucket").agg(
        F.max("lb").cast("long").alias("lb"),
        F.count("*").cast("long").alias("cnt"),
    )


def hdr_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Per-(key, bucket) count sum — the distributed-combine operation
    (lb is a function of bucket, so max == either side's value)."""
    return (
        a.unionByName(b)
        .groupBy("key", "bucket")
        .agg(
            F.max("lb").cast("long").alias("lb"),
            F.sum("cnt").cast("long").alias("cnt"),
        )
    )


def hdr_estimates_from_sketch(sk: DataFrame) -> DataFrame:
    """(key, n, est{p}_e2 per contract.HDR_PCTS) from a sketch table —
    the read tail every sketch source shares (inline-derived or the
    streaming index's merged base ∪ deltas); estimates only, no exact
    audit: a stream never kept the raw values, which is the sketch's
    point."""
    from pyspark.sql import Window

    wk = Window.partitionBy("key")
    wb = wk.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    skc = sk.select(
        "key",
        "lb",
        F.sum("cnt").over(wb).alias("cum"),
        F.sum("cnt").over(wk).alias("n"),
    )
    est_aggs = [
        F.min(F.when(F.expr(f"cum >= {_hdr_rank(p)}"), F.col("lb")))
        .cast("long")
        .alias(f"est{p}_e2")
        for p in C.HDR_PCTS
    ]
    return skc.groupBy("key").agg(
        F.max("n").cast("long").alias("n"), *est_aggs
    )


def _hdr_rank(p: int) -> str:
    return f"(({p} * n) + 99) div 100"


def hdr_quantiles(events: DataFrame) -> DataFrame:
    """Per event_type value quantiles: for each pct in contract.HDR_PCTS
    the sketch ESTIMATE (lower bound of the first bucket whose cumulative
    count reaches rank ceil(pct*n/100)) next to the EXACT value at that
    rank (computed by counting over the distinct-value frame — the
    short_outliers precedent) and the signed fixed-point relative error.
    Self-auditing one-row-per-key report, the ivf_recall/hll_vocab shape.
    """
    from pyspark.sql import Window

    est = hdr_estimates_from_sketch(hdr_sketch(events))
    base = events.select(
        F.col("event_type").alias("key"),
        _value_e2(F.col("value")).alias("v"),
    )
    wk = Window.partitionBy("key")
    vc = base.groupBy("key", "v").agg(F.count("*").alias("cnt"))
    wv = wk.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    vcc = vc.select(
        "key",
        "v",
        F.sum("cnt").over(wv).alias("cum"),
        F.sum("cnt").over(wk).alias("n"),
    )
    exact_aggs = [
        F.min(F.when(F.expr(f"cum >= {_hdr_rank(p)}"), F.col("v")))
        .cast("long")
        .alias(f"exact{p}_e2")
        for p in C.HDR_PCTS
    ]
    exact = vcc.groupBy("key").agg(*exact_aggs)
    errs = [
        F.expr(
            f"(1000000 * (est{p}_e2 - exact{p}_e2)) div greatest(exact{p}_e2, 1)"
        )
        .cast("long")
        .alias(f"err{p}_e6")
        for p in C.HDR_PCTS
    ]
    return (
        est.join(exact, "key")
        .select(
            F.col("key").alias("event_type"),
            "n",
            *[F.col(f"est{p}_e2") for p in C.HDR_PCTS],
            *[F.col(f"exact{p}_e2") for p in C.HDR_PCTS],
            *errs,
        )
    )


def theta_sample(docs: DataFrame) -> DataFrame:
    """Per-source fixed-threshold theta sample of the distinct-token set:
    (source, token) rows whose md5_bits48(THETA_SALT || token) falls
    below 2^48/THETA_RATE.  The hash filter runs BEFORE the distinct so
    the dedup shuffle carries only ~1/THETA_RATE of the (source, token)
    stream — at 10^12 docs the sketch build is one rate-reduced
    map-side-combined exchange, and the sample itself is the mergeable
    artifact (union = merge)."""
    tok = docs.select(
        "source",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), C.WS_SPLIT_RE)
        ).alias("token"),
    ).where(F.col("token") != "")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(C.THETA_SALT), F.col("token"))), 1, 12
        ),
        16,
        10,
    ).cast("long")
    return tok.where(h < C.THETA_BOUND).distinct()


def theta_source_overlap(docs: DataFrame) -> DataFrame:
    """Cross-source vocabulary-overlap report from theta samples: for
    every source pair (a < b), the sampled distinct-token intersection,
    the sample Jaccard (exact integer over the samples), and the
    THETA_RATE-scaled estimate of the TRUE distinct intersection — the
    report that answers "which ingest feeds duplicate each other's
    vocabulary" without ever shuffling full vocabularies against each
    other.  Pairs with empty sampled intersection still appear (zero
    rows are the interesting ones for mixture design).

    Scale shape: the only corpus-sized work is the rate-reduced distinct
    in :func:`theta_sample`; the pair frame is built from the tiny
    per-source size table (a broadcast self-cross of |sources| rows) and
    the token-keyed sample self-join, both sample-sized."""
    return theta_overlap_from_sample(theta_sample(docs))


def theta_overlap_from_sample(s: DataFrame) -> DataFrame:
    """The overlap-report tail over an already-built (source, token)
    theta sample — shared verbatim by the batch operator above and the
    streaming merged read (streaming/sketches.py theta_overlap_merged)
    so the two paths cannot drift."""
    sizes = s.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled")
    )
    inter = (
        s.alias("a")
        .join(s.alias("b"), "token")
        .where(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    pairs = (
        sizes.select(
            F.col("source").alias("src_a"), F.col("n_sampled").alias("n_a")
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("src_b"),
                    F.col("n_sampled").alias("n_b"),
                )
            ),
            F.col("src_a") < F.col("src_b"),
        )
        .join(inter, ["src_a", "src_b"], "left")
        .withColumn("n_inter", F.coalesce(F.col("n_inter"), F.lit(0)).cast("long"))
    )
    return pairs.select(
        "src_a",
        "src_b",
        F.col("n_a").alias("n_a_sampled"),
        F.col("n_b").alias("n_b_sampled"),
        "n_inter",
        (F.col("n_a") + F.col("n_b") - F.col("n_inter")).alias("n_union"),
        F.expr("n_inter * 1000000L DIV (n_a + n_b - n_inter)").alias(
            "jaccard_e6"
        ),
        (F.col("n_inter") * C.THETA_RATE).cast("long").alias("est_inter"),
    )
