"""Hand-computed pins for the partition-key skew pre-flight
(operators/stats.py shuffle_skew_report): load factor 1e6 = balanced,
salt_factor = CEIL(key_load / mean_load), is_skewed at >= 2x mean.
The oracle-parity suite checks the same arithmetic against DuckDB at
corpus scale; plan pin: the corpus is aggregated ONCE (one hash
exchange) and the grand totals ride a single-partition window over the
already-aggregated key rows, never a second corpus pass.
"""

from __future__ import annotations

from pdf_extraction_and_query_spark.operators import stats as ST

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, "x", "en", src, n) for i, (src, n) in enumerate(rows)], SCHEMA
    )


def test_skew_report_hand_computed(spark):
    # key loads: a=6000, b=3000, c=1000 chars; grand=10000, n_keys=3
    docs = _docs(
        spark,
        [("a", 4000), ("a", 2000), ("b", 3000), ("c", 600), ("c", 400)],
    )
    rows = {r["source"]: r for r in ST.shuffle_skew_report(docs).collect()}
    a = rows["a"]
    assert (a["n_docs"], a["total_chars"]) == (2, 6000)
    assert a["share_micro"] == 600_000  # 6000 * 1e6 / 10000
    assert a["load_micro"] == 1_800_000  # 1.8x mean
    assert a["salt_factor"] == 2  # ceil(6000 * 3 / 10000) = ceil(1.8)
    assert a["is_skewed"] is False  # 1.8x < 2x
    b = rows["b"]
    assert (b["load_micro"], b["salt_factor"], b["is_skewed"]) == (
        900_000,
        1,
        False,
    )
    c = rows["c"]
    assert (c["load_micro"], c["salt_factor"], c["is_skewed"]) == (
        300_000,
        1,
        False,
    )


def test_skew_report_flags_hot_key(spark):
    # a carries 8/10 of the mass across 2 keys -> load 1.6e6? no: n_keys=2,
    # load = 8000*2*1e6/10000 = 1.6e6 < 2e6. Use 3 keys: a=8000, b=1000,
    # c=1000 -> load_a = 2.4e6 >= 2e6, salt 3
    docs = _docs(spark, [("a", 8000), ("b", 1000), ("c", 1000)])
    rows = {r["source"]: r for r in ST.shuffle_skew_report(docs).collect()}
    assert rows["a"]["load_micro"] == 2_400_000
    assert rows["a"]["is_skewed"] is True
    assert rows["a"]["salt_factor"] == 3  # ceil(2.4)
    assert rows["b"]["is_skewed"] is False


def test_skew_report_plan_single_corpus_pass(spark):
    docs = _docs(spark, [("a", 100), ("b", 200), ("b", 300)])
    plan = (
        ST.shuffle_skew_report(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one key-hash exchange for the corpus aggregate + one SinglePartition
    # exchange for the totals window over the aggregated key rows
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Exchange SinglePartition") == 1, plan


def test_quality_agreement_invariants_and_python_replay(spark):
    """Six pairs over one shared population; contingency counts sum to
    n; agree/kappa match an independent Python implementation of the
    exact integer spec (including the positive-dividend floor shift)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = ST.quality_agreement(docs).collect()
    assert len(rows) == 6
    assert len({r["n"] for r in rows}) == 1
    for r in rows:
        n, n11, n00, n10, n01 = (
            r["n"], r["n11"], r["n00"], r["n10"], r["n01"]
        )
        assert n11 + n00 + n10 + n01 == n
        po = (n11 + n00) * 1_000_000 // n
        pa = (n11 + n10) * 1_000_000 // n
        pb = (n11 + n01) * 1_000_000 // n
        pe = pa * pb // 1_000_000 + (1_000_000 - pa) * (
            1_000_000 - pb
        ) // 1_000_000
        assert r["agree_e6"] == po
        if pe == 1_000_000:
            want = 0
        else:
            # Python // IS floor division — the spec the shift encodes
            want = (po - pe) * 1_000_000 // (1_000_000 - pe)
        assert r["kappa_e6"] == want, (r["sig_a"], r["sig_b"])
        assert -1_000_000 <= r["kappa_e6"] <= 1_000_000
