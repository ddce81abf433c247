"""DSIR importance resampling: exact integer arithmetic on a hand-built
strong-signal corpus, fixture-level direction checks, and the top-k plan
shape."""

from __future__ import annotations

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators.dsir import (
    dsir_sample,
    dsir_weights,
)

SF_DIR = "/root/testdata/sf0.001"


def _poly(word: str) -> int:
    """Python twin of textstats.poly_hash ('#' sentinel + codepoint fold)."""
    acc = 0
    for ch in "#" + word:
        acc = (acc * C.HASH_BASE + ord(ch)) % C.HASH_MOD
    return acc


def _expected_weights(rows):
    """Reimplementation from the spec: (doc_id, lang, words) rows ->
    {doc_id: (n_tokens, weight_e6)}."""
    from collections import Counter, defaultdict

    db = defaultdict(Counter)
    for doc_id, _lang, words in rows:
        for w in words:
            db[doc_id][_poly(w) % C.DSIR_BUCKETS] += 1
    cnt_r, cnt_t = Counter(), Counter()
    targets = {d for d, lang, _ in rows if lang in C.DSIR_TARGET_LANGS}
    for doc_id, bc in db.items():
        for b, c in bc.items():
            cnt_r[b] += c
            if doc_id in targets:
                cnt_t[b] += c
    out = {}
    for doc_id, bc in db.items():
        num = sum(
            c * ((1_000_000 * (cnt_t[b] + 1)) // (cnt_r[b] + 1))
            for b, c in bc.items()
        )
        n = sum(bc.values())
        out[doc_id] = (n, num // n)
    return out


def test_dsir_weights_exact_on_strong_signal_corpus(spark):
    """Target-vocab docs must outrank off-target docs, and every value
    must equal the spec arithmetic bit-for-bit (bucket hashing, Laplace
    smoothing, integer mean)."""
    docs = [
        (1, "de", "zug bahn zug fahrplan bahn zug"),
        (2, "fr", "gare train gare quai train gare"),
        (3, "en", "table scan join filter sort merge"),
        (4, "en", "scan table merge join sort filter"),
        (5, "en", "table zug join gare sort merge"),  # mixed
    ]
    df = spark.createDataFrame(
        [(d, lang, t) for d, lang, t in docs],
        schema="doc_id long, lang string, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["weight_e6"])
        for r in dsir_weights(df).collect()
    }
    exp = _expected_weights(
        [(d, lang, t.split()) for d, lang, t in docs]
    )
    assert got == exp
    w = {d: v[1] for d, v in got.items()}
    # pure-target docs far above pure-raw docs; the mixed doc in between
    assert min(w[1], w[2]) > w[5] > max(w[3], w[4])


def test_dsir_fixture_direction_and_sample_tilt(spark):
    """On the fixture corpus: target-language docs carry the highest
    median weight, and the top-k sample over-represents the target
    languages relative to their natural share."""
    import duckdb

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w = dsir_weights(docs).toPandas()
    med = w.groupby("lang").weight_e6.median()
    tgt = set(C.DSIR_TARGET_LANGS)
    assert min(med[l] for l in tgt) > max(
        med[l] for l in med.index if l not in tgt
    )

    s = dsir_sample(docs).toPandas()
    assert len(s) == C.DSIR_SAMPLE_K
    nat = duckdb.sql(
        f"select lang, count(*) n from read_parquet('{SF_DIR}/documents.parquet') group by 1"
    ).df()
    nat_share = nat.set_index("lang").n / nat.n.sum()
    smp_share = s.lang.value_counts(normalize=True)
    tgt_nat = sum(nat_share.get(l, 0.0) for l in tgt)
    tgt_smp = sum(smp_share.get(l, 0.0) for l in tgt)
    assert tgt_smp > tgt_nat


def test_dsir_sample_is_take_ordered(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = dsir_sample(docs)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
