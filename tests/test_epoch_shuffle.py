"""Deterministic epoch shuffle (operators/packing.py epoch_shuffle):
the banded-scan positions must equal a pure-Python replay of the rule
(global sort by (md5 hash, doc_id) within each (epoch, shard)); per
(epoch, shard) positions are a contiguous 1..n permutation; epochs
produce different orders.  The oracle-parity suite pins the same thing
against DuckDB's plain global window at corpus scale.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.operators import packing as PK

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, n=60):
    return spark.createDataFrame(
        [(i, f"doc {i}", "en", "s", 6) for i in range(n)], SCHEMA
    )


def _replay(doc_ids, n_epochs, n_shards):
    out = {}
    groups = defaultdict(list)
    for e in range(n_epochs):
        for d in doc_ids:
            h = int(
                hashlib.md5(f"{C.EPOCH_SALT}{e}:{d}".encode()).hexdigest()[:12],
                16,
            )
            groups[(e, h % n_shards)].append((h, d))
    for (e, s), rows in groups.items():
        for pos, (h, d) in enumerate(sorted(rows), start=1):
            out[(d, e)] = (s, pos)
    return out


def test_epoch_shuffle_matches_python_replay(spark):
    docs = _docs(spark)
    got = {
        (r["doc_id"], r["epoch"]): (r["shard"], r["pos"])
        for r in PK.epoch_shuffle(docs).collect()
    }
    assert got == _replay(range(60), C.EPOCH_N, C.EPOCH_SHARDS)


def test_epoch_shuffle_positions_are_permutations(spark):
    rows = PK.epoch_shuffle(_docs(spark), n_epochs=2, n_shards=4).collect()
    per_shard = defaultdict(list)
    for r in rows:
        per_shard[(r["epoch"], r["shard"])].append(r["pos"])
    for poss in per_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # every doc appears exactly once per epoch
    per_epoch = defaultdict(set)
    for r in rows:
        assert r["doc_id"] not in per_epoch[r["epoch"]]
        per_epoch[r["epoch"]].add(r["doc_id"])
    assert all(len(s) == 60 for s in per_epoch.values())


def test_epoch_shuffle_orders_differ_between_epochs(spark):
    rows = PK.epoch_shuffle(_docs(spark)).collect()
    by_epoch = defaultdict(dict)
    for r in rows:
        by_epoch[r["epoch"]][r["doc_id"]] = (r["shard"], r["pos"])
    assert by_epoch[0] != by_epoch[1]
