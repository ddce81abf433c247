"""Pluggable-embedder seam: a fake model injected through the factory spec
must drive the output (lazy per-worker init), the reference contract
(normalize, empty -> zero vector, batch_size) must hold, and the default
spec must remain the oracle-paired stub.

Fake models are defined INSIDE the factory closures so cloudpickle ships
them by value (a module-level class would be pickled by reference to this
test module, which executors can't import)."""

import sys

import numpy as np
import pytest
from pyspark import cloudpickle
from pyspark.sql import functions as F

from pdf_extraction_and_query_spark.operators.embedder import embed_documents

# ship THIS module's functions/classes to executors by value — the test
# module is not importable from spark workers
cloudpickle.register_pickle_by_value(sys.modules[__name__])

DIM = 8


def _len_plus_i_factory():
    """Deterministic stand-in for a sentence-transformers model: component
    i of a text's vector is len(text) + i."""

    class FakeModel:
        def encode(self, texts):
            return np.array(
                [[float(len(t) + i) for i in range(DIM)] for t in texts]
            )

    return FakeModel()


def test_fake_model_through_the_seam(spark):
    rows = [("a", "hello"), ("b", ""), ("c", "   "), ("d", "xy")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: np.array(r["embedding"])
        for r in embed_documents(
            docs, spec=_len_plus_i_factory, dim=DIM, batch_size=2
        ).collect()
    }
    assert set(got) == {"a", "b", "c", "d"}
    # empty/whitespace text -> zero vector, never a model call
    # (reference: sentence_transformer_embedder.py:95-97, 126-137)
    assert np.all(got["b"] == 0.0) and np.all(got["c"] == 0.0)
    # non-empty rows: fake-model vector, L2-normalized (normalize=True)
    for doc_id, text in (("a", "hello"), ("d", "xy")):
        raw = np.array([float(len(text) + i) for i in range(DIM)])
        expect = raw / np.linalg.norm(raw)
        assert np.allclose(got[doc_id], expect), doc_id
        assert np.isclose(np.linalg.norm(got[doc_id]), 1.0)


def test_default_spec_is_the_stub(spark):
    from pdf_extraction_and_query_spark.operators.search import stub_embed

    docs = spark.createDataFrame(
        [("1", "merger covenant"), ("2", "")], "doc_id string, text string"
    )
    got = embed_documents(docs).orderBy("doc_id").collect()
    expect = stub_embed(docs).orderBy("doc_id").collect()
    assert [r["embedding"] for r in got] == [r["embedding"] for r in expect]


def test_batching_respects_batch_size(spark):
    """32-row frame in ONE partition, batch_size=10: every encode() call
    sees <= 10 texts (the reference encodes in batches of 32; Arrow batch
    input is re-chunked client-side)."""
    rows = [(str(i), f"text {i}") for i in range(32)]
    docs = spark.createDataFrame(rows, "doc_id string, text string").coalesce(1)

    import tempfile

    log = tempfile.mktemp()

    def factory(path=log):
        class Recorder:
            def encode(self, texts):
                with open(path, "a") as fh:
                    fh.write(f"{len(texts)}\n")
                return np.array(
                    [[float(len(t) + i) for i in range(DIM)] for t in texts]
                )

        return Recorder()

    # collect (not count) — count() would prune the embedding projection
    # and the UDF would never run
    n = len(embed_documents(docs, spec=factory, dim=DIM, batch_size=10).collect())
    assert n == 32
    with open(log) as fh:
        sizes = [int(x) for x in fh.read().split()]
    assert sum(sizes) == 32
    assert max(sizes) <= 10


def test_bad_shape_fails_fast(spark):
    docs = spark.createDataFrame([("1", "abc")], "doc_id string, text string")

    def factory():
        class Wrong:
            def encode(self, texts):
                return np.zeros((len(texts), DIM + 3))

        return Wrong()

    with pytest.raises(Exception, match="expected"):
        embed_documents(docs, spec=factory, dim=DIM).collect()


def test_string_spec_resolves_module_factory(spark, tmp_path, monkeypatch):
    """'module:factory' specs import lazily on the worker — the production
    wiring for SPARK_GRAFT_EMBEDDER."""
    mod = tmp_path / "fake_embedder_mod.py"
    mod.write_text(
        "import numpy as np\n"
        "class M:\n"
        "    def encode(self, texts):\n"
        f"        return np.array([[float(len(t) + i) for i in range({DIM})] for t in texts])\n"
        "def load():\n"
        "    return M()\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    spark.sparkContext.addPyFile(str(mod))
    docs = spark.createDataFrame([("1", "hello")], "doc_id string, text string")
    got = embed_documents(
        docs, spec="fake_embedder_mod:load", dim=DIM
    ).collect()[0]["embedding"]
    raw = np.array([float(5 + i) for i in range(DIM)])
    assert np.allclose(np.array(got), raw / np.linalg.norm(raw))
