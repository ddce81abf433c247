"""Interchange-format boundary: JSONL/CSV readers must route malformed rows
to quarantine (never raise), preserve raw payloads for replay, and
round-trip the documents schema byte-exactly."""

import os

from pdf_extraction_and_query_spark.sources.formats import (
    read_documents_csv,
    read_documents_jsonl,
    write_documents_csv,
    write_documents_jsonl,
)

SF = "/root/testdata/sf0.001"


def _write_jsonl(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_jsonl_quarantine_routing(spark, tmp_path):
    p = str(tmp_path / "in.jsonl")
    _write_jsonl(
        p,
        [
            '{"doc_id": 1, "lang": "en", "source": "s", "n_chars": 5, "text": "hello"}',
            "{not json at all",
            '{"lang": "en", "source": "s", "n_chars": 3, "text": "orphan"}',
            "",
            '{"doc_id": 2, "lang": "de", "source": "t", "n_chars": 4, "text": "welt"}',
        ],
    )
    good, bad = read_documents_jsonl(spark, p)
    g = {r.doc_id: r for r in good.collect()}
    assert set(g) == {1, 2} and g[1].text == "hello" and g[2].lang == "de"
    b = sorted((r.reason, r.raw) for r in bad.collect())
    assert [r for r, _ in b] == ["malformed_json", "missing_doc_id"]
    # raw payload preserved verbatim for replay
    assert b[0][1] == "{not json at all"


def test_jsonl_roundtrip_real_documents(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, out)
    back, bad = read_documents_jsonl(spark, out)
    assert bad.count() == 0
    a = sorted(map(tuple, docs.select(*back.columns).collect()))
    assert sorted(map(tuple, back.collect())) == a


def test_csv_quarantine_and_roundtrip(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    out = str(tmp_path / "docs_csv")
    write_documents_csv(docs, out)
    back, bad = read_documents_csv(spark, out)
    assert bad.count() == 0
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, docs.select(*back.columns).collect())
    )
    # a new part file with a malformed row lands in the directory (header
    # line included — the reader consumes one per file); refreshByPath
    # drops Spark's cached file listing so the new file is visible
    with open(os.path.join(out, "part-99999-injected.csv"), "w") as f:
        f.write("doc_id,lang,source,n_chars,text\nnot,a,valid\n")
    spark.catalog.refreshByPath(out)
    good2, bad2 = read_documents_csv(spark, out)
    assert good2.count() == 50
    assert bad2.count() == 1 and bad2.collect()[0].reason == "malformed_row"


def test_orc_roundtrip_real_documents(spark, tmp_path):
    from pdf_extraction_and_query_spark.sources.formats import (
        read_documents_orc,
        write_documents_orc,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    out = str(tmp_path / "docs_orc")
    write_documents_orc(docs, out)
    back = read_documents_orc(spark, out)
    assert back.schema == docs.select(*back.columns).schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, docs.select(*back.columns).collect())
    )
