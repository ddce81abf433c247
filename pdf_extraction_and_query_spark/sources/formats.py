"""Interchange formats for the documents table: JSONL + CSV readers with
corrupt-record quarantine, and the matching writers.

The reference ingests from a directory of PDFs and accumulates per-file
errors in a ProcessingResult instead of raising
(src/extraction/pdf_processor.py's per-document try/except → result object;
see plans/extract.process_documents for the Spark analog).  These readers
apply the same philosophy at the FILE-FORMAT boundary: a malformed line
never kills the job — it routes to a quarantine DataFrame with the raw
payload preserved for replay.

Scale notes:
  * JSONL parses via ``from_json`` over the line-splittable text source —
    pure JVM expression, fully parallel, no schema inference pass over
    10^12 rows (inference reads the data TWICE and can silently widen
    types between runs; the explicit schema is the contract).
  * the quarantine split is two filters over one parsed projection — the
    classic ``_corrupt_record`` column would require caching the reader
    output to be filterable (Spark SQL restriction); from_json has no such
    restriction and keeps both branches lazily derivable from one scan.
  * CSV keeps Spark's native reader (quoting/escaping are genuinely hard)
    with PERMISSIVE mode + an explicit corrupt-record column, and the
    documented cache-before-split requirement handled inside.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the documents-table contract (matches the driver testdata layout)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

_COLS = [f.name for f in DOCUMENTS_SCHEMA.fields]


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL into (documents, quarantine).

    documents: rows parsing to the schema with a non-null doc_id.
    quarantine: (raw, reason) for malformed JSON or a missing doc_id —
    the raw line is preserved verbatim for replay after repair."""
    lines = spark.read.text(path).where(F.trim(F.col("value")) != "")
    # from_json returns an ALL-NULL STRUCT (not a null struct) on malformed
    # input, so it cannot distinguish "broken JSON" from "valid JSON missing
    # every field" — try_parse_json is the malformed detector, from_json the
    # typed extractor
    parsed = lines.select(
        F.col("value").alias("raw"),
        F.try_parse_json(F.col("value")).isNotNull().alias("is_json"),
        F.from_json(F.col("value"), DOCUMENTS_SCHEMA).alias("d"),
    )
    ok = F.col("is_json") & F.col("d.doc_id").isNotNull()
    good = parsed.where(ok).select([F.col(f"d.{c}").alias(c) for c in _COLS])
    bad = parsed.where(~ok).select(
        "raw",
        F.when(~F.col("is_json"), F.lit("malformed_json"))
        .otherwise(F.lit("missing_doc_id"))
        .alias("reason"),
    )
    return good, bad


def write_documents_jsonl(docs: DataFrame, path: str) -> None:
    docs.select(*_COLS).write.mode("overwrite").json(path)


def read_documents_csv(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read CSV (with header) into (documents, quarantine) using Spark's
    native reader in PERMISSIVE mode.  SPARK-21610's restriction (no
    filtering on the corrupt-record column alone) does not bite here: both
    split filters reference data columns alongside ``_corrupt``.  Do NOT be
    tempted to cache() the reader across re-reads of the same path — the
    cache is keyed on the logical plan, so a second read after new files
    land would silently serve the stale cached rows."""
    schema = T.StructType(
        DOCUMENTS_SCHEMA.fields + [T.StructField("_corrupt", T.StringType())]
    )
    raw = (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema(schema)
        .csv(path)
    )
    ok = F.col("_corrupt").isNull() & F.col("doc_id").isNotNull()
    good = raw.where(ok).select(*_COLS)
    bad = raw.where(~ok).select(
        F.coalesce(F.col("_corrupt"), F.lit("")).alias("raw"),
        F.when(F.col("_corrupt").isNotNull(), F.lit("malformed_row"))
        .otherwise(F.lit("missing_doc_id"))
        .alias("reason"),
    )
    return good, bad


def write_documents_csv(docs: DataFrame, path: str) -> None:
    docs.select(*_COLS).write.mode("overwrite").option("header", "true").csv(path)


def read_documents_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read ORC (columnar, self-describing — the warehouse-interchange
    sibling of parquet; Spark's reader is built in). Typed/columnar
    formats carry their schema in the footer, so there is no per-row parse
    to quarantine — schema mismatches fail the SCAN, the correct behavior
    for a typed interchange (vs the line formats above, where a bad ROW
    must not kill the job). The contract schema is still enforced by
    projection so extra columns are pruned and missing ones fail fast."""
    return spark.read.orc(path).select(*_COLS)


def write_documents_orc(docs: DataFrame, path: str) -> None:
    docs.select(*_COLS).write.mode("overwrite").orc(path)
