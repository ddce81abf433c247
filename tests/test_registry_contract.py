"""Registry-wide driver-contract guards (analysis-only: builds every query
plan, runs none).

1. Scalar-only outputs — the driver's canonicalizer sorts the raw result
   frame and dies on array/map cells (CLAUDE.md invariant #5; the round-1
   stub_embed/process_documents failure class). Guarding the SCHEMA catches
   a regression at test time instead of at the driver gate.
2. Every oracle has a query (the inverse is fine: rows-only by design).
3. Oracle SQL parses and binds in DuckDB against empty same-schema views —
   catches dialect typos without paying a full data comparison.
"""

import duckdb
import pytest
from pyspark.sql import types as T

from pdf_extraction_and_query_spark.plans.registry import ORACLE_SQL, QUERIES

SF = "/root/testdata/sf0.001"
TABLES = ("documents", "embeddings", "events")


@pytest.fixture(scope="module")
def schemas(spark):
    return {name: QUERIES[name](spark, SF).schema for name in QUERIES}


def test_every_output_column_is_scalar(schemas):
    offenders = {
        name: [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        for name, schema in schemas.items()
    }
    offenders = {k: v for k, v in offenders.items() if v}
    assert not offenders, f"non-scalar driver outputs: {offenders}"


def test_no_duplicate_output_columns(schemas):
    for name, schema in schemas.items():
        names = [f.name for f in schema.fields]
        assert len(names) == len(set(names)), (name, names)


def test_oracles_parse_and_bind(spark):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet' WHERE false"
        )
    for name, sql in ORACLE_SQL.items():
        try:
            con.sql(sql).fetchdf()  # empty inputs: binder + executor smoke
        except Exception as exc:  # noqa: BLE001
            raise AssertionError(f"oracle {name} failed on empty views: {exc}")
