"""Iceberg-branch routing of the table-catalog shim. No Iceberg runtime jar
exists in this sandbox, so these tests pin the CONTRACT of the catalog
branch — which Spark API each shim call routes to, and the exact SQL it
issues — against mocks. Pointing SPARK_GRAFT_CATALOG at a real configured
catalog exercises the same code paths."""

from unittest import mock

import pytest

from pdf_extraction_and_query_spark.sources import tables


@pytest.fixture(autouse=True)
def fake_catalog(monkeypatch):
    monkeypatch.setattr(tables, "CATALOG", "lake")


def test_read_table_routes_to_catalog():
    spark = mock.MagicMock()
    tables.read_table(spark, "db.docs")
    spark.read.table.assert_called_once_with("lake.db.docs")


def test_append_routes_to_writeTo_append():
    df = mock.MagicMock()
    tables.append(df, "db.docs")
    df.writeTo.assert_called_once_with("lake.db.docs")
    df.writeTo.return_value.append.assert_called_once_with()


def test_overwrite_partitions_routes_to_overwritePartitions():
    df = mock.MagicMock()
    tables.overwrite_partitions(df, "db.docs", ["bucket"])
    df.writeTo.assert_called_once_with("lake.db.docs")
    df.writeTo.return_value.overwritePartitions.assert_called_once_with()
    # and never touches the parquet writer or session conf
    df.write.mode.assert_not_called()
    df.sparkSession.conf.set.assert_not_called()


def test_delete_where_issues_row_level_delete():
    spark = mock.MagicMock()
    tables.delete_where(spark, "db.docs", "doc_id % 7 = 0")
    spark.sql.assert_called_once_with(
        "DELETE FROM lake.db.docs WHERE doc_id % 7 = 0"
    )
    spark.read.parquet.assert_not_called()


def test_clear_partitions_issues_partition_delete():
    spark = mock.MagicMock()
    tables.clear_partitions(spark, "db.docs", "bucket", [3, 7])
    spark.sql.assert_called_once_with(
        "DELETE FROM lake.db.docs WHERE bucket IN (3, 7)"
    )
