"""Table catalog shim: Iceberg when a catalog is configured, parquet layout
otherwise.

The north rule targets Iceberg tables; this sandbox has no Iceberg runtime
jar (verified: /opt/spark/jars has none, no network to fetch one), so the
default backend is parquet with an Iceberg-compatible layout (partition
columns, append/overwrite-by-partition semantics). Every call site goes
through this module, so pointing ``SPARK_GRAFT_CATALOG`` at a configured
Iceberg catalog (e.g. ``spark.sql.catalog.lake = org.apache.iceberg...``)
switches the storage layer without touching operator code.

API surface used by the engine:
  * ``read_table(spark, ident)``          — scan
  * ``append(df, ident)``                 — append rows
  * ``overwrite_partitions(df, ident, cols)`` — idempotent dynamic overwrite
  * ``delete_where(spark, ident, cond)``  — delete (Iceberg DELETE / parquet
                                            anti-filter rewrite)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

CATALOG = os.environ.get("SPARK_GRAFT_CATALOG", "")  # "" -> parquet backend


def _is_iceberg() -> bool:
    return bool(CATALOG)


def read_table(spark: SparkSession, ident: str) -> DataFrame:
    if _is_iceberg():
        return spark.read.table(f"{CATALOG}.{ident}")
    return spark.read.parquet(ident)


def append(df: DataFrame, ident: str) -> None:
    if _is_iceberg():
        df.writeTo(f"{CATALOG}.{ident}").append()
    else:
        df.write.mode("append").parquet(ident)


def overwrite_partitions(df: DataFrame, ident: str, partition_cols: list[str]) -> None:
    """Replace exactly the partitions present in ``df`` (the idempotent
    checkpoint-wave write)."""
    if _is_iceberg():
        df.writeTo(f"{CATALOG}.{ident}").overwritePartitions()
    else:
        df.sparkSession.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(ident)


def delete_where(spark: SparkSession, ident: str, condition: str) -> None:
    """Row-level delete. Iceberg: native DELETE. Parquet: rewrite-keeping
    (read, filter out, full overwrite) — the small-table fallback only."""
    if _is_iceberg():
        spark.sql(f"DELETE FROM {CATALOG}.{ident} WHERE {condition}")
    else:
        kept = spark.read.parquet(ident).where(f"NOT ({condition})")
        # parquet has no transactional rewrite; stage then swap via overwrite
        kept_rows = kept.collect()  # small-table fallback only
        if kept.schema.fields:
            spark.createDataFrame(kept_rows, kept.schema).write.mode(
                "overwrite"
            ).parquet(ident)
