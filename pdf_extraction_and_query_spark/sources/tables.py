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


def read_optional(spark: SparkSession, ident: str) -> DataFrame | None:
    """:func:`read_table`, or ``None`` when the table does not exist yet
    (e.g. a streaming delta sidecar before the first micro-batch lands)."""
    from pyspark.sql.utils import AnalysisException

    try:
        return read_table(spark, ident)
    except AnalysisException:
        return None


def append(df: DataFrame, ident: str) -> None:
    if _is_iceberg():
        df.writeTo(f"{CATALOG}.{ident}").append()
    else:
        df.write.mode("append").parquet(ident)


def replace_table(df: DataFrame, ident: str) -> None:
    """Full-table replace for UNPARTITIONED artifacts (e.g. the PQ code
    table, whose ADC scan always reads every code — there is no pruning
    dimension to partition by)."""
    if _is_iceberg():
        df.writeTo(f"{CATALOG}.{ident}").createOrReplace()
    else:
        df.write.mode("overwrite").parquet(ident)


def overwrite_partitions(df: DataFrame, ident: str, partition_cols: list[str]) -> None:
    """Replace exactly the partitions present in ``df`` (the idempotent
    checkpoint-wave write). The dynamic mode is a PER-WRITE option — never a
    session conf mutation, which would silently change the semantics of any
    later partitioned overwrite in the same session."""
    if _is_iceberg():
        df.writeTo(f"{CATALOG}.{ident}").overwritePartitions()
    else:
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
            .parquet(ident)
        )


# chars Spark escapes in partition directory names
# (sql/catalyst ExternalCatalogUtils.charToEscape: ASCII control chars plus
# the Hive-reserved path set), encoded as %XX uppercase hex
_ESCAPE_CHARS = frozenset(
    {chr(c) for c in range(0x01, 0x20)} | set('"#%\'*/:=?\\{[]^') | {chr(0x7F)}
)
_HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def _escape_partition_value(v) -> str:
    """Partition value -> directory-name fragment, exactly as Spark writes
    it (ExternalCatalogUtils.getPartitionPathString): null/empty becomes the
    Hive default-partition name, reserved chars are %XX-escaped."""
    if v is None:
        return _HIVE_DEFAULT_PARTITION
    s = str(v)
    if s == "":
        return _HIVE_DEFAULT_PARTITION
    return "".join(f"%{ord(c):02X}" if c in _ESCAPE_CHARS else c for c in s)


def clear_partitions(spark: SparkSession, ident: str, col: str, values: list) -> None:
    """Drop the listed partitions outright. Needed before a dynamic
    partition-overwrite that may legitimately produce ZERO rows for some
    partitions — dynamic overwrite only replaces partitions present in the
    written frame, so a stale half-written partition from a crashed prior
    attempt would otherwise survive an empty re-run. Values are escaped the
    way Spark escapes partition directory names, so string values with
    spaces/slashes/etc. resolve to the directory Spark actually wrote
    (tests/test_tables.py proves the round-trip)."""
    if not values:
        return
    if _is_iceberg():
        def lit(v) -> str:
            if isinstance(v, str):
                return "'" + v.replace("'", "''") + "'"
            return str(v)

        in_list = ", ".join(lit(v) for v in values)
        spark.sql(f"DELETE FROM {CATALOG}.{ident} WHERE {col} IN ({in_list})")
        return
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for v in values:
        path = jvm.org.apache.hadoop.fs.Path(
            f"{ident}/{col}={_escape_partition_value(v)}"
        )
        fs = path.getFileSystem(hconf)
        fs.delete(path, True)  # no-op (returns False) if absent


def _staged_swap(spark: SparkSession, ident: str, write_staged) -> None:
    """Distributed rewrite of a parquet directory: write the replacement to
    a sibling staging path with a normal cluster-parallel write, then swap
    directories via the Hadoop FileSystem API (works on HDFS/S3A as well as
    local). Never collects to the driver, so table size is bounded by the
    cluster, not driver memory. The swap is not atomic (parquet has no
    transactional metadata — that is what the Iceberg backend is for); a
    crash between delete and rename leaves the staged copy intact for
    manual recovery.

    RECOVERY: if a reader finds the table path missing, look for sibling
    ``<ident>__old_<tag>`` (pre-swap data — rename it back to ``<ident>``)
    or ``<ident>__staging_<tag>`` (the finished replacement — rename it in).
    At most one swap's directories exist per tag; deployments needing
    concurrent readers during maintenance should run the Iceberg backend
    (``SPARK_GRAFT_CATALOG``), whose DELETE/rewrite are snapshot-atomic."""
    import uuid

    tag = uuid.uuid4().hex[:8]
    staging = f"{ident}__staging_{tag}"
    write_staged(staging)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(ident).getFileSystem(hconf)
    # rename-aside / rename-in / delete (NOT delete-then-rename): the table
    # path is missing only between the two renames — metadata ops — instead
    # of for the duration of a recursive delete; a crash leaves either the
    # old or the staged copy intact under a predictable name
    old = f"{ident}__old_{tag}"
    if not fs.rename(Path(ident), Path(old)):
        raise IOError(f"staged swap: rename {ident} -> {old} failed")
    if not fs.rename(Path(staging), Path(ident)):
        raise IOError(
            f"staged swap: rename {staging} -> {ident} failed; previous data at {old}"
        )
    fs.delete(Path(old), True)


def delete_where(spark: SparkSession, ident: str, condition: str) -> None:
    """Row-level delete. Iceberg: native DELETE. Parquet: distributed
    staged rewrite of the kept rows + directory swap (see _staged_swap)."""
    if _is_iceberg():
        spark.sql(f"DELETE FROM {CATALOG}.{ident} WHERE {condition}")
        return
    kept = spark.read.parquet(ident).where(f"NOT ({condition})")
    _staged_swap(spark, ident, lambda p: kept.write.parquet(p))


def compact(spark: SparkSession, ident: str, target_file_mb: int = 128) -> int:
    """Small-files compaction — the standing maintenance job of any
    long-running ingest (every streaming micro-batch / checkpoint wave adds
    files; scan cost at 100 TB is driven by file count as much as bytes).
    Iceberg: rewrite_data_files. Parquet: coalesce to ceil(bytes/target)
    output files via a staged rewrite (coalesce, not repartition — no
    shuffle, upstream tasks just concatenate). Returns the target file
    count."""
    if _is_iceberg():
        spark.sql(
            f"CALL {CATALOG}.system.rewrite_data_files("
            f"table => '{ident}', "
            f"options => map('target-file-size-bytes', '{target_file_mb * 1024 * 1024}'))"
        )
        return -1
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(ident).getFileSystem(hconf)
    total_bytes = fs.getContentSummary(Path(ident)).getLength()
    n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(ident).coalesce(int(n_files))
    _staged_swap(spark, ident, lambda p: df.write.parquet(p))
    return int(n_files)
