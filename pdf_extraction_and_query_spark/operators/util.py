"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def _parse_bytes(s: str | int) -> int:
    """Spark byte-size conf string ('32m', '128MB', '4194304b', plain int)
    -> bytes."""
    s = str(s).strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    mult = 1
    if s and s[-1] in "kmgtp":
        mult = 1024 ** ("kmgtp".index(s[-1]) + 1)
        s = s[:-1]
    return int(float(s)) * mult


def _scan_cost_at_least(docs: DataFrame, files: list[str], target: int) -> bool:
    """True when the scan's file-planning cost guarantees >= ``target``
    input partitions. Mirrors FilePartition planning: each file costs
    (length + openCostInBytes) and a partition holds at most
    maxSplitBytes <= maxPartitionBytes of cost, so
    total_cost >= target * maxPartitionBytes  =>  partitions >= target.
    Driver-side metadata only (the same FileSystem listing the scan planner
    performs); EARLY-EXITS once the bound is met, so an at-scale table
    stats only the first ~target*maxPartitionBytes worth of files instead
    of converting the frame to an RDD (the previous implementation forced a
    plan->RDD conversion on every call — planning overhead on every
    token-family query)."""
    sess = docs.sparkSession
    maxp = _parse_bytes(sess.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    open_cost = _parse_bytes(sess.conf.get("spark.sql.files.openCostInBytes", "4m"))
    need = target * maxp
    jvm = sess._jvm
    hconf = sess._jsc.hadoopConfiguration()  # type: ignore[attr-defined]
    Path = jvm.org.apache.hadoop.fs.Path
    fs = None
    total = 0
    for f in files:
        p = Path(f)
        if fs is None:
            fs = p.getFileSystem(hconf)
        try:
            total += fs.getFileStatus(p).getLen() + open_cost
        except Exception:  # noqa: BLE001 — file listed but unreadable: skip
            continue
        if total >= need:
            return True
    return total >= need


def fan_out(docs: DataFrame, target: int | None = None) -> DataFrame:
    """Guarantee at least cluster-parallelism input partitions before a
    compute-amplifying narrow stage (n-gram/shingle/posting explodes
    multiply work ~5-10x over input BYTES).

    Spark sizes scan tasks by bytes (``maxPartitionBytes``), so a
    compressed documents table that is physically few files/row-groups
    runs the whole explode + map-side partial aggregation — the expensive
    part of every token-family operator — in that many tasks no matter how
    many cores exist.  Measured on this repo's gate corpus (a SINGLE
    0.6 MB parquet file): repetition_metrics scaled 1.1x from local[2] to
    local[8] before this guard and ~3x after; see PLANS.md #13.

    The repartition is CONDITIONAL: when the scan's planning cost already
    guarantees >= target partitions (any real at-scale table — checked
    from file metadata with an early exit, no RDD conversion), this is a
    no-op and costs nothing.  When it fires, the shuffle moves raw text
    once — cheaper per byte than letting the single task later shuffle the
    ~6x-amplified gram stream from one core.  The explicit partition count
    keeps AQE from coalescing it back down by size."""
    sc = docs.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    files = docs.inputFiles()
    if files and _scan_cost_at_least(docs, files, target):
        return docs
    # small scan, or an in-memory source with no file metadata: fan out
    return docs.repartition(target)
