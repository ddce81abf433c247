"""Driver-simulation preflight: run EVERY registry query the way the
driver does — vanilla SparkSession, then pandas frame-sort canonicalization
over all output columns (the step that dies on array-typed cells) — and
report per-query row counts. Catches driver-side canonicalization crashes
(round-1 stub_embed/process_documents) before the real gate does.

Usage: python scripts/driver_preflight.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E  # noqa: E402


def canon(df):
    """The driver's canonicalization shape: columns sorted by name, frame
    sorted by every RAW column — no astype(str) first, because stringifying
    object cells would mask exactly the unhashable-array crash (round-1
    stub_embed/process_documents) this preflight exists to catch."""
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


# threshold-gated queries may legitimately return 0 rows at a small sf_dir
# (similarity thresholds prune every candidate pair) — 0 rows there is a
# WARNING, not a failed build
ZERO_ROWS_OK = {
    "embedding_near_pairs",
    "embedding_near_pairs_lsh",
    "simhash_near_pairs",
    "ngram_jaccard",
    "ngram_jaccard_pruned",
    "minhash_lsh_pairs",
    # duplicate-content groups exist only where the corpus HAS duplicate
    # texts (sf0.001 yes, sf0.01 none) — 0 groups is a true answer
    "html_content_dups",
}

failures = []
warnings = []
for name, fn in sorted(E.queries().items()):
    try:
        pdf = fn(spark, sf_dir).toPandas()
        canon(pdf)
        print(f"OK   {name}: {len(pdf)} rows")
        if len(pdf) == 0:
            if name in ZERO_ROWS_OK:
                warnings.append((name, "0 rows (threshold-gated; OK at small sf)"))
            else:
                failures.append((name, "0 rows (vacuous)"))
    except Exception as exc:  # noqa: BLE001
        failures.append((name, repr(exc)[:200]))
        print(f"FAIL {name}: {exc}")

print()
for name, msg in warnings:
    print(f"WARN {name}: {msg}")
if failures:
    print("PREFLIGHT FAILURES:")
    for name, err in failures:
        print(f"  {name}: {err}")
    sys.exit(1)
print(f"PREFLIGHT OK: {len(E.queries())} queries, all canonicalizable, none empty")
spark.stop()
