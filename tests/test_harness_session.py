"""Regression: the driver contract must work with a SparkSession WE did not
create (no --py-files, no session tuning) from a cwd outside the repo —
executors must still import the package (ensure_shipped auto-attach).
Runs in a subprocess so no repo-side session state can leak in."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
n = E.entry(spark).count()
m = E.queries()["extract_fused"](spark, "/root/testdata/sf0.001").count()
assert n > 0 and m > 0, (n, m)
print("HARNESS_OK", n, m)
spark.stop()
"""


def test_entry_with_foreign_session_and_cwd(tmp_path):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # nothing may leak the repo path
    }
    r = subprocess.run(
        [sys.executable, "-c", _PROBE.format(repo=REPO)],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        timeout=420,
        env=env,
    )
    assert "HARNESS_OK" in r.stdout, r.stderr[-800:]
