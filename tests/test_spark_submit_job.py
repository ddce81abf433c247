"""The spark-submit --py-files deployment story, exercised for real:
zip the package, generate a small corpus, spark-submit the job script from a
cwd OUTSIDE the repo (so only the zip provides the package), assert the
checkpointed output + ledger, then rerun and assert resume-no-op."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_submit_job_roundtrip(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("submit")
    in_dir, out_dir, ledger = str(base / "in"), str(base / "out"), str(base / "led")

    from pdf_extraction_and_query_spark.sources.corpus import docs_to_df, synth_docs
    from pdf_extraction_and_query_spark.sources.packaging import build_package_zip

    docs_to_df(spark, synth_docs(12, seed=31)).write.parquet(in_dir)
    zip_path = build_package_zip(str(base))

    def submit():
        env = {**os.environ, "PYSPARK_PYTHON": sys.executable}
        return subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[4]",
                "--py-files", zip_path,
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=8",
                os.path.join(REPO, "scripts", "run_extract_job.py"),
                "--input", in_dir,
                "--output", out_dir,
                "--ledger", ledger,
                "--job-id", "submit-test",
                "--n-buckets", "4",
                "--buckets-per-wave", "2",
            ],
            capture_output=True,
            text=True,
            cwd=str(base),  # NOT the repo — the zip must supply the package
            timeout=480,
            check=True,
            env=env,
        )

    r1 = submit()
    rep1 = json.loads([l for l in r1.stdout.splitlines() if l.startswith("{")][-1])
    assert rep1["processed_buckets"] == 4 and rep1["skipped_buckets"] == 0

    out = spark.read.parquet(out_dir)
    assert out.count() > 0
    assert {"doc_id", "order", "kind", "text", "media_ref", "bucket"} <= set(out.columns)

    r2 = submit()
    rep2 = json.loads([l for l in r2.stdout.splitlines() if l.startswith("{")][-1])
    assert rep2["processed_buckets"] == 0 and rep2["skipped_buckets"] == 4
