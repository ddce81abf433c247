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


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_submit_embed_job_with_file_backed_model(spark, tmp_path_factory):
    """Round-4 verdict Next #6: a NON-TRIVIAL numpy model (random-projection
    matrix loaded from a weights file) rides the SPARK_GRAFT_EMBEDDER seam
    through a real spark-submit --py-files run, feeds embed_documents into
    vector_topk, and the whole pipeline is replayed driver-side in pure
    numpy/Decimal — embeddings allclose AND the fixed-point top-k ranking
    EXACTLY equal."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    base = tmp_path_factory.mktemp("embed_submit")
    in_dir, out_dir = str(base / "in"), str(base / "out")

    from pdf_extraction_and_query_spark import contract as C
    from pdf_extraction_and_query_spark.sources.packaging import (
        build_package_zip,
    )

    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "query",
             "vector", "spark", "shuffle", "window", "batch"]
    rows = [
        (i, " ".join(words[(i * 5 + k * 3) % len(words)] for k in range(12)))
        for i in range(40)
    ] + [(40, "")]  # empty doc: must embed to the zero vector, no model call
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        in_dir
    )

    # the "weights": a seeded random-projection matrix saved to a file the
    # executors load lazily (the sentence-transformers load-from-disk shape)
    feat_dim, dim = 128, C.EMBED_DIM
    rng = np.random.default_rng(1234)
    M = rng.standard_normal((feat_dim, dim))
    mpath = str(base / "rp_matrix.npy")
    np.save(mpath, M)

    model_py = base / "rp_embedder.py"
    model_py.write_text(
        "import hashlib, os\n"
        "import numpy as np\n\n"
        "def _feats(text, feat_dim):\n"
        "    f = np.zeros(feat_dim)\n"
        "    for w in text.lower().split():\n"
        "        h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)\n"
        "        f[h % feat_dim] += 1.0\n"
        "    return f\n\n"
        "def load_model():\n"
        "    M = np.load(os.environ['RP_MATRIX_PATH'])\n"
        "    class RP:\n"
        "        def encode(self, texts):\n"
        "            F = np.stack([_feats(t, M.shape[0]) for t in texts])\n"
        "            return F @ M\n"
        "    return RP()\n"
    )

    zip_path = build_package_zip(str(base))
    env = {
        **os.environ,
        "PYSPARK_PYTHON": sys.executable,
        "SPARK_GRAFT_EMBEDDER": "rp_embedder:load_model",
        "RP_MATRIX_PATH": mpath,
    }
    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", f"{zip_path},{model_py}",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", f"spark.executorEnv.RP_MATRIX_PATH={mpath}",
            os.path.join(REPO, "scripts", "run_embed_job.py"),
            "--input", in_dir,
            "--output", out_dir,
            "--k", "5",
            "--query-doc-id", "7",
        ],
        capture_output=True, text=True, cwd=str(base), timeout=480,
        check=True, env=env,
    )
    rep = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert rep["n_docs"] == 41 and rep["k"] == 5

    # ---- driver-side replay, zero Spark ----
    def replay_embed(text):
        f = np.zeros(feat_dim)
        for w in text.lower().split():
            h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
            f[h % feat_dim] += 1.0
        v = f @ M
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    expected = {i: replay_embed(t) for i, t in rows}
    got = {
        r_["doc_id"]: np.array(r_["embedding"])
        for r_ in spark.read.parquet(f"{out_dir}/embeddings").collect()
    }
    assert set(got) == set(expected)
    for i in expected:
        assert np.allclose(got[i], expected[i], atol=1e-12), i
    assert np.allclose(got[40], 0.0)  # empty doc -> zero vector

    # fixed-point replay of the search (Spark round() == BigDecimal
    # HALF_UP on Double.toString == Decimal(repr) HALF_UP)
    def e6(v):
        return [
            int(
                Decimal(repr(float(x) * C.FIXED_POINT)).to_integral_value(
                    rounding=ROUND_HALF_UP
                )
            )
            for x in v
        ]

    ev = {i: np.array(e6(v), dtype=np.int64) for i, v in expected.items()}
    q = ev[7]
    scored = sorted(
        ((int(ev[i] @ q), i) for i in ev), key=lambda t: (-t[0], t[1])
    )[:5]
    want = [{"vec_id": i, "dot_e12": d} for d, i in scored]
    assert rep["top"] == want
