"""Ship the package to executors (the ``spark-submit --py-files`` story).

Workers deserialize grouped-map UDFs that reference this package, so every
executor's Python needs it importable. ``attach_package`` zips the package
and registers it via ``SparkContext.addPyFile`` — identical mechanism to
``spark-submit --py-files pkg.zip`` on a real cluster, and it works in
local mode too (regression: driving the pipeline from a cwd outside the
repo raised ``ModuleNotFoundError`` on the workers before this).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PKG_NAME = os.path.basename(_PKG_DIR)


def build_package_zip(out_dir: str | None = None) -> str:
    """Zip this package for --py-files distribution; returns the zip path."""
    if not os.path.isdir(_PKG_DIR):
        # imported FROM a zip (spark-submit --py-files): _PKG_DIR points
        # inside the archive — re-zipping would overwrite the shipped zip
        # with an EMPTY one and kill every executor import
        raise RuntimeError(
            f"package imported from an archive ({_PKG_DIR}); it is already "
            "distributed — nothing to build"
        )
    out_dir = out_dir or tempfile.gettempdir()
    zip_path = os.path.join(out_dir, f"{_PKG_NAME}.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            if "__pycache__" in root:
                continue
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join(_PKG_NAME, os.path.relpath(full, _PKG_DIR))
                zf.write(full, rel)
    return zip_path


def attach_package(spark: SparkSession) -> str:
    zip_path = build_package_zip()
    spark.sparkContext.addPyFile(zip_path)
    return zip_path


_shipped_apps: set = set()


def ensure_shipped(spark: SparkSession) -> None:
    """Idempotently ship the package to the executors of ANY session —
    including one created by an external harness without --py-files (the
    driver contract hands us its own SparkSession; without this, every
    Arrow-UDF operator dies with ModuleNotFoundError in the python workers
    when the harness runs outside the repo)."""
    if not os.path.isdir(_PKG_DIR):
        return  # already running from a --py-files archive
    app_id = spark.sparkContext.applicationId
    if app_id in _shipped_apps:
        return
    attach_package(spark)
    _shipped_apps.add(app_id)
