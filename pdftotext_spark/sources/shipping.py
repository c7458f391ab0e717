"""Ship the package to executors (``spark-submit --py-files`` analog).

Any plan containing a ``mapInPandas`` stage needs the
``pdftotext_spark`` package importable on every Python worker. Under
``spark-submit --py-files pdftotext_spark.zip`` that's the deploy
mechanism (north_rule); when the engine is imported into someone
else's SparkSession (the driver harness, a notebook), the workers may
share neither cwd nor PYTHONPATH with the driver — so every
UDF-bearing entry point calls :func:`ship_package` first, which zips
the installed package once per session and registers it with
``sc.addPyFile``. Idempotent and a no-op when already shipped.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_shipped: set[str] = set()


def build_package_zip(dest_dir: str | None = None) -> str:
    """Zip the pdftotext_spark package (source tree) for --py-files."""
    import pdftotext_spark

    pkg_dir = os.path.dirname(os.path.abspath(pdftotext_spark.__file__))
    if dest_dir is None:
        dest_dir = tempfile.mkdtemp(prefix="pdftotext_spark_ship_")
    else:
        os.makedirs(dest_dir, exist_ok=True)
    zip_path = os.path.join(dest_dir, "pdftotext_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fname in files:
                if not fname.endswith(".py"):
                    continue
                full = os.path.join(root, fname)
                rel = os.path.join(
                    "pdftotext_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    return zip_path


def ship_package(spark: SparkSession) -> None:
    """Make pdftotext_spark importable on executors (once per app)."""
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _shipped:
        return
    sc.addPyFile(build_package_zip())
    _shipped.add(app_id)
