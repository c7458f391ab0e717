"""The literal north-rule ship shape: ``spark-submit --py-files
pdftotext_spark.zip scripts/run_extraction_job.py`` as a real
subprocess (own JVM, package resolved from the zip, not the repo)."""

import shutil
import subprocess
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = [
    pytest.mark.spark,
    pytest.mark.skipif(
        not Path(SPARK_SUBMIT).exists(), reason="spark-submit not available"
    ),
]


def test_spark_submit_py_files(tmp_path):
    from pdftotext_spark.sources.shipping import build_package_zip
    from pdftotext_spark.sources.transcripts_gen import write_parquet

    write_parquet(str(tmp_path / "in"), 150, seed=21)
    zip_path = build_package_zip(str(tmp_path))
    out = tmp_path / "out"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[8]",
            "--py-files",
            zip_path,
            "--conf",
            "spark.ui.enabled=false",
            str(REPO / "scripts" / "run_extraction_job.py"),
            "--input",
            str(tmp_path / "in" / "transcripts.parquet"),
            "--output",
            str(out),
            "--metrics",
            str(tmp_path / "metrics"),
            "--run-id",
            "submit-test",
        ],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=str(tmp_path),  # NOT the repo: the zip must supply the package
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    n, bad = duckdb.sql(
        f"""
        SELECT COUNT(*),
               SUM(CASE WHEN o.extracted_text <> g.expected_text THEN 1 ELSE 0 END)
        FROM read_parquet('{out}/*.parquet') o
        JOIN read_parquet('{tmp_path}/in/golden.parquet') g USING (conv_id, turn_idx)
        """
    ).fetchone()
    assert n == 150 and bad == 0
    m = duckdb.sql(
        f"SELECT SUM(turns_parsed) FROM read_parquet('{tmp_path}/metrics/*.parquet')"
    ).fetchone()[0]
    assert m == 150
