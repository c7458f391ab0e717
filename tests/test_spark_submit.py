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


def test_spark_submit_dedup_job(tmp_path):
    """The dedup job end-to-end through spark-submit: exact dups
    collapse, near-dup groups keep exactly the min-id member."""
    import json

    import pandas as pd

    from pdftotext_spark.sources.shipping import build_package_zip

    # corpus: 2 exact copies + 2 near-dups (long shared prefix) + distinct
    base = "the quick brown fox jumps over the lazy dog " * 12
    docs = pd.DataFrame(
        {
            "doc_id": pd.array(range(6), dtype="int64"),
            "text": [
                base,
                base,  # exact dup of 0
                base + "tail variation one",  # near-dup of 0
                "completely different content about spark pipelines " * 10,
                "another unrelated document body with its own words " * 10,
                base + "tail variation two",  # near-dup of 0
            ],
            "lang": ["en"] * 6,
            "source": ["s"] * 6,
            "n_chars": pd.array([len(base)] * 6, dtype="int64"),
        }
    )
    indir = tmp_path / "in"
    indir.mkdir()
    docs.to_parquet(indir / "documents.parquet")
    zip_path = build_package_zip(str(tmp_path))
    out = tmp_path / "survivors"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[8]",
            "--py-files",
            zip_path,
            "--conf",
            "spark.ui.enabled=false",
            str(REPO / "scripts" / "run_dedup_job.py"),
            "--input",
            str(indir),
            "--output",
            str(out),
            "--groups",
            str(tmp_path / "groups"),
        ],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["docs_in"] == 6
    survivors = sorted(
        r[0] for r in duckdb.sql(f"SELECT doc_id FROM read_parquet('{out}/*.parquet')").fetchall()
    )
    # doc 1 (exact dup) and docs 2/5 (near-dups of 0) collapse onto 0
    assert survivors == [0, 3, 4]
    groups = duckdb.sql(
        f"SELECT doc_id, group_id FROM read_parquet('{tmp_path}/groups/*.parquet') ORDER BY doc_id"
    ).fetchall()
    assert all(g == 0 for _, g in groups)  # one component, min-id 0


def test_spark_submit_with_options(tmp_path):
    """VERDICT r02 item 9: the full ExtractOptions surface must survive
    spark-submit --py-files — exercised with driver-supplied CID
    override tables (the most executor-sensitive option: it rides the
    pickled UDF, not any process-global registry)."""
    import base64
    import json

    import pandas as pd

    from pdftotext_spark.sources import pdfbuilder as pb
    from pdftotext_spark.sources.shipping import build_package_zip

    pdf, _ = pb.identity_h_no_tounicode_pdf("x", base_font="SUBOPT+Fake")
    pdf = pdf.replace(b"<005B>", b"<000100020003>")
    indir = tmp_path / "in"
    indir.mkdir()
    pd.DataFrame(
        {
            "conv_id": ["c1"],
            "turn_idx": [0],
            "role": ["user"],
            "text": ["%B64%" + base64.b64encode(pdf).decode("ascii")],
            "tool": ["pdf-b64"],
            "ts": pd.to_datetime(["2026-01-01"], utc=True).as_unit("us"),
        }
    ).to_parquet(indir / "t.parquet")
    opts_file = tmp_path / "opts.json"
    opts_file.write_text(
        json.dumps(
            {"cid_tables": [["SUBOPT", {"1": "A", "2": "B", "3": "C"}, {}]]}
        )
    )
    zip_path = build_package_zip(str(tmp_path))
    out = tmp_path / "out"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            "--conf",
            "spark.ui.enabled=false",
            str(REPO / "scripts" / "run_extraction_job.py"),
            "--input",
            str(indir / "t.parquet"),
            "--output",
            str(out),
            "--run-id",
            "opt-test",
            "--options",
            f"@{opts_file}",
        ],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    row = duckdb.sql(
        f"SELECT extracted_text FROM read_parquet('{out}/*.parquet')"
    ).fetchone()
    assert row[0] == "ABC"
