"""Real `spark-submit --py-files` end-to-end evidence (north rule run shape).

The CLI smoke tests run the batch job in-process; this test runs the
ACTUAL submit path the north rule names: package zipped by
scripts/make_pyfiles_zip.py, shipped via --py-files, launched through
scripts/submit_job.py from a NEUTRAL working directory (the repo is not
importable from cwd — the package must resolve from the zip on the driver
and on every executor), and the resulting span table is compared against
the in-process run_mode path row-for-row.

Reference parity: the reference's batch entry is a spark-less CLI
(GrobidMedicalReportMain.java:136-218); the submit shape here is its
cluster-era analog per BASELINE.md's north rule ("run via spark-submit
--py-files").
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_DOCS = 80
MODE = "extract_header"


def _spark_submit_bin() -> str:
    # the pyspark pip install ships its own spark-submit — guaranteed to be
    # the same Spark version as the library the job imports
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _build_zip(dest: str) -> str:
    from grobid_clinical_report_spark.pyfiles import build

    return build(dest, repo_root=REPO)


def test_spark_submit_pyfiles_end_to_end(tmp_path, spark):
    from grobid_clinical_report_spark import datagen

    inp = str(tmp_path / "docs")
    out = str(tmp_path / "extracted")
    datagen.write_documents_parquet(inp, n_docs=N_DOCS, shards=4)

    zip_path = _build_zip(str(tmp_path / "grobid_clinical_report_spark.zip"))
    launcher = shutil.copy(
        os.path.join(REPO, "scripts", "submit_job.py"), tmp_path
    )

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip is the only route to the package
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env["SPARK_GRAFT_CPUS"] = "4"

    proc = subprocess.run(
        [
            _spark_submit_bin(),
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            str(launcher),
            "--input", inp,
            "--output", out,
            "--mode", MODE,
            "--buckets", "2",
            "--no-resume",
        ],
        cwd=str(tmp_path),  # neutral cwd: repo sources NOT importable
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    metrics_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    assert metrics_lines, proc.stdout[-2000:]
    metrics = json.loads(metrics_lines[-1])
    # datagen appends the fixture corpus to every synthetic tier, so count
    # the actual input rather than assuming N_DOCS
    n_input = spark.read.parquet(inp).count()
    assert metrics["docs"] == n_input
    assert metrics["buckets_run"] == 2
    assert metrics["quarantined"] == 0

    # row-for-row parity with the in-process path on the same corpus
    from grobid_clinical_report_spark.io import read_documents
    from grobid_clinical_report_spark.pipeline import run_mode
    from grobid_clinical_report_spark.runner import (
        read_extracted,
        split_guardrail,
    )

    docs = read_documents(spark, inp).select("doc_id", "spans")
    ok, _ = split_guardrail(docs)
    expected = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in run_mode(ok, MODE).collect()
    }
    got = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in read_extracted(spark, out).select(*expected_cols(expected)).collect()
    }
    assert set(got) == set(expected)
    assert got == expected


def expected_cols(expected: dict) -> list[str]:
    any_row = next(iter(expected.values()))
    return list(any_row.keys())
