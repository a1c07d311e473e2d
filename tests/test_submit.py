"""North-rule deployment mode: `spark-submit --py-files clann_spark.zip`
on a multi-executor-JVM master (local-cluster), with the package served
ONLY from the zip (reference deployment contract: BASELINE.json
north_rule 'run via spark-submit --py-files').

The job script (examples/submit_dedup.py) has no sys.path fixup — if
the zip were incomplete, the driver or any executor's Python worker
would fail on import, so a green run evidences that the shipped
artifact alone carries the pipeline to distributed executors.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(path: str) -> None:
    pkg = os.path.join(REPO, "clann_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


def test_spark_submit_py_files_multi_executor(tmp_path, spark, sf_dir):
    zip_path = str(tmp_path / "clann_spark.zip")
    _build_zip(zip_path)

    spark_home = os.environ.get("SPARK_HOME", "/opt/spark")
    submit = os.path.join(spark_home, "bin", "spark-submit")
    if not os.path.exists(submit):
        pytest.skip("spark-submit not on this host")

    # Strip the repo from PYTHONPATH so the ONLY source of clann_spark
    # is the --py-files zip, in the driver and in every executor JVM's
    # Python workers alike.
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

    proc = subprocess.run(
        [
            submit,
            "--master", "local-cluster[2,2,2048]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "examples", "submit_dedup.py"),
            sf_dir,
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),  # not the repo root: no accidental cwd import
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith('{"summary"')]
    assert line, proc.stdout[-2000:]
    summary = json.loads(line[-1])["summary"]

    # Same pipeline in-process (the pytest-managed session) must agree.
    from clann_spark.config import DedupConfig
    from clann_spark.pipeline import dedup_summary, run_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    expect = dedup_summary(run_dedup(docs, DedupConfig(signature_impl="fast"))).collect()[0]
    assert summary == expect.asDict()
