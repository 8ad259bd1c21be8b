"""spark-submit --py-files packaging (north rule: the engine ships as
spark-submit --py-files modules).

Builds the deterministic package zip, then launches a REAL spark-submit
subprocess from a clean cwd (so the package can only be imported from the
--py-files archive, not the repo checkout) and checks the job's JSON
summary. Reference parity: the reference ships one self-contained binary
(nusamai/src/main.rs); the Spark-native equivalent is archive + thin
driver script.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TINY_SF", "/root/testdata/sf0.001")
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _build_zip(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import package_pyfiles as pp
    finally:
        sys.path.pop(0)
    out = str(tmp_path / "plateau_gis_converter_spark.zip")
    d1 = pp.build_zip(REPO, out)
    d2 = pp.build_zip(REPO, out)
    assert d1 == d2, "package zip must be byte-reproducible"
    return out


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_spatial_join(tmp_path):
    zip_path = _build_zip(tmp_path)
    # the driver script is copied OUT of the repo: the only route to the
    # package is the --py-files archive
    driver = tmp_path / "submit_job.py"
    shutil.copyfile(os.path.join(REPO, "scripts", "submit_job.py"), driver)

    env = {k: v for k, v in os.environ.items()
           if not k.startswith("PYSPARK")}
    env["PYTHONPATH"] = ""  # no repo leakage into the subprocess
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path, str(driver),
         "--sf-dir", SF_DIR, "--job", "spatial_join",
         "--out", str(tmp_path / "out")],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=300)
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary_lines = [ln for ln in proc.stdout.splitlines()
                     if ln.startswith("{")]
    assert summary_lines, proc.stdout
    summary = json.loads(summary_lines[-1])
    assert summary["job"] == "spatial_join"
    # every ward in the tessellation receives pages at sf0.001
    assert summary["rows"] == 23
    out_dir = tmp_path / "out" / "spatial_join.parquet"
    assert out_dir.exists()
