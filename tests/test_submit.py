"""North-rule packaging: the pipeline must run via
``spark-submit --py-files <zip>`` with the engine resolved from the zip
(not the repo checkout) — proven by running from a different cwd with
only the zip on the python path."""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles(tmp_path):
    zip_path = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "package_pyfiles.py")],
        capture_output=True, text=True, check=True).stdout.strip()
    assert os.path.exists(zip_path)

    import pyspark
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    run_dir = str(tmp_path / "run")
    proc = subprocess.run(
        [submit, "--master", "local[4]", "--py-files", zip_path,
         os.path.join(ROOT, "scripts", "submit_pipeline.py"),
         "--gen-convs", "50", "--run-dir", run_dir, "--mode", "fast"],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["triples"] > 0
    assert os.path.exists(os.path.join(run_dir, "triples.parquet"))
