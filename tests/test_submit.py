"""The north-rule run mode: `spark-submit --py-files <engine.zip>` with the
job importing the engine ONLY from the shipped zip (no repo on sys.path) —
what a multi-executor cluster submission looks like, minus the cluster."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_py_files(tmp_path):
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "package_pyfiles.py")],
        capture_output=True, text=True, check=True, cwd=REPO,
    ).stdout.strip()
    assert zip_path.endswith(".zip") and os.path.exists(zip_path)

    # run from an empty cwd so `import httrack2warc_spark` can only resolve
    # through the --py-files zip spark-submit ships
    out = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--py-files", zip_path,
         os.path.join(REPO, "submit_job.py"),
         "crawl", "--hosts", "2", "--pages", "50", "--parts", "8"],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["urls"] == 100  # every page of the 2x50 synthetic web
    assert summary["snapshots"] >= 2  # per-round resume points committed
