"""Deployment-path smoke: the engine runs via ``spark-submit --py-files``
exactly as the north rule specifies — the library zipped and shipped to
executors, the entry point being the package's ``__main__``. Pins that
nothing in the package depends on being importable from the driver's cwd
(the failure mode --py-files deployments actually hit)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "read_comp_data_pipeline_spark"

spark_submit = shutil.which("spark-submit") or os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
)
pytestmark = pytest.mark.skipif(
    not os.path.exists(spark_submit), reason="spark-submit not on this host"
)


def _zip_package(out_zip: str) -> None:
    src = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out_zip, "w") as z:
        for root, _dirs, files in os.walk(src):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))


def _submit(py_files: str, entry: str, args: list[str], cwd: str) -> dict:
    """Run one CLI command through spark-submit from a NEUTRAL cwd (the
    repo must not be importable except via --py-files)."""
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", py_files, entry, *args],
        capture_output=True, text=True, timeout=420, cwd=cwd, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, proc.stdout[-2000:]
    return json.loads(lines[-1])


def test_spark_submit_py_files_end_to_end(tmp_path):
    zip_path = str(tmp_path / "engine.zip")
    _zip_package(zip_path)
    # the submitted script is extracted OUT of the repo so only the zip
    # provides the package
    entry = str(tmp_path / "entry_main.py")
    shutil.copyfile(os.path.join(REPO, PKG, "__main__.py"), entry)
    wal, tbl = str(tmp_path / "wal"), str(tmp_path / "tbl")
    cwd = str(tmp_path)

    out = _submit(zip_path, entry,
                  ["generate", "--out", wal, "--events", "600",
                   "--keys", "100", "--epoch-size", "300"], cwd)
    assert out == {"written": wal, "events": 600}
    out = _submit(zip_path, entry,
                  ["ingest", "--wal", wal, "--table", tbl,
                   "--buckets", "4", "--mode", "mor"], cwd)
    assert out["epochs_applied"] == 2 and out["events_applied"] == 600
    # resumability survives the deployment path too
    out = _submit(zip_path, entry,
                  ["ingest", "--wal", wal, "--table", tbl,
                   "--buckets", "4", "--mode", "mor"], cwd)
    assert out["epochs_applied"] == 0
