"""North-rule launch contract: the engine ships as ONE zip and runs via
`spark-submit --py-files dist/gdal_spark.zip tools/submit_job.py` with
no repo-checkout assumption (SURVEY.md §7)."""

import json
import os
import shutil
import subprocess
import zipfile

REPO = "/root/repo"


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    try:
        import pyspark

        p = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                         "spark-submit")
        return p if os.path.exists(p) else None
    except ImportError:
        return None


def test_spark_submit_pyfiles_zip(tmp_path):
    submit = _spark_submit()
    assert submit, "spark-submit not found"
    subprocess.run(
        ["make", "package"], cwd=REPO, check=True, capture_output=True
    )
    zip_path = os.path.join(REPO, "dist", "gdal_spark.zip")
    names = zipfile.ZipFile(zip_path).namelist()
    assert "gdal_spark/__init__.py" in names
    assert not any("__pycache__" in n for n in names)
    # foreign cwd + scrubbed PYTHONPATH: imports MUST resolve from the
    # --py-files payload, not the checkout.
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            submit,
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            os.path.join(REPO, "tools", "submit_job.py"),
            "/root/testdata/sf0.001",
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = next(
        ln for ln in proc.stdout.splitlines()
        if ln.startswith("SUBMIT_RESULT ")
    )
    result = json.loads(line[len("SUBMIT_RESULT "):])
    # same flagship join the driver smoke-checks: 360 rows at sf0.001
    assert result["rows"] == 360
