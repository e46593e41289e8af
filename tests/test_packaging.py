"""spark-submit --py-files contract: the packaged zip must be importable
from sys.path alone (that is what --py-files does on each executor), and an
actual `spark-submit --py-files dist.zip job.py` run must complete the
flagship pipeline — the deployment shape the north rule specifies."""
import os
import shutil
import subprocess
import sys

import pytest


def test_zip_imports_in_clean_interpreter(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "deduplipy_spark.zip")
    subprocess.run([sys.executable, os.path.join(repo, "scripts/package.py"),
                    out], check=True, capture_output=True)
    probe = (
        "import sys; sys.path.insert(0, %r); "
        "import deduplipy_spark.config as c; "
        "import deduplipy_spark.operators.minhash, deduplipy_spark.cli, "
        "deduplipy_spark.plans.pipeline, deduplipy_spark.replica; "
        "print(c.EngineConfig().config_hash())" % out
    )
    r = subprocess.run(
        [sys.executable, "-c", probe], check=True, capture_output=True,
        text=True, cwd=str(tmp_path),   # NOT the repo: zip must self-suffice
    )
    assert len(r.stdout.strip()) == 16


_JOB = """\
import sys
from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()   # master set by spark-submit
from deduplipy_spark.sources.datagen import gen_files
from deduplipy_spark.plans.pipeline import DedupPipeline

files = gen_files(spark, 200, 20, members=3, seed=7)
out = DedupPipeline(spark).run(files)
n = out.count()
k = out.select("cluster_id").distinct().count()
assert n == 200, n
assert 0 < k < n, k
print(f"SUBMIT_OK rows={n} clusters={k}")
"""


def test_spark_submit_py_files_runs_pipeline(tmp_path):
    """Full deployment smoke: package -> spark-submit --py-files -> pipeline.

    Runs from a neutral cwd so ONLY the zip provides the package, exactly as
    --py-files ships it to executors on a real cluster.
    """
    submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(submit):
        pytest.skip("spark-submit not on PATH")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = str(tmp_path / "deduplipy_spark.zip")
    subprocess.run([sys.executable, os.path.join(repo, "scripts/package.py"),
                    zip_path], check=True, capture_output=True)
    job = tmp_path / "job.py"
    job.write_text(_JOB)
    env = dict(os.environ,
               PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    r = subprocess.run(
        [submit, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path, str(job)],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    assert "SUBMIT_OK rows=200" in r.stdout, (r.stdout[-2000:],
                                              r.stderr[-2000:])
