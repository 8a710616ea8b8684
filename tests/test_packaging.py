"""--py-files archive: build it, import the engine from it in a
clean interpreter (no repo on sys.path), validate a document."""

from __future__ import annotations

import subprocess
import sys
import zipfile

from cerberus_cpp_spark.packaging import build_archive

CHECK = r"""
import sys
sys.path.insert(0, sys.argv[1])  # the zip, like --py-files does
banned = [p for p in list(sys.path) if p.rstrip('/').endswith('repo')]
for p in banned:
    sys.path.remove(p)
from cerberus_cpp_spark import Validator
v = Validator({"w": {"type": "integer", "min": 0}})
assert v.validate({"w": 5}) is True
assert v.validate({"w": 0}) is False
print("zip-import-ok")
"""


def test_archive_builds_and_imports(tmp_path) -> None:
    out = build_archive(str(tmp_path / "pkg.zip"))
    names = zipfile.ZipFile(out).namelist()
    assert "cerberus_cpp_spark/plans/engine.py" in names
    assert not any("__pycache__" in n for n in names)
    proc = subprocess.run(
        [sys.executable, "-c", CHECK, out],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    assert "zip-import-ok" in proc.stdout


JOB = r'''
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# the repo must NOT be importable except through --py-files
banned = [p for p in list(sys.path) if p.rstrip("/").endswith("repo")]
for p in banned:
    sys.path.remove(p)

from cerberus_cpp_spark import Validator
from cerberus_cpp_spark.plans.engine import TableValidator

RULES = {"w": {"type": "integer", "min": 5, "max": 90}}

spark = SparkSession.builder.getOrCreate()
df = spark.range(0, 100_000, 1, 8).select(
    F.col("id"), (F.col("id") % 100).cast("int").alias("w"))
got = (TableValidator(RULES, allow_unknown=True)
       .validate(df).violations("id").count())

# differential twin: the interpreter decides the expected count
v = Validator(RULES)
expected = sum(
    1000 for w in range(100) if not v.validate({"w": w})
)
print(json.dumps({"got": got, "expected": expected}))
spark.stop()
'''


def test_spark_submit_py_files_end_to_end(tmp_path) -> None:
    """The north_rule deployment sentence, literally: the job ships
    through ``spark-submit --py-files pkg.zip`` onto a MULTI-JVM
    master (local-cluster: separate executor JVMs that inherit
    nothing from the driver's sys.path), with the repo directory
    removed from the driver's path — the zip is the only way the
    engine can reach either side. The distributed verdict count must
    match the interpreter twin's prediction computed inside the same
    job."""
    import json
    import os

    out = build_archive(str(tmp_path / "pkg.zip"))
    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            "/opt/spark/bin/spark-submit",
            "--master", "local-cluster[2,1,1024]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", out,
            str(job),
        ],
        capture_output=True, text=True, cwd=str(tmp_path),
        timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("{")][-1]
    res = json.loads(line)
    assert res["got"] == res["expected"] > 0, res
