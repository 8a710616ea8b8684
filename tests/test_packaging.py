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
