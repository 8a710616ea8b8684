"""Package the engine for ``spark-submit --py-files`` (north_rule:
"ships via spark-submit --py-files to run identically at N and 4N
executors").

Usage::

    python -m cerberus_cpp_spark.packaging [out.zip]
    spark-submit --py-files out.zip your_job.py

The archive contains the pure-Python package only (no tests, no
caches); executors then import ``cerberus_cpp_spark`` without any
shared filesystem (the ``functions.shipping`` bootstrap becomes a
no-op).
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG_ROOT = os.path.dirname(os.path.abspath(__file__))


def build_archive(out_path: str = "cerberus_cpp_spark.zip") -> str:
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(PKG_ROOT):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join(
                    "cerberus_cpp_spark",
                    os.path.relpath(full, PKG_ROOT),
                )
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "cerberus_cpp_spark.zip"
    print(build_archive(out))
