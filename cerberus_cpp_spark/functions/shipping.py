"""Executor-side import bootstrap for pandas-UDF closures.

On a real cluster the package ships with ``spark-submit --py-files``
(north_rule) and these helpers are no-ops. In local / shared-FS
deployments the Python workers inherit neither the driver's
``sys.path`` nor its cwd, so every closure that re-imports the
package captures the package location as a plain string and restores
importability first.
"""

from __future__ import annotations

import os

PKG_PARENT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def ensure_importable(pkg_parent: str = PKG_PARENT) -> None:
    """Idempotent: make ``cerberus_cpp_spark`` importable on a worker."""
    import importlib.util
    import sys

    if importlib.util.find_spec("cerberus_cpp_spark") is None \
            and pkg_parent not in sys.path:
        sys.path.insert(0, pkg_parent)
