"""Runtime plumbing shared by entry points."""

from __future__ import annotations

import os
import tempfile
import zipfile

_ADDED: set[int] = set()


def ensure_workers_importable(spark) -> None:
    """Ship the capelinker_spark package to Python workers via addPyFile.

    The driver process may import this package from a cwd-relative path;
    executors' Python workers unpickle pandas UDFs and need the module on
    THEIR sys.path regardless of the launch directory — the
    ``spark-submit --py-files`` behaviour, established at runtime."""
    sc = spark.sparkContext
    if id(sc) in _ADDED:
        return
    import capelinker_spark

    pkg_dir = os.path.dirname(os.path.abspath(capelinker_spark.__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"capelinker_spark_pyfiles_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for root, _, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
        os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    _ADDED.add(id(sc))
