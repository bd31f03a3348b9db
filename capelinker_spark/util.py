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
    zpath = os.path.join(
        tempfile.gettempdir(), f"capelinker_spark_pyfiles_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        build_pyfiles_zip(zpath)
    sc.addPyFile(zpath)
    _ADDED.add(id(sc))


def build_pyfiles_zip(zpath: str) -> str:
    """Package capelinker_spark into a ``--py-files`` zip. Ships .py AND .c:
    workers compile the native string-distance kernel locally
    (functions/_native.py); without the source in the zip a real cluster
    would silently fall back to the 25x-slower Python kernel."""
    import capelinker_spark

    pkg_dir = os.path.dirname(os.path.abspath(capelinker_spark.__file__))
    tmp = zpath + f".tmp{os.getpid()}"
    with zipfile.ZipFile(tmp, "w") as z:
        for root, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith((".py", ".c")):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    os.replace(tmp, zpath)
    return zpath
