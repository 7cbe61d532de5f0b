"""Make the package importable inside executor Python workers.

UDF/mapInPandas closures that reference module-level functions are
cloudpickled *by reference*, so every Python worker must be able to
``import wagtail_vector_index_spark``. That holds only when the driver's
cwd (or PYTHONPATH) happens to contain the repo — not guaranteed for an
arbitrary harness, and never true on a real cluster. ``addPyFile`` ships a
zip of the package to every worker and prepends it to their sys.path —
the canonical mechanism, valid in local and cluster mode alike.

Every operator that creates a Python UDF stage calls
:func:`ensure_worker_imports` first; it is idempotent per SparkContext.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession

_shipped: set[int] = set()


def _package_zip() -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"wvi_spark_pkg_{os.getuid()}_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for dirpath, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if fname.endswith(".py"):
                        full = os.path.join(dirpath, fname)
                        z.write(full, os.path.relpath(full, repo_root))
        os.replace(tmp, zpath)
    return zpath


def ensure_worker_imports(handle: SparkSession | DataFrame) -> None:
    spark = handle.sparkSession if isinstance(handle, DataFrame) else handle
    sc = spark.sparkContext
    key = id(sc)
    if key in _shipped:
        return
    sc.addPyFile(_package_zip())
    _shipped.add(key)
