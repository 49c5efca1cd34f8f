"""Self-shipping: make the package importable on executors regardless of how
the SparkSession was created.

Pandas-UDF closures reference module-level kernels by name, so executor
Python workers must be able to import ``duckdb_vss_spark``. On a real
cluster this is normally handled by ``--py-files``/pip; ``ensure_shipped``
makes it automatic (and harmless when the package is already importable):
it zips the package once and registers it with ``SparkContext.addPyFile``.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_shipped: set[int] = set()


def package_zip() -> str:
    pkgdir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(), "duckdb_vss_spark_pkg.zip")
    if not os.path.exists(zpath) or os.path.getmtime(zpath) < max(
        os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(pkgdir)
        for f in fs
        if f.endswith(".py")
    ):
        tmp = zpath + f".{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for root, _, files in os.walk(pkgdir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, os.path.dirname(pkgdir)))
        os.replace(tmp, zpath)
    return zpath


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _shipped:
        return
    sc.addPyFile(package_zip())
    _shipped.add(key)
