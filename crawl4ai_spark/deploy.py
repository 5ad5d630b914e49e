"""Packaging for Spark workers — the local-mode equivalent of
``spark-submit --py-files`` (north rule deployment requirement).

Pandas UDFs defined at module level are pickled by reference, so executor
Python workers must be able to ``import crawl4ai_spark`` themselves. On a
real cluster this is a --py-files zip; here we build that same zip and ship
it through ``SparkContext.addPyFile``, which works even for an
already-running session (the round driver constructs the SparkSession
before importing us).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED: set[int] = set()


def package_zip() -> str:
    """Zip the crawl4ai_spark package (cached per process)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "crawl4ai_spark_pyfiles.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "crawl4ai_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    return out


def ensure_workers_can_import(spark) -> None:
    """Ship the package zip to executors once per SparkContext."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    sc.addPyFile(package_zip())
    _SHIPPED.add(key)
