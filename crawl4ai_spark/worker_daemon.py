"""Pre-warmed Python worker daemon (``spark.python.daemon.module``).

PySpark's Unix worker model forks task workers from a long-lived daemon
process. By default each forked worker pays the heavy imports (pandas,
pyarrow, numpy, and this package's HTML engine) on its FIRST Arrow batch —
with 32-64 workers spawning for the first UDF stage, that import storm is
the bulk of a cold extract job's wall time. Importing the hot modules HERE,
before ``pyspark.daemon.manager()`` starts forking, makes every forked
worker inherit them already-initialized via copy-on-write: a fork costs
~1 ms instead of ~0.5 s of imports.

Every import is best-effort: if the package zip isn't on the daemon's
PYTHONPATH (it is shipped per-task via addPyFile and only guaranteed
inside the worker loop), the worker still imports lazily as before —
correctness never depends on the preload. ``session.get_spark`` exports
the package root on PYTHONPATH before the JVM launches so the preload
normally succeeds in both driver-local and spark-submit deployments.
"""

from __future__ import annotations


def _preload() -> None:
    import importlib

    for mod in (
        "numpy",
        "pandas",
        "pyarrow",
        "pyspark.sql.pandas.serializers",
        "crawl4ai_spark.html.parser",
        "crawl4ai_spark.html.scrape",
        "crawl4ai_spark.html.markdown",
        "crawl4ai_spark.html.pruning",
        "crawl4ai_spark.plans.extract",
        "crawl4ai_spark.functions.urlnorm",
    ):
        try:
            importlib.import_module(mod)
        except Exception:
            pass  # worker falls back to lazy import — preload is best-effort


if __name__ == "__main__":
    _preload()
    from pyspark.daemon import manager

    manager()
