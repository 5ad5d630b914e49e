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
    """Zip the crawl4ai_spark package — DETERMINISTIC bytes (fixed entry
    timestamps, sorted names) so Spark's add-file content check never sees
    a "same path, different contents" conflict across rebuilds."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_dir):
        # already running FROM a shipped archive (spark-submit --py-files
        # zipimport): the containing zip IS the package artifact. Walking
        # a zipimport pseudo-path yields no files, so rebuilding here
        # would silently clobber the artifact with an EMPTY zip — and the
        # worker daemon's PYTHONPATH import would die with it.
        probe = pkg_dir
        while probe and probe != os.path.dirname(probe):
            if os.path.isfile(probe):
                if zipfile.is_zipfile(probe):
                    return probe
                break
            probe = os.path.dirname(probe)
        raise RuntimeError(
            f"crawl4ai_spark imported from {pkg_dir}, which is neither a "
            "directory nor inside a zip archive — cannot package"
        )
    out = os.path.join(tempfile.gettempdir(), "crawl4ai_spark_pyfiles.zip")
    entries: list[tuple[str, str]] = []
    for root, _dirs, files in os.walk(pkg_dir):
        if "__pycache__" in root:
            continue
        for f in files:
            if not f.endswith(".py"):
                continue
            full = os.path.join(root, f)
            rel = os.path.join("crawl4ai_spark", os.path.relpath(full, pkg_dir))
            entries.append((rel, full))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for rel, full in sorted(entries):
            info = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                zf.writestr(info, fh.read())
    return out


def ensure_workers_can_import(spark) -> None:
    """Ship the package zip to executors once per SparkContext. When the
    session was launched via ``spark-submit --py-files`` the zip is already
    registered — but only skip the re-add when the registered file's BYTES
    match this checkout's build (name match alone would silently leave
    stale code on executors). The zip bytes are deterministic, so a re-add
    of identical content is a no-op and a genuine conflict surfaces as
    Spark's changed-file error instead of skewed results."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    local = package_zip()
    skip = False
    try:
        import hashlib

        def _digest(path: str) -> str:
            with open(path, "rb") as fh:
                return hashlib.sha256(fh.read()).hexdigest()

        want = _digest(local)
        for f in sc.listFiles:
            if "crawl4ai_spark_pyfiles.zip" not in f:
                continue
            reg = f[len("file:"):] if f.startswith("file:") else f
            if os.path.exists(reg) and _digest(reg) == want:
                skip = True
            break
    except Exception:
        skip = False
    if not skip:
        sc.addPyFile(local)
    _SHIPPED.add(key)
