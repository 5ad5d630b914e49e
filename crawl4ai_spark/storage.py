"""Shared table-write shapes.

One home for the salted ``partitionBy`` write used by the IVF/LSH ANN
tables and the partitioned KB export, so a fix to the salting or write
semantics lands everywhere at once — plus the compaction maintenance op
that rewrites N append generations back to the single-write file ceiling.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_partition_write(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    salt_key: Column,
    files_per_partition: int,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``partitionBy(partition_cols)`` with the output file count
    bounded at ≤ (distinct partition values) × ``files_per_partition``.

    A raw partitionBy write opens one file per (task × partition value the
    task sees) — the classic small-files fan-out: 10k input tasks × 256
    values is millions of tiny files. The salted repartition on
    (partition cols, xxhash64(salt_key) mod files_per_partition) costs ONE
    exchange at write time; each (value, salt) slot is then written by the
    one shuffle task that owns it. The bound is a CEILING: slot hash
    collisions into one task merge files (one larger file per value that
    task sees), never multiply them. Salt on a row-id-like key so file
    sizes within a partition value stay even regardless of content.

    ``mode="append"`` grows an existing table: each append adds at most
    the same bounded file count per partition value, so N append
    generations cap at N × the per-write ceiling
    (``compact_partitioned_table`` rewrites back to the single-write
    bound when file counts matter more than append cost)."""
    out = df.repartition(
        *[F.col(c) for c in partition_cols],
        F.pmod(F.xxhash64(salt_key), F.lit(files_per_partition)),
    )
    writer = out.write.mode(mode).partitionBy(*partition_cols)
    getattr(writer, fmt)(path)


def _marker_path(path: str) -> str:
    return path.rstrip("/") + ".compact-pending"


def _count_data_files(path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if not f.startswith(("_", ".")))
    return n


# a compaction attempt's tmp/old dirs younger than this are never swept:
# the whole protocol is single-writer (see compact_partitioned_table), but
# if an operator DOES overlap two compactions of one table, the age gate
# keeps the second run from rmtree'ing the first one's live swap dirs —
# the stranded dirs of a genuine crash are simply collected by the next
# compaction that runs after the window instead
ORPHAN_SWEEP_MIN_AGE_S = 3600


def _sweep_orphan_compaction_dirs(path: str) -> None:
    """Remove sibling ``<name>.compacting-*`` / ``<name>.precompact-*``
    dirs left by crashed compactions. The tmp name is a fresh uuid per
    attempt, so a crash BEFORE the marker write (mid-copy, or a failed
    row-count verify whose rmtree didn't finish) strands a table-sized
    copy no later marker references — each crashed attempt would leak one
    forever. Called after marker recovery: at that point any surviving
    sibling with these prefixes older than ``ORPHAN_SWEEP_MIN_AGE_S`` is
    an orphan — the marker window's tmp/old were just resolved, the names
    are unique per attempt, and the age gate excludes the one thing the
    single-writer contract can't (another attempt started moments ago)."""
    import time

    base = path.rstrip("/")
    parent, name = os.path.dirname(base) or ".", os.path.basename(base)
    try:
        siblings = os.listdir(parent)
    except FileNotFoundError:
        return
    cutoff = time.time() - ORPHAN_SWEEP_MIN_AGE_S
    for entry in siblings:
        if entry.startswith((f"{name}.compacting-", f"{name}.precompact-")):
            full = os.path.join(parent, entry)
            try:
                if os.path.getmtime(full) > cutoff:
                    continue
            except OSError:
                continue
            shutil.rmtree(full, ignore_errors=True)


def _recover_compaction(path: str, marker: str) -> None:
    """Finish or roll back a compaction that crashed mid-swap. Every crash
    window leaves a state this can resolve without data loss, because the
    marker is written only AFTER the compacted copy (data + sidecars) is
    complete on disk:

    - table at ``path``, old copy gone → the swap either never started or
      fully finished: discard the (complete but unpromoted) compacted tmp
      dir and the marker; the caller's compaction re-runs from scratch.
    - ``path`` missing, old copy present → crashed between the two
      renames: promote the compacted tmp if it exists, else restore the
      old copy. Either way the table reappears with all rows.
    - table at ``path`` AND old copy present → crashed after the promote,
      before cleanup: delete the old copy.
    """
    with open(marker) as f:
        st = json.load(f)
    tmp, old = st["tmp"], st["old"]
    if os.path.exists(path):
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
    elif os.path.exists(tmp):
        os.rename(tmp, path)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)
    elif os.path.exists(old):
        os.rename(old, path)
    else:
        raise RuntimeError(
            f"compaction marker {marker} names no surviving table state "
            f"(path={path}, tmp={tmp}, old={old}) — manual inspection "
            "required"
        )
    os.remove(marker)


def compact_partitioned_table(
    spark,
    path: str,
    partition_cols: list[str],
    salt_key: Column | str,
    files_per_partition: int,
    fmt: str = "parquet",
    verify_count: bool = True,
) -> dict:
    """Rewrite a partitioned table back to the single-write file ceiling —
    the maintenance op ``salted_partition_write(mode="append")`` points at:
    N append generations accumulate N × files_per_partition files per
    value, and at some point the per-file open cost on every probe
    outweighs the one-off rewrite. One full scan + the same salted
    exchange as a fresh write; sidecar metadata files at the table root
    (``_ivf_centroids.json``, ``_lsh_planes.json`` — anything
    underscore-prefixed, which parquet readers already skip) are carried
    over, so probes and appends keep working against the compacted table.

    Crash safety (single-writer, no concurrent readers — this is an
    offline maintenance op, exactly like Iceberg's rewrite_data_files
    wants snapshot isolation): the compacted copy is fully written to a
    sibling tmp dir FIRST, then a marker records the swap, then
    rename(path→old), rename(tmp→path), cleanup, marker removed. A crash
    inside the marker window leaves a marker a later call auto-recovers
    from (see ``_recover_compaction``); a crash BEFORE the marker (mid
    copy or failed verify) leaves only an unreferenced uuid-named tmp
    dir, which a later call sweeps once it is older than
    ``ORPHAN_SWEEP_MIN_AGE_S`` (``_sweep_orphan_compaction_dirs`` — the
    age gate keeps an operator-error overlapping run from deleting a
    live swap's dirs) instead of leaking one table-sized copy per
    crashed attempt. Both
    generations are on disk until the moment the promote rename lands,
    so no window loses rows.

    ``verify_count=True`` pays one extra count job to assert the rewrite
    preserved the row count before the swap — the honest price on an
    explicit maintenance call (a silent row loss here corrupts every
    later probe). Returns {rows, files_before, files_after}."""
    marker = _marker_path(path)
    if os.path.exists(marker):
        _recover_compaction(path, marker)
    _sweep_orphan_compaction_dirs(path)
    hexid = uuid.uuid4().hex
    tmp = path.rstrip("/") + f".compacting-{hexid}"
    old = path.rstrip("/") + f".precompact-{hexid}"
    files_before = _count_data_files(path)
    df = spark.read.format(fmt).load(path)
    n_before = df.count() if verify_count else -1
    key = F.col(salt_key) if isinstance(salt_key, str) else salt_key
    salted_partition_write(
        df, tmp, partition_cols, key, files_per_partition, fmt=fmt
    )
    if verify_count:
        n_after = spark.read.format(fmt).load(tmp).count()
        if n_after != n_before:
            shutil.rmtree(tmp, ignore_errors=True)
            raise RuntimeError(
                f"compaction of {path} would change the row count "
                f"({n_before} → {n_after}); original left untouched"
            )
    # carry sidecars BEFORE the marker: once the marker exists, the tmp
    # dir must be a complete drop-in replacement
    for name in os.listdir(path):
        src = os.path.join(path, name)
        if name.startswith("_") and os.path.isfile(src):
            dst = os.path.join(tmp, name)
            if not os.path.exists(dst):
                shutil.copy2(src, dst)
    with open(marker, "w") as f:
        json.dump({"tmp": tmp, "old": old}, f)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    os.remove(marker)
    spark.catalog.refreshByPath(path)
    return {
        "rows": n_before,
        "files_before": files_before,
        "files_after": _count_data_files(path),
    }
