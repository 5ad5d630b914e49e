"""Shared table-write shapes.

One home for the salted ``partitionBy`` write used by the IVF/LSH ANN
tables and the partitioned KB export, so a fix to the salting or write
semantics lands everywhere at once.
"""

from __future__ import annotations

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
    generations cap at N × the per-write ceiling (compact when file
    counts matter more than append cost)."""
    out = df.repartition(
        *[F.col(c) for c in partition_cols],
        F.pmod(F.xxhash64(salt_key), F.lit(files_per_partition)),
    )
    writer = out.write.mode(mode).partitionBy(*partition_cols)
    getattr(writer, fmt)(path)
