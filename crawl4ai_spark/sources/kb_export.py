"""Knowledge-base export/import sink (SURVEY.md §2.1 S12).

Spark restatement of the reference's knowledge-base export (behavioral
spec: /root/reference/crawl4ai/adaptive_crawler.py:1719-1815 — one JSON
document per crawl result with url/timestamp/success/content/metadata and
crawl-order metadata). The distributed analog of its single jsonl file is
a directory of part files, one JSON document per line, written in parallel
(`df.write.json`); parquet is the columnar option for downstream training
pipelines. Round-trips through ``import_knowledge_base``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EXPORT_COLUMNS = (
    "url", "timestamp", "success", "content", "metadata", "crawl_order",
)


def export_knowledge_base(
    results: DataFrame,
    path: str,
    fmt: str = "jsonl",
    partition_by: list[str] | None = None,
    files_per_partition: int = 4,
) -> None:
    """Write the crawl results as an export KB: (url, timestamp, success,
    content=raw_markdown, metadata, crawl_order=visit_order).

    With ``partition_by``, rows are repartitioned on (partition cols,
    xxhash64(url) mod ``files_per_partition``) before the write: a raw
    partitionBy write opens one file per (task × partition value it sees)
    — the classic small-files fan-out at cluster scale — while the salted
    exchange caps output at values × files_per_partition evenly sized
    files (same pattern as ``write_ivf_table``)."""
    cols = [
        F.col("url"),
        F.col("warc_ts").cast("string").alias("timestamp"),
        F.col("success"),
        F.coalesce(F.col("raw_markdown"), F.lit("")).alias("content"),
        F.col("metadata"),
        F.col("visit_order").cast("long").alias("crawl_order"),
    ]
    out = results.select(*cols)
    if fmt not in ("jsonl", "parquet"):
        raise ValueError(f"unsupported export format: {fmt}")
    if partition_by:
        from crawl4ai_spark.storage import salted_partition_write

        salted_partition_write(
            out, path, partition_by, F.col("url"), files_per_partition,
            fmt="json" if fmt == "jsonl" else fmt,
        )
        return
    writer = out.write.mode("overwrite")
    if fmt == "jsonl":
        writer.json(path)
    else:
        writer.parquet(path)


def import_knowledge_base(
    spark: SparkSession, path: str, fmt: str = "jsonl"
) -> DataFrame:
    if fmt == "jsonl":
        return spark.read.json(path)
    if fmt == "parquet":
        return spark.read.parquet(path)
    raise ValueError(f"unsupported import format: {fmt}")
