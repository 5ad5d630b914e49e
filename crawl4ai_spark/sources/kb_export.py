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
) -> None:
    """Write the crawl results as an export KB: (url, timestamp, success,
    content=raw_markdown, metadata, crawl_order=visit_order)."""
    cols = [
        F.col("url"),
        F.col("warc_ts").cast("string").alias("timestamp"),
        F.col("success"),
        F.coalesce(F.col("raw_markdown"), F.lit("")).alias("content"),
        F.col("metadata"),
        F.col("visit_order").cast("long").alias("crawl_order"),
    ]
    out = results.select(*cols)
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "jsonl":
        writer.json(path)
    elif fmt == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"unsupported export format: {fmt}")


def import_knowledge_base(
    spark: SparkSession, path: str, fmt: str = "jsonl"
) -> DataFrame:
    if fmt == "jsonl":
        return spark.read.json(path)
    if fmt == "parquet":
        return spark.read.parquet(path)
    raise ValueError(f"unsupported import format: {fmt}")
