"""file:// and raw: page sources (SURVEY.md §2.1 S6).

The reference accepts ``file://`` paths and ``raw:`` inline HTML wherever
it accepts a URL (async_webcrawler.py arun dispatch). The Spark
restatements produce the same pages schema as the CC-style corpus
(url, warc_ts, html:binary, text, lang), so everything downstream —
extraction, crawling as a link source, the datapipe — runs unchanged:

- ``pages_from_files``: ``spark.read.format("binaryFile")`` over a glob;
  one row per file, url = file://<path>, warc_ts = the file's modification
  time. A real distributed scan — the driver never touches file bytes.
- ``pages_from_raw``: small literal corpus from (url|None, html) pairs —
  unnamed entries get raw:<n> urls like the reference's raw scheme.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def pages_from_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed file:// source: (url, warc_ts, html, text, lang) from
    every file matching the glob (e.g. '/data/pages/*.html')."""
    raw = spark.read.format("binaryFile").load(path_glob)
    return raw.select(
        F.concat(F.lit("file://"), F.regexp_replace("path", "^file:", "")).alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def pages_from_raw(
    spark: SparkSession, docs: list[tuple[str | None, str]]
) -> DataFrame:
    """raw: source — literal (url, html) pairs as a pages DataFrame."""
    rows = [
        (url or f"raw://{i}", html.encode("utf-8"))
        for i, (url, html) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    return df.select(
        "url",
        F.lit("1970-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
