"""S6 file:// + raw: page sources feeding the standard extract pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.plans.extract import extract_pages
from crawl4ai_spark.sources.files import pages_from_files, pages_from_raw


def test_pages_from_files_roundtrip(spark, tmp_path):
    for i in range(4):
        (tmp_path / f"p{i}.html").write_text(
            f"<html lang='en'><body><h1>File {i}</h1><p>file corpus {i}</p></body></html>"
        )
    pages = pages_from_files(spark, str(tmp_path / "*.html"))
    assert pages.count() == 4
    assert set(pages.columns) == {"url", "warc_ts", "html", "text", "lang"}
    rows = {r.url for r in pages.select("url").collect()}
    assert all(u.startswith("file://") and u.endswith(".html") for u in rows)
    out = extract_pages(pages)
    got = out.select("url", "markdown.raw_markdown").collect()
    assert all("# File" in r.raw_markdown for r in got)


def test_pages_from_raw(spark):
    pages = pages_from_raw(
        spark,
        [("https://x.example/a", "<body><h2>Named</h2></body>"),
         (None, "<body><p>anonymous doc</p></body>")],
    )
    assert pages.count() == 2
    urls = sorted(r.url for r in pages.select("url").collect())
    assert urls == ["https://x.example/a", "raw://1"]
    md = extract_pages(pages).select(
        F.col("markdown.raw_markdown").alias("md")
    ).collect()
    assert any("## Named" in r.md for r in md)
    assert any("anonymous doc" in r.md for r in md)
