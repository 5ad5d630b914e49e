"""M1 — the extraction job: pages → scrape → markdown/fit columns.

This is the Spark restatement of the reference's ``aprocess_html``
(behavioral spec: /root/reference/crawl4ai/async_webcrawler.py:433-648):
scrape → fit_html preprocess → markdown (raw / citations / references / fit)
as ONE select over Arrow pandas UDFs. Each UDF call receives a whole Arrow
batch of pages (spark.sql.execution.arrow.maxRecordsPerBatch), so Python
overhead amortizes across pages; all orchestration stays in Catalyst.

Scale notes: the UDFs are CPU-bound and embarrassingly parallel — they scale
linearly with cores and need no shuffle. The only shuffle in the whole
extraction job is whatever partitioning the caller chose upstream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.html.markdown import html_to_markdown, links_to_citations
from crawl4ai_spark.html.pruning import prune_fit_html
from crawl4ai_spark.html.scrape import scrape_page
from crawl4ai_spark.schema import MARKDOWN_RESULT_STRUCT, SCRAPE_RESULT_STRUCT


@F.pandas_udf(SCRAPE_RESULT_STRUCT)
def scrape_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    """html may be binary (bytes) or string."""
    rows = []
    for h, u in zip(html, url):
        if h is None:
            rows.append(
                {
                    "cleaned_html": None, "text": None, "links": [], "media": [],
                    "tables": [], "metadata": {}, "lang": None, "success": False,
                }
            )
            continue
        if isinstance(h, (bytes, bytearray)):
            h = bytes(h).decode("utf-8", errors="replace")
        rows.append(scrape_page(h, u or ""))
    return pd.DataFrame(rows)


@F.pandas_udf(MARKDOWN_RESULT_STRUCT)
def markdown_udf(cleaned_html: pd.Series, url: pd.Series) -> pd.DataFrame:
    rows = []
    for h, u in zip(cleaned_html, url):
        if h is None:
            rows.append(
                {
                    "raw_markdown": None, "markdown_with_citations": None,
                    "references_markdown": None, "fit_markdown": None,
                    "fit_html": None,
                }
            )
            continue
        raw = html_to_markdown(h)
        cited, refs = links_to_citations(raw, u or "")
        _, fit_html = prune_fit_html(h)
        fit_md = html_to_markdown(fit_html)
        rows.append(
            {
                "raw_markdown": raw,
                "markdown_with_citations": cited,
                "references_markdown": refs,
                "fit_markdown": fit_md,
                "fit_html": fit_html,
            }
        )
    return pd.DataFrame(rows)


def extract_pages(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """pages(url, html, ...) → + scrape struct + markdown struct columns.

    Output columns: everything in ``pages`` plus
    ``scrape:  struct<cleaned_html,text,links,media,tables,metadata,lang,success>``
    ``markdown: struct<raw_markdown,markdown_with_citations,references_markdown,fit_markdown,fit_html>``
    """
    out = pages.withColumn("scrape", scrape_udf(F.col(html_col), F.col(url_col)))
    return out.withColumn(
        "markdown", markdown_udf(F.col("scrape.cleaned_html"), F.col(url_col))
    )
