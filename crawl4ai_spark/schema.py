"""Table schemas for the crawl engine.

Mirrors the reference's record types (see SURVEY.md §1; reference
crawl4ai/models.py:129-158 CrawlResult, models.py:15-19 DomainState,
deep_crawling/bfs_strategy.py:154-156 frontier) restated as columnar
StructTypes. The ``pages`` shape is fixed by the input hint:
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
"""

from __future__ import annotations

from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

# Frontier: URLs waiting to be crawled (reference: current_level /
# PriorityQueue tuples (score, depth, url, parent) — bff_strategy.py:141-145).
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("url_norm", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("parent_url", T.StringType()),
        T.StructField("discovered_iter", T.IntegerType()),
    ]
)

# URL-seen set (reference: visited:Set[str], bfs_strategy.py:152).
SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_norm", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("first_iter", T.IntegerType()),
    ]
)

# Link record (reference: models.py:343-353 Link), exploded edge form.
LINK_STRUCT = T.StructType(
    [
        T.StructField("href", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("base_domain", T.StringType()),
        T.StructField("is_external", T.BooleanType()),
        T.StructField("intrinsic_score", T.DoubleType()),
    ]
)

MEDIA_STRUCT = T.StructType(
    [
        T.StructField("src", T.StringType()),
        T.StructField("alt", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("score", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

TABLE_STRUCT = T.StructType(
    [
        T.StructField("headers", T.ArrayType(T.StringType())),
        T.StructField("rows", T.ArrayType(T.ArrayType(T.StringType()))),
        T.StructField("caption", T.StringType()),
    ]
)

# Output of the scrape pandas UDF (reference: ScrapingResult, models.py:372-377).
SCRAPE_RESULT_STRUCT = T.StructType(
    [
        T.StructField("cleaned_html", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("links", T.ArrayType(LINK_STRUCT)),
        T.StructField("media", T.ArrayType(MEDIA_STRUCT)),
        T.StructField("tables", T.ArrayType(TABLE_STRUCT)),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("lang", T.StringType()),
        T.StructField("success", T.BooleanType()),
    ]
)

# Output of the markdown pandas UDF (reference: MarkdownGenerationResult,
# models.py:119-127).
MARKDOWN_RESULT_STRUCT = T.StructType(
    [
        T.StructField("raw_markdown", T.StringType()),
        T.StructField("markdown_with_citations", T.StringType()),
        T.StructField("references_markdown", T.StringType()),
        T.StructField("fit_markdown", T.StringType()),
        T.StructField("fit_html", T.StringType()),
    ]
)

# Fused scrape+markdown output — ONE Arrow round trip per page. Chaining
# two dependent pandas UDFs costs ~3× the sum of the stages (the scrape
# struct is re-serialized JVM↔Python and each task runs two workers), so
# the hot path uses this flat struct and re-nests JVM-side.
EXTRACT_RESULT_STRUCT = T.StructType(
    list(SCRAPE_RESULT_STRUCT.fields) + list(MARKDOWN_RESULT_STRUCT.fields)
)

# Per-iteration, per-partition lineage (reference bookkeeping:
# CrawlerTaskResult/CrawlStats, models.py:22-57). Two row kinds per
# iteration: stage='fetch' (urls_in/fetched/robots_blocked per extraction
# partition — the hot-host skew evidence) and stage='discover' (emitted
# per dedup-output partition).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("iteration", T.IntegerType()),
        T.StructField("stage", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("urls_in", T.LongType()),
        T.StructField("fetched", T.LongType()),
        T.StructField("robots_blocked", T.LongType()),
        T.StructField("emitted", T.LongType()),
        T.StructField("t_start", T.DoubleType()),
        T.StructField("t_end", T.DoubleType()),
    ]
)

# Per-host politeness state (reference: DomainState, models.py:15-19).
HOST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("current_delay", T.DoubleType()),
        T.StructField("fail_count", T.IntegerType()),
        T.StructField("last_iter", T.IntegerType()),
    ]
)

# robots.txt rules per host (reference: SQLite robots_cache, utils.py:263-275).
ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("rules", T.StringType()),
        T.StructField("fetch_time", T.TimestampType()),
    ]
)
