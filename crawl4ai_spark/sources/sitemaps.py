"""Sitemap seed source (SURVEY.md §2.1 S3).

Spark restatement of the reference seeder's sitemap path (behavioral spec:
/root/reference/crawl4ai/async_url_seeder.py:765-958 — probe the index,
expand child sitemaps, yield pattern-matching URLs): here the fetched
sitemap XML lives in a table (like the pages table stands in for the web),
the index→child expansion is an equi-join, and <loc> extraction is pure
Catalyst ``regexp_extract_all``.

The synthetic sitemap corpus is a dual-dialect SQL template (same pattern
as sources/synthetic.py) so the seed queries keep exact DuckDB oracles:
each host serves a sitemap_index referencing one child urlset that lists
the pages with doc_id ≡ host (mod 20) stride-20, five entries per host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.functions.urls import host_col
from crawl4ai_spark.operators.filters import url_pattern_filter
from crawl4ai_spark.sources.synthetic import N_HOSTS, _cast_str, _url

_LOC_RE = r"<loc>([^<]+)</loc>"
URLS_PER_SITEMAP = 5


def sitemaps_sql(dialect: str, ntot_sql: str | None = None) -> str:
    """SQL producing (host, kind∈index|urlset, loc, xml) for all hosts."""
    ntot = ntot_sql or "(SELECT count(*) FROM documents)"
    s = lambda e: _cast_str(e, dialect)  # noqa: E731
    entry = (
        f"'<url><loc>' || {_url(f'(h + 20 * j) % {ntot}', dialect)} || '</loc></url>'"
    )
    if dialect == "spark":
        hosts = f"SELECT explode(sequence(0, {N_HOSTS - 1})) AS h"
        js = f"SELECT explode(sequence(0, {URLS_PER_SITEMAP - 1})) AS j"
        # deterministic entry order: sort the (j, e) structs, then fold
        body = f"""entries AS (
  SELECT h, aggregate(sort_array(collect_list(struct(j, e))), '',
                      (a, x) -> a || x.e) AS urlxml
  FROM (SELECT h, j, {entry} AS e
        FROM ({hosts}) CROSS JOIN ({js}))
  GROUP BY h
)"""
    else:
        hosts = f"SELECT unnest(range(0, {N_HOSTS})) AS h"
        js = f"SELECT unnest(range(0, {URLS_PER_SITEMAP})) AS j"
        body = f"""entries AS (
  SELECT h, string_agg(e, '' ORDER BY j) AS urlxml
  FROM (SELECT h, j, {entry} AS e
        FROM ({hosts}), ({js}))
  GROUP BY h
)"""
    sm_host = f"('host' || {s('h')} || '.example')"
    return f"""
WITH {body.strip()}
SELECT {sm_host} AS host, 'index' AS kind,
       ('https://' || {sm_host} || '/sitemap_index.xml') AS loc,
       ('<sitemapindex><sitemap><loc>https://' || {sm_host}
        || '/sitemap_pages.xml</loc></sitemap></sitemapindex>') AS xml
FROM entries
UNION ALL
SELECT {sm_host} AS host, 'urlset' AS kind,
       ('https://' || {sm_host} || '/sitemap_pages.xml') AS loc,
       ('<urlset>' || urlxml || '</urlset>') AS xml
FROM entries
""".strip()


def build_sitemaps(spark: SparkSession, ntot: int) -> DataFrame:
    return spark.sql(sitemaps_sql("spark", ntot_sql=str(ntot)))


def seed_from_sitemaps(
    sitemaps: DataFrame, pattern: str | None = None
) -> DataFrame:
    """index → child-urlset expansion (equi-join on the child loc) →
    <loc> explode → optional glob filter → dedup. Returns
    (url, host, provenance='sitemap').

    Scale: the index side is tiny (one row per host) and broadcasts; the
    <loc> extraction is Catalyst regexp over the urlset partitions."""
    idx = sitemaps.filter(F.col("kind") == "index").select(
        F.explode(
            F.regexp_extract_all(F.col("xml"), F.lit(_LOC_RE), F.lit(1))
        ).alias("child_loc")
    )
    children = sitemaps.filter(F.col("kind") == "urlset")
    expanded = children.join(
        F.broadcast(idx), children["loc"] == idx["child_loc"], "left_semi"
    )
    urls = expanded.select(
        F.explode(
            F.regexp_extract_all(F.col("xml"), F.lit(_LOC_RE), F.lit(1))
        ).alias("url")
    )
    if pattern:
        urls = urls.filter(url_pattern_filter(F.col("url"), [pattern]))
    return urls.dropDuplicates(["url"]).select(
        "url",
        host_col(F.col("url")).alias("host"),
        F.lit("sitemap").alias("provenance"),
    )
