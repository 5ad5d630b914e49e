"""Deterministic synthetic Common-Crawl-style page corpus.

The input hint fixes the pages shape:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
The sandbox has no network, so "the web" is this table; fetching is an
equi-join against it (SURVEY.md §2.4 J6). Pages are derived 1:1 from the
driver-provided ``documents`` parquet so tests/bench never synthesize data
outside the provided inputs.

The generation is written ONCE as a dual-dialect SQL template so the exact
same corpus can be rebuilt inside DuckDB oracle SQL (``pages_sql('duckdb')``)
— this is what lets crawl-operator queries have value-hash-exact oracles.

Corpus properties (all pure functions of ``doc_id``):
- hosts: ``host{0..19}.example`` with deliberate skew — ids with
  ``doc_id % 5 < 2`` land on host0 (~40% of the corpus), the hot-host
  stressor for salted politeness windows (SURVEY.md §2.7 P6).
- link graph: each page links to ``(2i+1) % N``, ``(2i+2) % N``, a cross
  link ``(7i+3) % N``, a tracking-param+fragment DUPLICATE of child one
  (``?utm_source=x&fbclid=y#frag`` — both normalizers must collapse it),
  plus one external link. Cycle-rich, so the URL-seen set does real work.
- robots: hosts with ``host_id % 4 == 0`` disallow the path prefix
  ``/p/1`` (prefix semantics: blocks every id whose decimal form starts
  with "1"); ``host7.example`` disallows everything. Everything else allows.
- ``warc_ts`` = 2025-07-01T00:00:00Z + 17s * doc_id (unique rank tiebreaker).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_HOSTS = 20
FULLY_BLOCKED_HOST = 7


def _cast_str(expr: str, dialect: str) -> str:
    t = "STRING" if dialect == "spark" else "VARCHAR"
    return f"CAST({expr} AS {t})"


def _host_id(expr: str) -> str:
    return f"(CASE WHEN ({expr}) % 5 < 2 THEN 0 ELSE ({expr}) % {N_HOSTS} END)"


def _host(expr: str, dialect: str) -> str:
    return f"('host' || {_cast_str(_host_id(expr), dialect)} || '.example')"


def _url(expr: str, dialect: str) -> str:
    return f"('https://' || {_host(expr, dialect)} || '/p/' || {_cast_str(expr, dialect)})"


def _warc_ts(dialect: str) -> str:
    if dialect == "spark":
        return (
            "timestamp'2025-07-01 00:00:00' + "
            "make_interval(0, 0, 0, 0, 0, 0, doc_id * 17)"
        )
    return "TIMESTAMP '2025-07-01 00:00:00' + doc_id * INTERVAL 17 SECOND"


def _html_expr(dialect: str) -> str:
    s = lambda e: _cast_str(e, dialect)  # noqa: E731
    url = lambda e: _url(e, dialect)  # noqa: E731
    return (
        "('<html lang=\"' || lang || '\"><head>"
        "<title>Doc ' || " + s("doc_id") + " || ' - ' || source || '</title>"
        '<meta name="description" content="synthetic page \' || '
        + s("doc_id")
        + " || '\">"
        '<meta name="keywords" content="k\' || '
        + s("doc_id % 7")
        + " || ', crawl, spark\">"
        "</head><body>"
        '<nav class="nav"><a href="/">home</a> <a href="/about">about</a></nav>'
        "<article><h1>Heading ' || " + s("doc_id") + " || '</h1>"
        "<p>' || text || '</p>"
        "<pre><code>code block ' || " + s("doc_id") + " || '</code></pre>"
        "<table><thead><tr><th>a</th><th>b</th></tr></thead>"
        "<tbody><tr><td>1</td><td>' || " + s("doc_id % 100") + " || '</td></tr></tbody></table>"
        '<img src="/img\' || ' + s("doc_id") + ' || \'.png" alt="alt \' || '
        + s("doc_id")
        + " || '\" width=\"300\" height=\"200\">"
        "<a href=\"' || " + url("c1") + " || '\">child one</a> "
        "<a href=\"' || " + url("c2") + " || '\">child two</a> "
        "<a href=\"' || " + url("cx") + " || '\">cross link</a> "
        # tracking-param + fragment duplicate of child one: both normalizers
        # must collapse it onto the clean link (seen-set dedup exerciser)
        "<a href=\"' || " + url("c1") + " || '?utm_source=x&fbclid=y#frag\">tracking dup</a> "
        "<a href=\"https://external' || " + s("doc_id % 5") + " || '.example/x\">external</a>"
        "</article>"
        '<div class="sidebar">Low quality sidebar content with short text</div>'
        '<footer class="footer">footer boilerplate</footer>'
        "</body></html>')"
    )


def pages_sql(dialect: str, ids_sql: str | None = None, ntot_sql: str | None = None) -> str:
    """SQL producing (doc_id, url, host, warc_ts, html_str, text, lang).

    ``ids_sql`` must yield columns (doc_id, text, lang, source); defaults to
    the ``documents`` table. ``ntot_sql`` is the corpus size expression used
    for link-target modulo (defaults to a scalar subquery on documents).
    """
    ids_sql = ids_sql or (
        "SELECT doc_id, coalesce(text, '') AS text, "
        "coalesce(lang, 'en') AS lang, coalesce(source, 'web') AS source "
        "FROM documents"
    )
    ntot_sql = ntot_sql or "(SELECT count(*) FROM documents)"
    return f"""
WITH ids AS ({ids_sql}),
linked AS (
  SELECT doc_id, text, lang, source,
         (doc_id * 2 + 1) % {ntot_sql} AS c1,
         (doc_id * 2 + 2) % {ntot_sql} AS c2,
         (doc_id * 7 + 3) % {ntot_sql} AS cx
  FROM ids
)
SELECT doc_id,
       {_url("doc_id", dialect)} AS url,
       {_host("doc_id", dialect)} AS host,
       {_warc_ts(dialect)} AS warc_ts,
       {_html_expr(dialect)} AS html_str,
       text, lang
FROM linked
""".strip()


def robots_sql(dialect: str) -> str:
    """SQL producing (host, rules) for all N_HOSTS hosts.

    host_id % 4 == 0 → disallow prefix /p/1; host 7 → disallow all;
    else allow all. fetch_time is constant.
    """
    s = lambda e: _cast_str(e, dialect)  # noqa: E731
    if dialect == "spark":
        gen = "SELECT explode(sequence(0, {n})) AS host_id".format(n=N_HOSTS - 1)
    else:
        gen = "SELECT unnest(range(0, {n})) AS host_id".format(n=N_HOSTS)
    return f"""
SELECT ('host' || {s("host_id")} || '.example') AS host,
       CASE WHEN host_id = {FULLY_BLOCKED_HOST}
              THEN 'User-agent: *' || chr(10) || 'Disallow: /'
            WHEN host_id % 4 = 0
              THEN 'User-agent: *' || chr(10) || 'Disallow: /p/1'
            ELSE 'User-agent: *' || chr(10) || 'Disallow:'
       END AS rules
FROM ({gen})
""".strip()


def build_pages(
    spark: SparkSession, sf_dir: str, replicate: int = 1, partitions: int | None = None
) -> DataFrame:
    """Materialize the pages DataFrame with the input-hint schema.

    ``replicate`` > 1 scales the corpus for benchmarks: replica r of doc i
    becomes id ``i + r*N`` in the same id-space (links computed mod N*K, so
    replicas interlink into one big graph).

    ``partitions``: spread the corpus before CPU-bound downstream stages —
    the driver test data is one small parquet file, i.e. ONE input split,
    which would serialize every per-page UDF regardless of cores.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("documents")
    n = docs.count()
    if replicate > 1:
        ids_sql = (
            "SELECT d.doc_id + r.rep * {n} AS doc_id, "
            "coalesce(d.text, '') AS text, coalesce(d.lang, 'en') AS lang, "
            "coalesce(d.source, 'web') AS source "
            "FROM documents d CROSS JOIN "
            "(SELECT explode(sequence(0, {k})) AS rep) r"
        ).format(n=n, k=replicate - 1)
        ntot = str(n * replicate)
    else:
        ids_sql, ntot = None, str(n)
    df = spark.sql(pages_sql("spark", ids_sql=ids_sql, ntot_sql=ntot))
    if partitions:
        df = df.repartition(partitions)
    return df.select(
        "url",
        "warc_ts",
        F.encode("html_str", "UTF-8").alias("html"),
        "text",
        "lang",
    )


def build_robots(spark: SparkSession) -> DataFrame:
    return spark.sql(robots_sql("spark")).withColumn(
        "fetch_time", F.lit("2025-07-01 00:00:00").cast("timestamp")
    )


def build_seeds(spark: SparkSession, k: int = 3, ntot: int | None = None) -> DataFrame:
    """Seed list: the first k doc ids' URLs, stable input order. ``ntot``
    (the corpus page count) clamps k so no seed references a page that
    does not exist — without it a small corpus would bootstrap with
    phantom URLs that fetch as misses and skew the fetched/page counters."""
    if ntot is not None:
        k = min(k, ntot)
    rows = spark.range(k).withColumnRenamed("id", "doc_id")
    rows.createOrReplaceTempView("_seed_ids")
    url = _url("doc_id", "spark")
    return spark.sql(
        f"SELECT {url} AS url, CAST(doc_id AS INT) AS seed_rank FROM _seed_ids"
    )
