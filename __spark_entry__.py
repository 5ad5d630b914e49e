"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (a resumable BFS crawl + extraction over
the synthetic Common-Crawl-style corpus at sf0.001). ``queries`` /
``oracle_sql`` expose the full operator registry from
``crawl4ai_spark.contract`` — one Spark implementation + one exact DuckDB
oracle per operator from SURVEY.md §2 and the datapipe training-data ops.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 3 frontier iterations of the BFS crawl (politeness windows,
    robots gate, fetch join, scrape/markdown UDFs, bloom+anti-join dedup,
    snapshot checkpoints) on /root/testdata/sf0.001."""
    from crawl4ai_spark.plans.crawl import CrawlConfig, CrawlRun
    from crawl4ai_spark.sources.synthetic import build_pages, build_robots, build_seeds

    sf_dir = "/root/testdata/sf0.001"
    workdir = tempfile.mkdtemp(prefix="c4ai_entry_")
    pages = build_pages(spark, sf_dir)
    robots = build_robots(spark)
    seeds = build_seeds(spark, 3)
    run = CrawlRun(
        spark,
        pages,
        robots,
        seeds,
        workdir,
        CrawlConfig(
            mode="bfs", max_pages=40, max_depth=3, host_budget=5, iteration_budget=20
        ),
    )
    run.run(max_iterations=3)
    res = run.results()
    return res.select(
        "url",
        "host",
        "depth",
        "status_code",
        "visit_order",
        "lang",
        "success",
        F.length("raw_markdown").alias("md_len"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from crawl4ai_spark.contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from crawl4ai_spark.contract import ORACLES

    return dict(ORACLES)
