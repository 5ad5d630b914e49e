from crawl4ai_spark.sources.synthetic import (  # noqa: F401
    build_pages,
    build_robots,
    build_seeds,
    pages_sql,
    robots_sql,
)
from crawl4ai_spark.sources.snapshots import SnapshotTable  # noqa: F401
