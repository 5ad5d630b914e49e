from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from crawl4ai_spark.session import get_spark

    s = get_spark(app_name="crawl4ai_spark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def pages(spark, sf_dir):
    from crawl4ai_spark.sources.synthetic import build_pages

    df = build_pages(spark, sf_dir).cache()
    df.count()
    return df
