"""Corpus generator: schema, determinism, Spark↔DuckDB byte parity."""

from __future__ import annotations

import duckdb

from crawl4ai_spark.sources.synthetic import pages_sql, robots_sql


def test_pages_schema(pages):
    assert [f.name for f in pages.schema.fields] == [
        "url",
        "warc_ts",
        "html",
        "text",
        "lang",
    ]
    types = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
    assert types["html"] == "binary"
    assert types["warc_ts"] == "timestamp"


def test_pages_duckdb_byte_parity(pages, sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    duck = con.execute(
        f"SELECT url, html_str FROM ({pages_sql('duckdb')}) ORDER BY url"
    ).fetchall()
    sp = (
        pages.selectExpr("url", "decode(html, 'UTF-8') AS html_str")
        .orderBy("url")
        .collect()
    )
    assert len(duck) == len(sp) > 0
    for (du, dh), row in zip(duck, sp):
        assert du == row.url
        assert dh == row.html_str


def test_host_skew_exists(pages, spark):
    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.urls import host_col

    counts = (
        pages.select(host_col(F.col("url")).alias("host"))
        .groupBy("host")
        .count()
        .collect()
    )
    by_host = {r.host: r["count"] for r in counts}
    total = sum(by_host.values())
    # host0 is the deliberate hot host (~40%)
    assert by_host["host0.example"] / total > 0.3


def test_robots_parity(spark):
    from crawl4ai_spark.sources.synthetic import build_robots

    con = duckdb.connect()
    duck = sorted(con.execute(robots_sql("duckdb")).fetchall())
    sp = sorted((r.host, r.rules) for r in build_robots(spark).collect())
    assert duck == sp


def test_seeds(spark):
    from crawl4ai_spark.sources.synthetic import build_seeds

    rows = build_seeds(spark, k=3).orderBy("seed_rank").collect()
    assert [r.url for r in rows] == [
        "https://host0.example/p/0",
        "https://host0.example/p/1",
        "https://host2.example/p/2",
    ]
