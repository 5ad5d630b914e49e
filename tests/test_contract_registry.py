"""Driver-contract registry invariants: every query has an oracle, every
oracle has a query, and the oracle SQL at least parses in DuckDB against
empty views (cheap guard against dialect typos landing un-run)."""

from __future__ import annotations

import duckdb
import pytest

from crawl4ai_spark.contract import ORACLES, QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def test_every_query_has_an_oracle():
    assert set(QUERIES) == set(ORACLES), (
        f"missing oracles: {sorted(set(QUERIES) - set(ORACLES))}; "
        f"orphan oracles: {sorted(set(ORACLES) - set(QUERIES))}"
    )


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(CAST(0 AS BIGINT), 'some text here', 'en', 'web')) "
        "AS t(doc_id, text, lang, source)"
    )
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM (VALUES "
        "(CAST(0 AS BIGINT), [0.1, 0.2])) AS t(vec_id, embedding)"
    )
    return con


def test_every_oracle_parses_and_runs(duck):
    failures = []
    for name, sql in sorted(ORACLES.items()):
        try:
            duck.execute(sql).fetchdf()
        except Exception as e:
            failures.append(f"{name}: {str(e)[:160]}")
    assert not failures, "\n".join(failures)
