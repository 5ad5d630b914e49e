"""Byte-parity of the markdown engine against committed reference goldens.

The goldens were produced by EXECUTING the reference generator
(tools/gen_markdown_goldens.py) over the fixture battery; these tests
byte-compare the from-scratch engine against them — the proof of the north
rule's "byte-identical extracted text" requirement at the generator boundary.
No reference code is imported here.
"""

import hashlib
import json
import os

import pytest

from crawl4ai_spark.html.markdown import generate_markdown_parts
from crawl4ai_spark.html.md_fixtures import FIXTURE_BASE, FIXTURES
from crawl4ai_spark.html.md_goldens import CORPUS_GOLDEN_HASHES, GOLDEN_HASHES

GOLDENS_PATH = os.path.join(os.path.dirname(__file__), "goldens", "markdown_goldens.json")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def test_fixture_goldens_byte_identical():
    with open(GOLDENS_PATH) as f:
        goldens = json.load(f)
    assert len(goldens) == len(FIXTURES)
    for g in goldens:
        raw, cited, refs = generate_markdown_parts(FIXTURES[g["id"]], FIXTURE_BASE)
        assert raw == g["raw"], f"raw mismatch on fixture {g['id']}"
        assert cited == g["cited"], f"cited mismatch on fixture {g['id']}"
        assert refs == g["refs"], f"refs mismatch on fixture {g['id']}"


def test_fixture_hashes_match_generated_module():
    with open(GOLDENS_PATH) as f:
        goldens = json.load(f)
    by_id = {i: (a, b, c) for i, a, b, c in GOLDEN_HASHES}
    for g in goldens:
        assert by_id[g["id"]] == (_md5(g["raw"]), _md5(g["cited"]), _md5(g["refs"]))


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.01"), reason="driver testdata absent"
)
def test_corpus_goldens_byte_identical():
    """Engine parity over real synthetic-corpus pages (arbitrary document
    text), reconstructed via the dual-dialect template in DuckDB."""
    import duckdb

    from crawl4ai_spark.sources.synthetic import pages_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    rows = con.execute(
        f"SELECT url, html_str FROM ({pages_sql('duckdb')}) "
        "WHERE doc_id < 150 ORDER BY url"
    ).fetchall()
    want = {u: (a, b, c) for u, a, b, c in CORPUS_GOLDEN_HASHES}
    assert len(rows) == len(want)
    for url, html_str in rows:
        raw, cited, refs = generate_markdown_parts(html_str, url)
        assert (_md5(raw), _md5(cited), _md5(refs)) == want[url], url


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/crawl4ai/html2text"),
    reason="reference checkout absent",
)
def test_live_differential_against_reference():
    """When the reference checkout is present, EXECUTE its generator over
    the committed fixture battery plus a deterministic fuzz sample and
    byte-compare — the goldens can never silently go stale."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import diff_markdown
    from ref_markdown import reference_markdown

    bad = 0
    cases = list(enumerate(FIXTURES)) + [
        (f"fuzz{i}", d) for i, d in enumerate(diff_markdown._fuzz_docs(300))
    ]
    for _i, doc in cases:
        try:
            want = reference_markdown(doc, FIXTURE_BASE)
        except Exception:
            continue
        if generate_markdown_parts(doc, FIXTURE_BASE) != want:
            bad += 1
    assert bad == 0
