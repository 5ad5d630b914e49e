"""Span-level exact substring dedup (datapipe/spandedup.py): semantics,
edge cases, and a differential check against a naive single-machine
restatement of the same contract."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.datapipe.spandedup import (
    dedup_spans_corpus,
    duplicate_span_stats,
    explode_spans,
)


def _naive_key(tokens: list[str]) -> int:
    s = " ".join(tokens).lower()
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _naive_stats(docs: dict[int, str], window: int, stride: int):
    spans: dict[int, list[int]] = {}
    for did, text in docs.items():
        w = text.split()
        n = len(w)
        keys = []
        if n >= window:
            nwin = (n - window) // stride + 1
            keys = [
                _naive_key(w[i * stride : i * stride + window])
                for i in range(nwin)
            ]
        spans[did] = keys
    counts: dict[int, int] = {}
    for keys in spans.values():
        for k in keys:
            counts[k] = counts.get(k, 0) + 1
    out = {}
    for did, keys in spans.items():
        nd = sum(1 for k in keys if counts[k] >= 2)
        frac = round(nd / len(keys), 6) if keys else 0.0
        out[did] = (len(keys), nd, frac)
    return out


def _naive_clean(docs: dict[int, str], window: int):
    tiles = []  # (key, doc_id, tile_no, text)
    meta = {}
    for did, text in docs.items():
        w = text.split()
        ntiles = len(w) // window
        tail = " ".join(w[ntiles * window :])
        meta[did] = (ntiles, tail, len(w))
        for t in range(ntiles):
            seg = w[t * window : (t + 1) * window]
            tiles.append((_naive_key(seg), did, t, " ".join(seg)))
    first: dict[int, tuple[int, int]] = {}
    for k, did, t, _ in tiles:
        if k not in first or (did, t) < first[k]:
            first[k] = (did, t)
    out = {}
    for did, (ntiles, tail, _n) in meta.items():
        kept = [
            txt
            for k, d, t, txt in sorted(
                (x for x in tiles if x[1] == did), key=lambda x: x[2]
            )
            if first[k] == (d, t)
        ]
        body = " ".join(kept)
        clean = (body + " " + tail).strip() if tail else body
        out[did] = (clean, ntiles, len(kept))
    return out


@pytest.fixture(scope="module")
def corpus(sf_dir, spark):
    """documents.parquet texts with enough cross-doc overlap to exercise
    every branch: append a shared slogan to every 3rd doc and duplicate
    every 7th doc verbatim under a new id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    base = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                "text",
                F.lit(" visit our site for the best deals on everything today"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    clones = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return base.unionByName(clones)


def test_stats_differential_vs_naive(spark, corpus):
    docs = {r.doc_id: r.text for r in corpus.collect()}
    for window, stride in [(8, 1), (8, 4), (13, 5)]:
        got = {
            r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_span_frac)
            for r in duplicate_span_stats(
                corpus, "doc_id", "text", window=window, stride=stride
            ).collect()
        }
        want = _naive_stats(docs, window, stride)
        assert got == want, f"stats mismatch at window={window} stride={stride}"


def test_clean_differential_vs_naive(spark, corpus):
    docs = {r.doc_id: r.text for r in corpus.collect()}
    for window in [8, 13]:
        got = {
            r.doc_id: (r.text_clean, r.n_tiles, r.n_tiles_kept)
            for r in dedup_spans_corpus(
                corpus, "doc_id", "text", window=window
            ).collect()
        }
        want = _naive_clean(docs, window)
        assert got == want, f"clean mismatch at window={window}"


def test_whole_doc_duplicate_fully_removed(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in dedup_spans_corpus(df, "doc_id", "text", window=4).collect()
    }
    assert rows[1].text_clean == "a b c d e f g h"
    assert rows[2].text_clean == "" and rows[2].n_tiles_kept == 0


def test_self_repetition_counts_as_duplication(spark):
    df = spark.createDataFrame(
        [(1, "p q r s p q r s")], "doc_id long, text string"
    )
    r = duplicate_span_stats(df, "doc_id", "text", window=4).collect()[0]
    # windows 0 and 4 share the key "p q r s"
    assert r.n_spans == 5 and r.n_dup_spans == 2
    c = dedup_spans_corpus(df, "doc_id", "text", window=4).collect()[0]
    assert c.text_clean == "p q r s" and c.n_tiles_kept == 1


def test_short_and_empty_docs_anchor(spark):
    df = spark.createDataFrame(
        [(1, "too short"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    stats = {
        r.doc_id: r
        for r in duplicate_span_stats(df, "doc_id", "text", window=4).collect()
    }
    assert set(stats) == {1, 2, 3}
    assert all(
        (r.n_spans, r.n_dup_spans, r.dup_span_frac) == (0, 0, 0.0)
        for r in stats.values()
    )
    clean = {
        r.doc_id: r
        for r in dedup_spans_corpus(df, "doc_id", "text", window=4).collect()
    }
    assert clean[1].text_clean == "too short"  # sub-threshold tail kept
    assert clean[2].text_clean == "" and clean[3].text_clean == ""


def test_keys_normalize_case_and_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "Alpha  Beta\nGamma Delta"), (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in dedup_spans_corpus(df, "doc_id", "text", window=4).collect()
    }
    # doc 2's tile matches doc 1's normalized key; doc 1 keeps its casing
    assert rows[1].text_clean == "Alpha Beta Gamma Delta"
    assert rows[2].text_clean == "" and rows[2].n_tiles_kept == 0


def test_unaligned_copy_detected_by_stats_kept_by_tiles(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "z a b c d e f")],
        "doc_id long, text string",
    )
    stats = {
        r.doc_id: r
        for r in duplicate_span_stats(df, "doc_id", "text", window=4).collect()
    }
    # sliding windows find the shared 4-grams wherever they start
    assert stats[1].n_dup_spans == 3 and stats[2].n_dup_spans == 3
    clean = {
        r.doc_id: r
        for r in dedup_spans_corpus(df, "doc_id", "text", window=4).collect()
    }
    # but the copies are tile-UNALIGNED, so tile removal keeps both —
    # the documented stats-after-removal measurement catches this
    assert clean[1].n_tiles_kept == 1 and clean[2].n_tiles_kept == 1


def test_stride_halves_span_count(spark, corpus):
    s1 = duplicate_span_stats(corpus, "doc_id", "text", window=8, stride=1)
    s2 = duplicate_span_stats(corpus, "doc_id", "text", window=8, stride=2)
    n1 = s1.agg(F.sum("n_spans")).collect()[0][0]
    n2 = s2.agg(F.sum("n_spans")).collect()[0][0]
    assert n2 <= n1 / 2 + s2.count()  # ceil rounding per doc


def test_explode_spans_positions(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    rows = explode_spans(df, "doc_id", "text", window=3, stride=2).collect()
    assert [r.span_no for r in rows] == [0, 1]  # offsets 0 and 2


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_span_stats_shuffles_only_narrow_columns(spark, sf_dir):
    """The two exchanges (span_key counts, per-doc counts) must carry
    hashed keys and counters only — span/tile TEXT entering a shuffle
    would multiply the exchange size by the window length at 100 TB."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(duplicate_span_stats(docs, "doc_id", "text", window=20))
    sections = plan.split("Exchange hashpartitioning")
    assert len(sections) >= 2, "expected the span_key and doc_id exchanges"
    for sec in sections[1:]:
        head = sec.split("+-")[0]  # the exchange's own argument line
        assert "text#" not in head and "tile_text" not in head


def test_span_clean_shuffles_tile_text_only_for_kept(spark, sf_dir):
    """Reassembly may shuffle tile text (it must — the kept tiles regroup
    by doc), but the FIRST groupBy — the corpus-wide key agg — must not."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(dedup_spans_corpus(docs, "doc_id", "text", window=20))
    key_exchanges = [
        s for s in plan.split("Exchange hashpartitioning")
        if s.startswith("(tile_key")
    ]
    assert key_exchanges, "expected a tile_key exchange for the firsts agg"
    assert all(
        "tile_text" not in s.split("+-")[0] for s in key_exchanges
    ), "tile_key agg must shuffle (key, first_occ) only, never tile text"
