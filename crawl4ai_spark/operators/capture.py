"""Latest-capture collapse, shared by the crawl fetch join and link preview.

Multi-capture corpora (several rows per url — normal in WARC snapshots) must
collapse to ONE deterministic capture per key before a 1:1 join: a fan-out
inflates join outputs (duplicate result rows, corrupt crawl counters,
double-counted BM25 corpus documents). Reference parity: the reference
fetches each URL once over HTTP (async_webcrawler.py arun), so a unique
capture per url is implicit there; an offline WARC corpus makes the collapse
explicit. Both consumers (``plans/crawl.py`` step 3 and
``operators/link_preview.py``'s head fetch) spell it through this one helper
so the tie-break semantics cannot drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_capture(df: DataFrame, key: str, ts_col: str = "warc_ts") -> DataFrame:
    """One row per ``key``: the latest capture by ``ts_col`` when the column
    is present, with full-row lexicographic max over the remaining columns
    as the deterministic tie-break (and as the total order when ``ts_col``
    is absent). Keys on the join key itself, so Catalyst's map-side partial
    aggregate collapses duplicates before the exchange the downstream join
    needed anyway."""
    pcols = [c for c in df.columns if c != key]
    ordered = [c for c in pcols if c == ts_col] + [c for c in pcols if c != ts_col]
    return (
        df.groupBy(key)
        .agg(F.max(F.struct(*ordered)).alias("_cap"))
        .select(key, *[F.col(f"_cap.{c}").alias(c) for c in pcols])
    )
