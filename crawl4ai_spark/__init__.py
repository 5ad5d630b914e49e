"""crawl4ai_spark — a from-scratch PySpark-native crawl scheduler + extractor.

Re-expresses the capabilities of the reference crawler (rsp2k/crawl4ai, an
asyncio/Playwright per-page object pipeline) as declarative Spark DataFrame
plans over Common-Crawl-style page tables:

- ``sources``    : deterministic synthetic page corpora + snapshot tables
                   (Iceberg-style parquet snapshots w/ manifest, resumable)
- ``functions``  : URL normalization, host/domain extraction, text analysis
                   (vectorized pandas UDFs and Catalyst-native Column exprs)
- ``html``       : stdlib-only HTML parsing, scraping, markdown generation,
                   fit-text pruning (the extraction kernel, Arrow-batched)
- ``operators``  : URL filters, scorers, dedup (exact/minhash/simhash),
                   similarity search, politeness windows, robots gating,
                   priority ranking, URL-seen bloom + anti-join
- ``plans``      : the frontier iteration loop (BFS / best-first / DFS),
                   extraction job, checkpoint/resume, per-partition lineage

Design: DataFrame/Catalyst first — joins, windows, aggregations and filter
pushdown are declarative; Python only runs inside Arrow-vectorized pandas
UDFs (HTML parse, URL normalization). No RDDs, no per-row Python UDFs.
"""

__version__ = "0.1.0"
