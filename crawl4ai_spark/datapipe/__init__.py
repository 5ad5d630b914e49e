"""Training-data pipeline operators over the documents/embeddings tables.

Beyond the reference's crawl operators, a 100 TB crawl corpus needs the
standard LLM-training-data prep stages: dedup (exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding cosine), similarity search (brute-force + LSH
ANN), text analysis (lang-ID, quality, tokens, fingerprints) and multimodal
column plumbing. Everything here is Catalyst-native (higher-order array
functions, window ranks, hash joins) — no Python in the hot path except the
explicitly-stubbed multimodal decoders.

Cross-engine determinism: every hash is ``portable_hash`` (first 15 hex
chars of md5 → int64), which evaluates identically in Spark SQL and DuckDB,
so each operator has an exact value-level oracle.
"""

from crawl4ai_spark.datapipe.textstats import (  # noqa: F401
    fingerprint_col,
    lang_id_col,
    portable_hash,
    quality_score_col,
    regex_token_count_col,
    token_count_col,
    tokens_col,
)
