"""Text analysis as pure Catalyst expressions (lang-ID, quality, tokens,
fingerprints).

Design rule: every function here is a deterministic Column expression with
an exact DuckDB-SQL twin (see __spark_entry__.oracle_sql), so correctness is
checkable value-for-value. No UDFs — these run inside whole-stage codegen
and scale linearly with cores; at 100 TB they are scan-bound, not CPU-bound.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish token regex: letter runs, digit runs, single other non-space.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Stopword lists for the n-gram-free heuristic language identifier.
# Deliberately tiny: the point is the *operator shape* (vectorized
# list-membership scoring + argmax), which is what survives a scale-up to a
# real fastText-style model via the same expressions over bigger maps.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
    "es": ["el", "los", "y", "es", "no", "por", "sí", "una", "para", "como"],
}

# Quality-score stopwords (English function words; ratio is a fluency proxy).
QUALITY_STOPWORDS = LANG_STOPWORDS["en"]


def portable_hash(col: Column | str) -> Column:
    """Deterministic 60-bit hash that evaluates identically in Spark and
    DuckDB: int64 of the first 15 hex chars of md5(s). Used for MinHash /
    SimHash / LSH so every dedup operator has an exact cross-engine oracle.
    (xxhash64 would be faster but is Spark-only; at 100 TB you'd swap
    ``portable_hash`` for ``F.xxhash64`` behind the same call sites.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def tokens_col(text: Column | str) -> Column:
    """Lower-cased whitespace tokens, empties dropped."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def token_count_col(text: Column | str) -> Column:
    return F.size(tokens_col(text)).cast("long")


def regex_token_count_col(text: Column | str) -> Column:
    """BPE-ish subword token count via TOKEN_REGEX (pure Catalyst)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), F.lit(0))).cast("long")


def _isin_words(words: list[str]):
    """One-arg lambda factory for F.filter (a two-param lambda would make
    pyspark pass the array INDEX as the second argument)."""
    return lambda t: t.isin(words)


def stopword_ratio_col(text: Column | str, stopwords: list[str] | None = None) -> Column:
    toks = tokens_col(text)
    stops = stopwords or QUALITY_STOPWORDS
    hits = F.size(F.filter(toks, _isin_words(stops)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def alpha_ratio_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    return F.when(n > 0, alpha.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score_col(text: Column | str) -> Column:
    """Composite document-quality score in [0,1] (rounded to 6 dp):

    0.3·min(tokens/100, 1) + 0.3·min(4·stopword_ratio, 1)
    + 0.2·alpha_ratio + 0.2·word-length-plausibility.

    The exact formula is arbitrary (the reference has no quality scorer);
    what matters is that it is deterministic, vectorized, and oracled.
    """
    c = F.col(text) if isinstance(text, str) else text
    n_tok = token_count_col(c).cast("double")
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio_col(c) * F.lit(4.0), F.lit(1.0))
    alpha = alpha_ratio_col(c)
    avg_wl = F.when(n_tok > 0, F.length(c).cast("double") / n_tok).otherwise(F.lit(0.0))
    wl_score = F.when((avg_wl >= 3.0) & (avg_wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    score = (
        F.lit(0.3) * len_score
        + F.lit(0.3) * stop_score
        + F.lit(0.2) * alpha
        + F.lit(0.2) * wl_score
    )
    return F.round(score, 6)


def lang_id_col(text: Column | str) -> Column:
    """Heuristic language ID: stopword-hit argmax over LANG_STOPWORDS with
    fixed priority order en > de > fr > es; no hits → 'und'."""
    toks = tokens_col(text)
    hits = {
        lang: F.size(F.filter(toks, _isin_words(words)))
        for lang, words in LANG_STOPWORDS.items()
    }
    en, de, fr, es = hits["en"], hits["de"], hits["fr"], hits["es"]
    return (
        F.when((en == 0) & (de == 0) & (fr == 0) & (es == 0), F.lit("und"))
        .when((en >= de) & (en >= fr) & (en >= es), F.lit("en"))
        .when((de >= fr) & (de >= es), F.lit("de"))
        .when(fr >= es, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def fingerprint_col(text: Column | str) -> Column:
    """Whitespace-canonical md5 document fingerprint (exact-dedup key)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")))
