"""Corpus-level exact substring (token-span) deduplication — the
span-granularity member of the dedup family (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better": any
duplicated >= W-token substring is training-set redundancy; the paper
removes all but one occurrence via a corpus suffix array). A suffix
array is a single-machine construction, so the Spark-first restatement
splits the operator into the two surfaces a pipeline actually needs:

- ``duplicate_span_stats``: stride-S sliding fingerprints over every
  W-token window — the MEASUREMENT surface (what fraction of each
  document is corpus-duplicated text), alignment-free and exact at
  window granularity: a duplicated region is detected wherever it
  starts, in any document.
- ``dedup_spans_corpus``: non-overlapping W-token tiles,
  first-occurrence-wins removal — the REMOVAL surface. Tiling is the
  scalable approximation of suffix-array removal: a duplicated region
  is removed tile by tile, but only where the copies are tile-ALIGNED;
  unaligned copies (and region edges) can retain up to W-1 duplicated
  tokens per boundary. That is the documented price of making removal
  a pure groupBy/join plan; run the stats surface after removal to
  measure what the tiling missed.

Shape at 100 TB (deliberately the same skeleton as
``datapipe/linededup.py`` — line dedup IS span dedup with
newline-delimited spans):

- explode to (id, span_no, span_key) — a narrow 3-column stream with
  8-byte hashed keys; span TEXT never enters the wide shuffle;
- ONE groupBy on span_key (md5-derived keys are near-uniform — no skew);
- equi-join the exploded stream back on span_key;
- only KEPT tile text shuffles for reassembly, grouped by doc.

The stats surface at stride 1 materializes ~one row per corpus token;
that is the honest cost of alignment-free measurement (the suffix array
pays the same O(tokens)). Production sweeps over 100 TB should use
``stride=window//2`` — every duplicated window of length >= 2*W-1 still
overlaps a stride point on both copies, and the stream shrinks by W/2x.

Keys are ``textstats.portable_hash`` over the lower-cased
space-rejoined window, so every function here has an exact cross-engine
DuckDB oracle (swap for ``F.xxhash64`` at the same call sites for
production speed, as in datapipe/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.datapipe.textstats import portable_hash


def _words_col(text: Column | str) -> Column:
    """Original-case whitespace words, empties dropped (the reconstruction
    alphabet — reassembled text is space-joined, i.e. whitespace-normalized,
    same convention as the chunkers)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def _span_key(words: Column, start_1b: Column | int, window: int) -> Column:
    """portable_hash of the lower-cased space-joined W-token window at
    1-based ``start_1b``. Lower-casing happens on the JOINED slice (one
    lower() per window, not per token) — byte-identical because the join
    delimiter is a space, which lower() fixes."""
    return portable_hash(
        F.lower(F.array_join(F.slice(words, start_1b, window), " "))
    )


def explode_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 50,
    stride: int = 1,
) -> DataFrame:
    """(id, span_no, span_key): every stride-S sliding W-token window of
    the document, keyed by normalized hash. Documents shorter than
    ``window`` tokens emit ZERO spans (a sub-threshold substring is never
    a dedup candidate — Lee et al. only consider >= W-token matches).
    ``span_no`` is the 0-based window index; token offset = span_no *
    stride."""
    words = _words_col(text_col)
    nwin = F.when(
        F.size(words) >= window,
        (F.floor((F.size(words) - window) / stride) + 1).cast("int"),
    ).otherwise(F.lit(0))
    keys = F.when(
        nwin > 0,
        F.transform(
            F.sequence(F.lit(0), nwin - 1),
            lambda i: _span_key(words, i * stride + 1, window),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return df.select(
        id_col, F.posexplode(keys).alias("span_no", "span_key")
    )


def duplicate_span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 50,
    stride: int = 1,
) -> DataFrame:
    """Per-document duplicated-span profile against the WHOLE corpus:
    (id, n_spans, n_dup_spans, dup_span_frac) where a span is "dup" iff
    its normalized key occurs anywhere else — another document OR another
    offset of the same document (self-repetition is duplication too,
    matching the suffix-array semantics). Anchored on the input id set:
    short/empty documents report (0, 0, 0.0) rather than vanishing.

    Plan: one narrow groupBy(span_key) with map-side combine for global
    counts, a left-semi join back (key-partitioned both sides), then two
    per-doc counts. Nothing wider than 12 bytes/row ever shuffles."""
    spans = explode_spans(df, id_col, text_col, window, stride)
    dup_keys = (
        spans.groupBy("span_key")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") >= 2)
        .select("span_key")
    )
    dup_spans = spans.join(dup_keys, "span_key", "left_semi")
    totals = spans.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_spans"))
    dups = dup_spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_spans")
    )
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(dups, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.round(
                F.when(
                    F.coalesce("n_spans", F.lit(0)) > 0,
                    F.coalesce("n_dup_spans", F.lit(0))
                    / F.col("n_spans").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_span_frac"),
        )
    )


def dedup_spans_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 50,
) -> DataFrame:
    """Remove every corpus-repeated W-token tile except its first
    occurrence (min (id, tile_no) over the normalized tile key —
    deterministic and layout-independent, same keep rule as
    ``linededup.dedup_lines_corpus``). Documents tile into
    floor(n_tokens / W) full tiles plus a < W-token tail; the tail is
    sub-threshold and always kept. Returns (id, text_clean, n_tiles,
    n_tiles_kept) — text_clean is the space-joined surviving tiles + tail
    (whitespace-normalized), n_tiles counts FULL tiles only.

    Removal is exact for tile-aligned copies (e.g. whole-document
    duplicates, or shared prefixes) and removes unaligned duplicated
    regions only where their tiles happen to coincide — see the module
    docstring for why, and ``duplicate_span_stats`` for measuring the
    remainder."""
    words = _words_col(text_col)
    base = df.select(
        F.col(id_col), words.alias("_w"), F.size(words).alias("_n")
    ).withColumn("_ntiles", (F.col("_n") / window).cast("int"))
    base = base.withColumn(
        "_tail",
        F.array_join(
            F.slice(
                F.col("_w"),
                F.col("_ntiles") * window + 1,
                F.col("_n") - F.col("_ntiles") * window,
            ),
            " ",
        ),
    )
    tiles = base.filter(F.col("_ntiles") > 0).select(
        id_col,
        "_w",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("_ntiles") - 1),
                lambda t: F.struct(
                    F.array_join(
                        F.slice(F.col("_w"), t * window + 1, window), " "
                    ).alias("tile_text"),
                    _span_key(F.col("_w"), t * window + 1, window).alias(
                        "tile_key"
                    ),
                ),
            )
        ).alias("tile_no", "_t"),
    ).select(
        id_col,
        "tile_no",
        F.col("_t")["tile_text"].alias("tile_text"),
        F.col("_t")["tile_key"].alias("tile_key"),
    )
    firsts = tiles.groupBy("tile_key").agg(
        F.min(F.struct(id_col, "tile_no")).alias("first_occ")
    )
    kept = tiles.join(firsts, "tile_key").filter(
        (F.col(id_col) == F.col("first_occ")[id_col])
        & (F.col("tile_no") == F.col("first_occ")["tile_no"])
    )
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tile_no", "tile_text"))),
                lambda s: s["tile_text"],
            ),
            " ",
        ).alias("_kept_text"),
        F.count(F.lit(1)).alias("n_tiles_kept"),
    )
    return (
        base.select(id_col, "_ntiles", "_tail")
        .join(reassembled, id_col, "left")
        .select(
            F.col(id_col),
            F.trim(
                F.concat_ws(
                    " ", F.coalesce("_kept_text", F.lit("")), F.col("_tail")
                )
            ).alias("text_clean"),
            F.col("_ntiles").cast("long").alias("n_tiles"),
            F.coalesce("n_tiles_kept", F.lit(0)).cast("long").alias(
                "n_tiles_kept"
            ),
        )
    )
