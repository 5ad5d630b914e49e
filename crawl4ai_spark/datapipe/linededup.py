"""Corpus-level line deduplication (CCNet-style, Wenzek et al. 2020 §2):
boilerplate lines (nav menus, cookie banners, footers) repeat across
thousands of pages; removing every copy but the first cuts a large share
of a web corpus before document-level dedup even runs.

Shape (the part that must survive 100 TB):
- explode documents into (doc_id, line_no, line_hash) — a narrow 3-column
  stream, no line text shuffled;
- ONE groupBy on line_hash finds each hash's first occurrence
  (min struct(doc_id, line_no) — deterministic, layout-independent);
  line hashes are near-uniform keys, so the shuffle has no skew;
- equi-join the exploded stream back on line_hash (both sides partitioned
  by the same key — with the first-occurrence table written bucketed by
  line_hash this join is exchange-free on one side, same evolution as
  datapipe/dedup.write_minhash_tables);
- reassemble surviving lines per document with a groupBy(doc_id) ordered
  array — the only place line TEXT shuffles, and only for kept lines.

The keep rule is deterministic: a line occurrence survives iff it is the
lexicographically-minimal (doc_id, line_no) holder of its normalized hash
— so reruns on any partitioning produce byte-identical output (exact
DuckDB oracle in the contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_key_col(line):
    """Normalization key for cross-document line matching: textstats.
    fingerprint_col applied per line — DELEGATED, not restated, so a
    canonicalization change lands in document- and line-level dedup (and
    their oracles) together."""
    from crawl4ai_spark.datapipe.textstats import fingerprint_col

    return fingerprint_col(line)


def explode_lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, line_no, line, line_key) — non-empty trimmed lines with their
    0-based position among the non-empty lines."""
    trimmed = F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l))
    nonempty = F.filter(trimmed, lambda l: l != "")
    return (
        df.select(id_col, F.posexplode(nonempty).alias("line_no", "line"))
        .withColumn("line_key", line_key_col(F.col("line")))
    )


def dedup_lines_corpus(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Remove every repeated line (by normalized hash) across the WHOLE
    corpus except its first occurrence (min (id, line_no)). Returns
    (id, text_clean, n_lines, n_lines_kept); documents whose every line is
    boilerplate come back with empty text_clean rather than vanishing, so
    downstream length gates make the drop decision explicitly."""
    lines = explode_lines(df, id_col, text_col)
    firsts = lines.groupBy("line_key").agg(
        F.min(F.struct(id_col, "line_no")).alias("first_occ")
    )
    kept = lines.join(firsts, "line_key").filter(
        (F.col(id_col) == F.col("first_occ")[id_col])
        & (F.col("line_no") == F.col("first_occ")["line_no"])
    )
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    # anchor on the INPUT id set, not the exploded stream: a document whose
    # text is empty/whitespace-only explodes to zero lines and would vanish
    # from both aggregates — it must come back as (n_lines=0, text_clean='')
    # so downstream doc counts and length gates see it explicitly
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(reassembled, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
        )
    )
