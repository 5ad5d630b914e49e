"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set (the standard contamination gate
— GPT-3 used 13-gram overlap, Rae et al. 2021 appendix A.3 a similar
n-gram scheme; n is a parameter here because the right value depends on
tokenizer and corpus vocabulary).

Scale shape (the part that must survive 100 TB):
- the benchmark side is SMALL (eval sets are megabytes) — its distinct
  n-gram hash set is broadcast, so the corpus-side probe is a map-side
  broadcast-hash join: the corpus never shuffles;
- corpus documents explode into (doc_id, gram_hash) only transiently
  inside the probe stage (whole-stage codegen keeps it pipelined), and
  only MATCHED rows survive into the tiny per-doc aggregate;
- the per-doc hit counts are USUALLY small (bounded by the benchmark
  set's footprint in the corpus) and AQE broadcasts them back onto the
  corpus at runtime — zero corpus-sized exchanges on the normal path.
  On a heavily/adversarially contaminated corpus the hit table is
  O(corpus), so its join strategy is deliberately NOT hinted: AQE then
  degrades that one join to a shuffle instead of a forced-broadcast
  driver OOM (see ``decontaminate``).

Determinism: grams are lower-cased whitespace word windows hashed with
textstats.portable_hash, so the exact same computation runs in DuckDB
for the contract oracle (query ``decontaminate``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.datapipe.textstats import portable_hash, tokens_col


def ngram_hash_col(text: Column | str, n: int) -> Column:
    """Distinct hashes of the lower-cased word n-grams of ``text``.
    Documents shorter than ``n`` tokens contribute NO grams (a short doc
    cannot leak an n-gram-sized benchmark item)."""
    toks = tokens_col(text)
    windows = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: portable_hash(F.concat_ws(" ", F.slice(toks, i, n))),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, windows).otherwise(
            F.array().cast("array<long>")
        )
    )


def benchmark_gram_set(
    benchmark: DataFrame, text_col: str, n: int
) -> DataFrame:
    """(gram_hash) — the distinct n-gram hash set of the benchmark side."""
    return (
        benchmark.select(
            F.explode(ngram_hash_col(text_col, n)).alias("gram_hash")
        )
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Tag every corpus document with its benchmark n-gram overlap:
    input columns + ``n_grams`` (document gram count), ``n_hits``
    (distinct grams shared with the benchmark), ``contaminated``
    (n_hits >= min_hits).

    The benchmark gram set is explicitly broadcast (eval sets are
    megabytes, always small). The per-doc hit table is *usually* tiny —
    bounded by the benchmark's footprint in the corpus — but on a
    heavily/adversarially contaminated corpus it is O(corpus), so its join
    strategy is left to AQE: small hit tables still broadcast at runtime
    (below autoBroadcastJoinThreshold), pathological ones degrade to a
    shuffle join instead of OOMing the driver with a forced broadcast."""
    bench_text_col = bench_text_col or text_col
    grams = benchmark_gram_set(benchmark, bench_text_col, n)

    doc_grams = corpus.select(
        F.col(id_col), F.explode(ngram_hash_col(text_col, n)).alias("gram_hash")
    )
    hits = (
        doc_grams.join(F.broadcast(grams), "gram_hash")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    # no broadcast hint here — see the docstring: AQE broadcasts small hit
    # tables at runtime, pathological ones degrade to a shuffle join.
    # DELIBERATE double evaluation: ngram_hash_col runs once in the probe
    # explode above and once for n_grams below. Folding n_grams into the
    # probe aggregation would compute it once, but the final join's right
    # side would then be O(#docs) instead of O(#contaminated docs) — a
    # guaranteed corpus-sized exchange replacing a usually-broadcast join.
    # 2× map-side CPU is the cheaper side of that trade at 100 TB.
    return (
        corpus.withColumn(
            "n_grams", F.size(ngram_hash_col(text_col, n)).cast("long")
        )
        .join(hits, id_col, "left")
        .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)).cast("long"))
        .withColumn("contaminated", F.col("n_hits") >= min_hits)
    )
