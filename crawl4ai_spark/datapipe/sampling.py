"""Deterministic sampling operators for training-data pipelines.

Random sampling via ``df.sample`` is seed-and-partitioning dependent —
rerunning on a repartitioned 100 TB corpus yields a different sample,
which breaks reproducible dataset builds and makes an exact oracle
impossible. These operators sample by KEY HASH instead: a row is in the
sample iff xxhash64(key ‖ salt) falls under the rate threshold. Properties:

- deterministic: same key + salt ⇒ same decision, on any cluster layout;
- consistent across tables: the same key samples in/out everywhere (the
  standard trick for sampling joined fact/dim tables coherently);
- streaming-safe: the decision needs only the row itself — no shuffle,
  no state, applies identically in a Structured Streaming query;
- stratified: per-stratum rates via a small rate table (broadcast join) or
  a rate expression.

Exactness note: hash sampling delivers rate·n rows in EXPECTATION (binomial
concentration at corpus scale), not exactly ceil(rate·n); exact-count
sampling requires a global rank (see operators/ranking.range_rank) and is
rarely worth the shuffle at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# xxhash64 output spans the full signed 64-bit range; mapping to [0, 1)
# uses the unsigned reinterpretation / 2^64
_TWO63 = float(1 << 63)
_TWO64 = float(1 << 64)


def hash_uniform_col(
    key: Column | str, salt: str = "", portable: bool = False
) -> Column:
    """Deterministic uniform [0, 1) value per key. Default: the unsigned
    reinterpretation of xxhash64(key ‖ salt) / 2^64 (JVM-native, the
    production path). ``portable=True`` derives the value from the md5
    60-bit ``portable_hash`` instead — slower, but evaluates identically
    in DuckDB, which is what the contract oracle compares against (the
    same dual-path pattern as datapipe/dedup.py's hash_fn)."""
    k = F.col(key) if isinstance(key, str) else key
    keyed = F.concat(k.cast("string"), F.lit(salt))
    if portable:
        from crawl4ai_spark.datapipe.textstats import portable_hash

        return portable_hash(keyed).cast("double") / float(1 << 60)
    h = F.xxhash64(keyed).cast("double")
    return (h + _TWO63) / _TWO64


def sample_by_hash(
    df: DataFrame, key: str, rate: float, salt: str = "", portable: bool = False
) -> DataFrame:
    """Keep ~``rate`` of rows, decided by key hash — deterministic,
    shuffle-free, layout-independent."""
    return df.filter(hash_uniform_col(key, salt, portable=portable) < rate)


def stratified_sample_by_hash(
    df: DataFrame,
    key: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
    portable: bool = False,
) -> DataFrame:
    """Per-stratum hash sampling: stratum → rate from ``rates`` (missing
    strata get ``default_rate``). The rate lookup is a literal CASE chain
    (tiny rate maps) — no join, no shuffle; use a broadcast-joined rate
    table instead when strata number in the thousands."""
    rate_expr: Column = F.lit(float(default_rate))
    for stratum, rate in sorted(rates.items()):
        rate_expr = F.when(
            F.col(stratum_col) == stratum, F.lit(float(rate))
        ).otherwise(rate_expr)
    return df.filter(hash_uniform_col(key, salt, portable=portable) < rate_expr)


def mix_sources(
    df: DataFrame,
    key: str,
    source_col: str,
    weights: dict[str, float],
    total: int | None = None,
    salt: str = "",
    portable: bool = False,
) -> DataFrame:
    """Rebalance a multi-source corpus toward target mixture ``weights``
    (source → relative weight, e.g. {"web": 0.6, "wiki": 0.3, "code":
    0.1}): each source keeps ~min(1, target_s / n_s) of its documents,
    where target_s = normalized_weight_s · total (default total = corpus
    size). Downsamples over-represented sources; under-represented sources
    keep everything (hash sampling cannot invent rows — upweighting is the
    trainer's epoch-weighting job, not the corpus builder's).

    Adds ``keep_prob`` and filters to kept rows. Decisions are per-row
    hash tests against a broadcast per-source probability map — the corpus
    itself never shuffles; the only aggregation is the tiny per-source
    count (map-side partial agg, #sources rows).

    Rows with a NULL source form their own stratum (normal in merged web
    corpora): they are kept only if ``weights`` carries an explicit
    ``None`` entry, otherwise their keep_prob is 0 — dropped EXPLICITLY
    by the mixture, not crashed on or silently passed through.
    """
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = int(total if total is not None else sum(counts.values()))
    wsum = float(sum(weights.values())) or 1.0
    probs: dict[str, float] = {}
    for src, n_s in counts.items():
        w = float(weights.get(src, 0.0)) / wsum
        probs[src] = min(1.0, (w * n_total) / n_s) if n_s else 0.0
    prob_expr: Column = F.lit(0.0)
    # None-safe sort (a NULL source stratum would TypeError a plain sort)
    # and isNull match (== never matches NULL)
    for src, p in sorted(probs.items(), key=lambda kv: (kv[0] is None, kv[0] or "")):
        cond = F.col(source_col).isNull() if src is None else F.col(source_col) == src
        prob_expr = F.when(cond, F.lit(p)).otherwise(prob_expr)
    return (
        df.withColumn("keep_prob", prob_expr)
        .filter(hash_uniform_col(key, salt, portable=portable) < F.col("keep_prob"))
    )
