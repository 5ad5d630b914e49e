"""Token-budget shard packing: assign documents to fixed-token-budget
output shards (the step between corpus cleaning and tokenizer sharding in
a training-data pipeline — each shard feeds one tokenizer/packing worker).

Rule: documents are laid out in a deterministic total order (the key
column), and shard_id = floor(exclusive_prefix_sum(tokens) / budget) —
i.e. a document lands in the shard where its span BEGINS. Deterministic,
layout-independent, and exactly expressible in SQL
(``sum(...) over (order by key rows between unbounded preceding and 1
preceding)``), so the contract oracle checks it value-for-value.

Scale shape: a naive global-ORDER window is one task over the whole
corpus. This implementation is the distributed prefix-sum (same pattern as
operators/ranking.range_rank): range-repartition on the key, pin the
partition id, ONE tiny per-partition aggregate (≤ #partitions rows to the
driver), broadcast the offsets back as a literal map, and compute the
global running sum as offset + within-partition cumsum. No single task
ever sees more than one balanced key range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _shard_nparts(
    parallelism: int, n_rows_hint: int | None, partition_rows: int
) -> int:
    """Range-partition count for ``pack_shards``: at least the session's
    parallelism (keep every core busy on small inputs), scaled up to
    ~``partition_rows`` rows per partition when the caller supplies a row
    hint — a 10-billion-doc corpus with the default 1M rows/partition runs
    ~10k balanced range tasks and a ~10k-entry offset map. Capped at 32768
    (the offset map is a literal expression; it must stay
    codegen-friendly)."""
    base = max(2, parallelism)
    if n_rows_hint is not None and n_rows_hint > 0:
        base = max(base, -(-n_rows_hint // max(1, partition_rows)))
    return max(2, min(32_768, base))


def pack_shards(
    df: DataFrame,
    key: str,
    tokens_col: str,
    budget: int,
    shard_col: str = "shard_id",
    partition_rows: int = 1_000_000,
    n_rows_hint: int | None = None,
) -> DataFrame:
    """Add ``shard_col`` = floor(exclusive running token sum / budget) in
    ``key`` order. Returns the input columns + shard_col + ``tokens_before``
    (the exclusive prefix sum — useful for in-shard offsets downstream).

    ``n_rows_hint`` (an estimate is fine — callers usually have an exact
    count from the upstream manifest) together with ``partition_rows``
    sizes the range partitions so they track data volume instead of core
    count; without a hint the partition count falls back to the session's
    parallelism, which is right for interactive-scale inputs but
    undersized for a 10B-row corpus — pass the hint there.

    ``key`` must be a TOTAL order (unique values — a doc id, not a url
    that may repeat across captures): tied rows get an arbitrary
    layout-dependent relative order inside the prefix-sum window, which
    breaks the determinism guarantee and the SQL-oracle equivalence.
    Same requirement (and reasoning) as operators/ranking's order
    columns."""
    nparts = 32
    try:
        nparts = _shard_nparts(
            df.sparkSession.sparkContext.defaultParallelism,
            n_rows_hint,
            partition_rows,
        )
    except Exception:
        pass
    srt = (
        df.repartitionByRange(nparts, F.col(key))
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    part_sums = (
        srt.groupBy("_pid")
        .agg(F.sum(F.col(tokens_col)).alias("_t"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(part_sums, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += int(row["_t"] or 0)
    if not offsets:
        srt.unpersist()
        return (
            df.withColumn("tokens_before", F.lit(0).cast("long"))
            .withColumn(shard_col, F.lit(0).cast("long"))
            .limit(0)
        )
    off_expr = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(int(p)) for p in offsets]),
            F.array(*[F.lit(int(o)) for o in offsets.values()]),
        ),
        F.col("_pid"),
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col(key))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_excl = F.coalesce(F.sum(F.col(tokens_col)).over(w), F.lit(0))
    packed = (
        srt.withColumn(
            "tokens_before", (off_expr + local_excl).cast("long")
        )
        .withColumn(
            shard_col, F.floor(F.col("tokens_before") / F.lit(budget)).cast("long")
        )
        .drop("_pid")
    )
    out = packed.localCheckpoint(eager=True)
    srt.unpersist()
    return out


def shard_manifest(packed: DataFrame, tokens_col: str, shard_col: str = "shard_id") -> DataFrame:
    """Per-shard manifest (docs, tokens) — the sink-side bookkeeping a
    writer uses to emit one file per shard."""
    return packed.groupBy(shard_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(tokens_col)).alias("n_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int,
    drop_last_partial: bool = False,
) -> DataFrame:
    """Split each document's token stream into fixed-length training
    windows: (id, seq_no, n_tokens, seq_text), one row per window of
    ``seq_len`` whitespace tokens (the final window is shorter unless
    ``drop_last_partial``). Documents tokenize and split entirely inside
    whole-stage codegen — a narrow map with NO shuffle; 1→N fan-out via
    posexplode, the same shape as multimodal.sample_frames."""
    from crawl4ai_spark.datapipe.textstats import tokens_col

    toks = tokens_col(text_col)
    n_seqs = F.ceil(F.size(toks) / F.lit(float(seq_len))).cast("int")
    # guard: F.sequence(0, -1) DESCENDS, so an empty document must map to
    # an empty window list, not [0, -1]
    windows = F.when(
        n_seqs > 0,
        F.transform(
            F.sequence(F.lit(0), n_seqs - 1),
            lambda i: F.slice(toks, i * seq_len + 1, seq_len),
        ),
    ).otherwise(F.array().cast("array<array<string>>"))
    out = (
        df.withColumn("_w", windows)
        .select(
            id_col, F.posexplode("_w").alias("seq_no", "_seq")
        )
        .select(
            id_col,
            "seq_no",
            F.size("_seq").cast("long").alias("n_tokens"),
            F.array_join("_seq", " ").alias("seq_text"),
        )
    )
    if drop_last_partial:
        out = out.filter(F.col("n_tokens") == seq_len)
    return out
