"""Priority ranking — the crawl's ordering contract (SURVEY.md §2.6).

The reference's orderings:
- BFS: strict level order (bfs_strategy.py:154-191); within a level the
  arrival order is async-nondeterministic, so the agreed determinization is
  rank over (depth, score, warc_ts) — the north rule's tiebreak.
- Best-first: asyncio.PriorityQueue of (score, depth, url, parent) —
  a MIN-heap, so LOWEST score pops first (bff_strategy.py:138-143). This
  quirk is preserved, not fixed: rank ASC on (score, depth, warc_ts).
- Capacity top-k on discovered links: sort score DESC, take remaining
  capacity (bfs_strategy.py:124-131).

Scale design: every global rank here goes through ``salted_global_topk`` —
the same two-pass scheme as the politeness windows (operators/politeness.py):
a distributed per-bucket top-k first, so the single-partition global window
only ever sees ≤ salt·k survivor rows regardless of input size. The output
is identical to the naive global window (any global top-k row is also in its
bucket's top-k). The residual limit is k itself: an exact global top-k with
k in the many-millions puts salt·k rows through one task — callers bound k
by the remaining page budget per iteration, which the politeness budgets
already cap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_global_topk(
    df: DataFrame,
    order: list[Column],
    k: int,
    hash_on: Column | str,
    salt: int = 16,
    rank_col: str = "_topk_rank",
) -> DataFrame:
    """Exact global top-k with a 1-based ``rank_col``, computed as
    per-bucket top-k (distributed) → global window over ≤ salt·k survivors.
    Buckets are a deterministic hash of ``hash_on`` (pick a high-cardinality
    column, e.g. the url), so reruns rank identically."""
    hash_col = F.col(hash_on) if isinstance(hash_on, str) else hash_on
    bucket = F.pmod(F.xxhash64(hash_col), F.lit(salt))
    w1 = Window.partitionBy("_sb").orderBy(*order)
    pruned = (
        df.withColumn("_sb", bucket)
        .withColumn("_sr", F.row_number().over(w1))
        .filter(F.col("_sr") <= k)
    )
    w2 = Window.orderBy(*order)
    return (
        pruned.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
        .drop("_sb", "_sr")
    )


def priority_rank(
    df: DataFrame,
    mode: str = "bfs",
    budget: int | None = None,
    rank_col: str = "visit_rank",
    tiebreak: str = "warc_ts",
    salt: int = 16,
) -> DataFrame:
    """Global visit rank. BFS: (depth, score, warc_ts) ASC; best-first:
    (score, depth, warc_ts) ASC (min-score-first). ``budget`` caps rows —
    and routes through the salted two-pass top-k so the global window never
    sees the full input. An unbudgeted call is a plain global window: only
    for bounded inputs (tests, final exports)."""
    if mode == "bfs":
        order = [F.col("depth").asc(), F.col("score").asc(), F.col(tiebreak).asc()]
    elif mode == "best_first":
        order = [F.col("score").asc(), F.col("depth").asc(), F.col(tiebreak).asc()]
    elif mode == "dfs":
        # deepest-first (reference dfs_strategy.py stack pop); within a
        # depth the same deterministic (score, tiebreak) order applies
        order = [F.col("depth").desc(), F.col("score").asc(), F.col(tiebreak).asc()]
    else:
        raise ValueError(f"unknown mode: {mode}")
    if budget is not None:
        return salted_global_topk(
            df, order, budget, hash_on=tiebreak, salt=salt, rank_col=rank_col
        )
    return df.withColumn(rank_col, F.row_number().over(Window.orderBy(*order)))


def capacity_topk(
    df: DataFrame, capacity: int, score_col: str = "score", salt: int = 16
) -> DataFrame:
    """Keep the top-``capacity`` rows by score DESC (O4), deterministic
    tie-break on url — salted two-pass, safe on unbounded discovery sets."""
    order = [F.col(score_col).desc(), F.col("url").asc()]
    return salted_global_topk(df, order, capacity, hash_on="url", salt=salt).drop(
        "_topk_rank"
    )
