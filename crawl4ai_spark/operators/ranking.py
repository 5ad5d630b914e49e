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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def priority_rank(
    df: DataFrame,
    mode: str = "bfs",
    budget: int | None = None,
    rank_col: str = "visit_rank",
    tiebreak: str = "warc_ts",
) -> DataFrame:
    """Global visit rank. BFS: (depth, score, warc_ts) ASC; best-first:
    (score, depth, warc_ts) ASC (min-score-first). ``budget`` caps rows.

    Scale note: a global row_number has a single-partition window — fine for
    the per-iteration frontier slice (≤ budget·hosts rows after politeness),
    NOT for the raw frontier; always budget per host first.
    """
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
    w = Window.orderBy(*order)
    out = df.withColumn(rank_col, F.row_number().over(w))
    if budget is not None:
        out = out.filter(F.col(rank_col) <= budget)
    return out


def capacity_topk(df: DataFrame, capacity: int, score_col: str = "score") -> DataFrame:
    """Keep the top-``capacity`` rows by score DESC (O4), deterministic
    tie-break on url."""
    w = Window.orderBy(F.col(score_col).desc(), F.col("url").asc())
    return (
        df.withColumn("_cap_rank", F.row_number().over(w))
        .filter(F.col("_cap_rank") <= capacity)
        .drop("_cap_rank")
    )
