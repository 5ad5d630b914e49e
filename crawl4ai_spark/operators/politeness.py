"""Per-host politeness budgets as salted window ranks (SURVEY.md §2.7 P1/P6).

The reference rate-limits with per-netloc asyncio sleeps
(async_dispatcher.py:43-83). In a batch iteration of wall-budget T seconds,
that is equivalent to admitting ``floor(T / delay_host)`` URLs per host per
iteration — a deterministic budget (the reference's unseeded RNG is replaced
by fixed delays; the north rule defines parity on the budget, not on sleep
timing).

Scale design: a plain ``Window.partitionBy(host)`` serializes the hot host
into one task (host0 holds ~40% of our corpus by construction). We therefore
rank in two passes:

1. salt pass — rank within (host, salt_bucket), keep ≤ budget per bucket.
   The hot host's rows spread over ``salt`` tasks; each discards all but
   ``budget`` rows, so pass 2 sees ≤ salt·budget rows per host, no matter
   how skewed the input.
2. exact pass — rank within host over the tiny survivor set, keep ≤ budget.

The result is byte-identical to the naive single window (the composition of
per-bucket top-k and global top-k is global top-k, since every global
top-budget row is also in its bucket's top-budget), but the worst task in
pass 1 shrinks by ~salt×. AQE's skew handling covers joins, not windows —
this is the hand-built equivalent for windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def host_budget_rank(
    df: DataFrame,
    order_cols: list[Column | str],
    host: str = "host",
    budget: int | Column = 10,
    salt: int = 16,
    rank_col: str = "host_rank",
    small_input: bool = False,
) -> DataFrame:
    """Adds ``rank_col`` = 1-based politeness rank within host, computed via
    the salted two-pass scheme, and drops rows beyond the budget.

    ``budget`` may be an int (uniform) or a Column (per-host, e.g. joined
    from a host_state table). ``small_input``: the caller KNOWS the input
    row count is bounded (e.g. from the frontier snapshot manifest) — a
    single per-host window, no salt pass; output identical, half the
    shuffles, and even a fully-skewed input fits one task."""
    budget_col = F.lit(budget) if isinstance(budget, int) else budget
    df = df.withColumn("_budget", budget_col)

    if small_input:
        w = Window.partitionBy(host).orderBy(
            *[F.col(c).asc() if isinstance(c, str) else c.asc() for c in order_cols]
        )
        return (
            df.withColumn(rank_col, F.row_number().over(w))
            .filter(F.col(rank_col) <= F.col("_budget"))
            .drop("_budget")
        )

    salt_col = F.pmod(
        F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in order_cols]),
        F.lit(salt),
    )
    df = df.withColumn("_salt", salt_col)
    w1 = Window.partitionBy(host, "_salt").orderBy(
        *[F.col(c).asc() if isinstance(c, str) else c.asc() for c in order_cols]
    )
    pass1 = df.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= F.col("_budget")
    )

    w2 = Window.partitionBy(host).orderBy(
        *[F.col(c).asc() if isinstance(c, str) else c.asc() for c in order_cols]
    )
    out = (
        pass1.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= F.col("_budget"))
        .drop("_salt", "_r1", "_budget")
    )
    return out


def apply_host_budget(
    df: DataFrame,
    order_cols: list[str],
    host: str = "host",
    budget: int | Column = 10,
    salt: int = 16,
) -> DataFrame:
    """Budget-enforced frontier slice (rank column dropped)."""
    return host_budget_rank(df, order_cols, host=host, budget=budget, salt=salt).drop(
        "host_rank"
    )


def evolve_host_state(
    host_state: DataFrame,
    fetch_results: DataFrame,
    max_delay: float = 60.0,
    base_delay: float = 0.5,
) -> DataFrame:
    """Deterministic variant of RateLimiter.update_delay (spec:
    async_dispatcher.py:63-83): any 429/503 on the host this iteration →
    delay = min(delay·2, max); all success → delay = max(base_delay,
    delay·0.75) — the decay floors at the *configured* base delay, so a
    polite base_delay is never eroded by a streak of successes.
    fail_count accumulates / resets.

    ``fetch_results`` needs (host, status_code). Returns the new host_state.

    CONTRACT: ``host_state`` must contain ONLY hosts actually fetched this
    iteration — every input row is evolved, so passing idle hosts decays
    their delay and zeroes their fail_count without any contact (the
    reference's update_delay touches a DomainState only on request).
    This is the hit-only kernel; ``merge_host_state`` below carries the
    full per-iteration protocol (first-seen defaults + hit/idle split)
    and is what the crawl loop and most callers want.
    """
    per_host = fetch_results.groupBy("host").agg(
        F.sum(F.when(F.col("status_code").isin(429, 503), 1).otherwise(0)).alias(
            "throttled"
        )
    )
    joined = host_state.join(per_host, "host", "left").fillna({"throttled": 0})
    return joined.select(
        "host",
        F.when(
            F.col("throttled") > 0,
            F.least(F.col("current_delay") * 2.0, F.lit(max_delay)),
        )
        .otherwise(F.greatest(F.col("current_delay") * 0.75, F.lit(base_delay)))
        .alias("current_delay"),
        F.when(F.col("throttled") > 0, F.col("fail_count") + 1)
        .otherwise(F.lit(0))
        .cast("int")
        .alias("fail_count"),
        (F.col("last_iter") + 1).alias("last_iter"),
    )


def merge_host_state(
    host_state: DataFrame | None,
    fetch_results: DataFrame,
    iteration: int,
    max_delay: float = 60.0,
    base_delay: float = 0.5,
) -> DataFrame:
    """Full per-iteration host-state protocol (the crawl loop's step P2 and
    the oracle the streaming fold is differentially pinned against):

    - hosts first seen this iteration enter at (base_delay, fail_count=0,
      last_iter=iteration);
    - hosts HIT this iteration evolve via ``evolve_host_state``;
    - idle hosts keep their state byte-for-byte (the reference touches a
      DomainState only on request — an idle host's backoff must not erode
      while it is simply not scheduled).

    ``fetch_results`` needs (host, status_code); ``host_state`` is the
    previous state or None on the first iteration."""
    hosts_now = fetch_results.select("host").distinct()
    newly = (
        hosts_now.join(host_state.select("host"), "host", "left_anti")
        if host_state is not None
        else hosts_now
    ).select(
        "host",
        F.lit(base_delay).alias("current_delay"),
        F.lit(0).cast("int").alias("fail_count"),
        F.lit(int(iteration)).cast("long").alias("last_iter"),
    )
    base_state = (
        host_state.unionByName(newly) if host_state is not None else newly
    )
    hit = base_state.join(hosts_now, "host", "left_semi")
    idle = base_state.join(hosts_now, "host", "left_anti")
    return evolve_host_state(
        hit,
        fetch_results.select("host", "status_code"),
        max_delay=max_delay,
        base_delay=base_delay,
    ).unionByName(idle)
