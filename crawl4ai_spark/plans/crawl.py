"""The frontier iteration loop — BFS / best-first deep crawl as batch
Spark jobs over snapshot tables (SURVEY.md §7 M2; behavioral spec:
/root/reference/crawl4ai/deep_crawling/bfs_strategy.py:142-192 BFS loop,
link_discovery :68-140; bff_strategy.py:129-213 best-first).

One iteration =
  1. rank the frontier        — per-host politeness budget then global
                                priority rank (depth,score,ts); salted
                                two-pass windows above salt_bypass_rows,
                                plain windows below (the frontier row count
                                is carried in the snapshot manifest, so the
                                choice costs no job)
  2. robots gate              — broadcast join + can_fetch UDF, fail-open;
                                blocked rows become 403 results, never retried
  3. fetch                    — LEFT JOIN against the pages table (the web
                                is a table here); unmatched rows = 404
  4. extract                  — scrape/markdown Arrow UDFs (plans/extract)
  5. link discovery           — explode links, T2-normalize, validity +
                                filter chain, score, threshold, capacity top-k
  6. dedup                    — bloom pre-filter + exact anti-join vs seen
                                (seen = ENQUEUED set, as in the reference:
                                visited.add happens at enqueue, not fetch)
  7. commit                   — results/seen appends + frontier replace
                                submitted CONCURRENTLY (separate tables,
                                separate manifests — wall time ≈ the
                                slowest write, not the sum); the lineage
                                rows were already collected alongside the
                                counters, so they commit as a driver-side
                                pyarrow write with NO Spark job. The
                                iteration number in the manifest is the
                                resume point.

Job budget per iteration: ONE fetch+extract job (which also materializes
the ranked slice — the rank needs no count job of its own because the
frontier row count rides in the snapshot manifest and upper-bounds every
sizing decision), ONE discover+dedup job, plus the 3 concurrent snapshot
writes; a capacity re-rank adds one job only in the over-budget case.

Determinism: every ordering is a rank over (depth, score, warc_ts) /
(score, depth, warc_ts) per the north rule; duplicate discoveries collapse
to min(depth) with lexicographic-min parent tie-break (reference records
first-discovery depth, bff_strategy.py:209 — async arrival order is
nondeterministic there, min() is the agreed determinization).

Scale: no driver-side loops over rows — the driver only runs the iteration
while-loop and reads scalar counters. Joins: pages join is the big one
(AQE skew-split enabled; frontier side is budget-bounded so it broadcasts
when small). Seen anti-join is bloom-pre-filtered. Politeness windows are
salted. Everything else is narrow.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.functions.urlnorm import normalize_deep_udf
from crawl4ai_spark.functions.urls import host_col, url_valid_col
from crawl4ai_spark.operators.capture import latest_capture
from crawl4ai_spark.operators.politeness import host_budget_rank, merge_host_state
from crawl4ai_spark.operators.ranking import capacity_topk, priority_rank
from crawl4ai_spark.operators.robots import apply_robots_gate
from crawl4ai_spark.operators.seen import build_bloom, dedup_against_seen
from crawl4ai_spark.plans.extract import extract_udf
from crawl4ai_spark.sources.snapshots import SnapshotTable


@dataclass
class CrawlConfig:
    mode: str = "bfs"  # 'bfs' | 'best_first'
    max_pages: int = 100
    max_depth: int = 10
    host_budget: int = 10  # URLs per host per iteration (politeness)
    iteration_budget: int | None = None  # global cap per iteration (best-first BATCH_SIZE analog)
    salt: int = 16
    score_threshold: float = float("-inf")
    include_external: bool = False
    check_robots: bool = True
    # URL-seen pre-filter backend (the north rule's "bloom/cuckoo"):
    # 'bloom'  — OR-mergeable bitsets (operators/seen.py), cheapest build;
    # 'cuckoo' — 16-bit-fingerprint cuckoo tables (operators/cuckoo.py),
    #            ~80x lower FPP at comparable memory and DELETABLE, so a
    #            TTL/recrawl policy can expire seen URLs in place.
    # Both are pre-filters ahead of the same exact anti-join, so the crawl's
    # visit order and seen set are byte-identical under either backend.
    seen_filter: str = "bloom"
    bloom_bits: int = 1 << 23
    # initial cuckoo size: x4 slots ≈ 1.76M keys at the paper's 0.84
    # safe-load watermark (operators/cuckoo.py SAFE_LOAD). A dial, not a
    # cap — the crawl auto-grows past it: full builds size at
    # buckets_for(n_seen) and a filter whose load crosses the watermark
    # after an incremental merge is rebuilt at the next power of two, so
    # the saturated-table regime (eviction-chain exhaustion, unbounded
    # overflow spill) is never entered no matter how long the crawl runs
    cuckoo_buckets: int = 1 << 19
    # fetch join: broadcast the frontier slice only below this row count —
    # an unbudgeted iteration (iteration_budget=None, huge max_pages) must
    # degrade to a shuffle join instead of OOMing the driver with a hinted
    # broadcast that bypasses autoBroadcastJoinThreshold
    broadcast_frontier_max: int = 200_000
    # below this seen-set size the bloom pre-filter costs more than the
    # anti-join it short-circuits; at 10^10 URLs it is always on
    bloom_min_seen: int = 200_000
    # below this frontier size the salted two-pass windows cost more in
    # extra shuffle rounds than the skew they prevent — use plain windows
    # (the frontier count is known from the manifest, so this is free)
    salt_bypass_rows: int = 100_000
    # extra filter Columns applied to discovered candidate urls
    filter_conditions: list = field(default_factory=list)
    # scorer: callable(url Column) -> score Column; default 0.0 (BFS order)
    scorer: Callable | None = None
    # the caller guarantees the pages table has ONE capture per url —
    # skips the per-iteration latest-capture aggregate on the fetch slice
    # (multi-capture WARC corpora must leave this False)
    pages_unique: bool = False
    # adaptive politeness (P2): per-host budget = floor(iteration_window /
    # current_delay), delays evolving per the deterministic RateLimiter
    # variant (429/503 ⇒ ×2 clamped at max_delay; success ⇒ ×0.75 floored)
    adaptive_politeness: bool = False
    iteration_window: float = 30.0  # simulated wall budget per iteration (s)
    base_delay: float = 1.0
    max_delay: float = 60.0
    # snapshots retained on the REPLACE-per-iteration tables (frontier,
    # host_state): each iteration leaves a full dead copy behind, so a
    # 10k-iteration crawl would hold 10k frontier copies on disk without
    # expiry. Resume reconciliation only ever inspects the trailing
    # record per table, so any value >= 2 is crash-safe; the default
    # keeps a few extra for time-travel debugging. None = retain all.
    snapshot_retention: int | None = 8


def _zero_scorer(url_col):
    return F.lit(0.0)


def _parts(n: int) -> int:
    """Coalesce small snapshot writes: a snapshot read at iteration k
    unions k data dirs, so file count per dir must track data size, not
    shuffle parallelism (at cluster scale the same knob is Iceberg
    write.target-file-size)."""
    return max(1, min(32, n // 50_000 + 1))


class CrawlRun:
    """A resumable crawl over snapshot tables rooted at ``workdir``."""

    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        robots: DataFrame | None,
        seeds: DataFrame,
        workdir: str,
        config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.pages = pages
        self.robots = robots
        self.seeds = seeds
        self.config = config or CrawlConfig()
        if self.config.seen_filter not in ("bloom", "cuckoo"):
            # fail at construction, not at the first over-threshold
            # iteration minutes into a run
            raise ValueError(
                f"unknown seen_filter: {self.config.seen_filter!r} "
                "(expected 'bloom' or 'cuckoo')"
            )
        self.t_frontier = SnapshotTable(os.path.join(workdir, "frontier"))
        self.t_seen = SnapshotTable(os.path.join(workdir, "seen"))
        self.t_results = SnapshotTable(os.path.join(workdir, "results"))
        self.t_lineage = SnapshotTable(os.path.join(workdir, "lineage"))
        self.t_host_state = SnapshotTable(os.path.join(workdir, "host_state"))
        self.scorer = self.config.scorer or _zero_scorer
        # the current iteration's bloom-bitset broadcast: created in step 6,
        # destroyed at the end of the SAME iteration (all jobs that read it
        # have committed by then) — holding it any longer leaks one dead
        # ~1 MiB broadcast per iteration on driver and executors
        self._bloom_bc = None
        # the URL-seen pre-filter (BloomFilterSet or CuckooFilterSet per
        # config.seen_filter), maintained INCREMENTALLY across iterations:
        # built full once (first threshold crossing or resume), then each
        # iteration merges in only its own new keys. May hold EXTRA keys
        # relative to the committed seen table after a rolled-back
        # iteration — harmless by construction (a filter positive still
        # passes through the exact anti-join); it can never be missing a
        # committed key (the merge precedes the commit point)
        self._seen_filter = None
        # current cuckoo geometry dial: starts at the config value, grows
        # (never shrinks) when a full build sizes for a larger seen set or
        # an incremental merge pushes the load factor past the safe
        # watermark — see _filter_build_full / the post-merge grow check
        self._cuckoo_num_buckets = self.config.cuckoo_buckets
        # every frame run_iteration persists, so the failure path can
        # release them too — without this a raise mid-iteration (fetch
        # error, commit race, fail-loud fan-out guard) strands up to six
        # cached frames per attempt in executor memory, and a driver that
        # retries in-process accumulates them without bound
        self._iter_caches: list = []

    def _cache(self, df):
        """persist + track for the run_iteration finally-release."""
        df = df.persist()
        self._iter_caches.append(df)
        return df

    def _release_iter_caches(self) -> None:
        for df in self._iter_caches:
            try:
                df.unpersist()
            except Exception:
                pass  # session torn down mid-failure: nothing to release
        self._iter_caches.clear()

    def _reconcile(self, next_iteration: int) -> None:
        """Resume-time crash reconciliation. The commit protocol orders
        every iteration-tagged manifest commit (results, lineage, seen,
        host_state — all ``meta={'iteration': N}``) BEFORE the frontier
        replace that advances to N+1, so after a crash the frontier's
        iteration K is the WAL tip: any trailing snapshot on the other
        tables tagged >= K belongs to a crashed, uncommitted iteration.
        Roll those back before re-running iteration K — its deterministic
        re-execution would otherwise double-append identical results and
        lineage rows (duplicate visit_order values, doubled counters)."""
        for t in (self.t_results, self.t_lineage, self.t_seen, self.t_host_state):
            t.rollback_trailing(
                lambda m: m.get("iteration", -(10**9)) >= next_iteration
            )
            # everything that survived reconciliation is consistent with
            # the frontier WAL tip, hence durable: advance the stream
            # barrier so a crash AFTER the frontier commit but BEFORE the
            # previous iteration's mark_durable calls cannot strand its
            # rows undelivered (no-op when the barrier is already current)
            t.mark_durable()

    def _destroy_bloom_bc(self) -> None:
        if self._bloom_bc is not None:
            try:
                self._bloom_bc.destroy()
            finally:
                self._bloom_bc = None

    # -- seen-filter backend dispatch ------------------------------------------
    # ONE decision surface for cfg.seen_filter so the build / incremental /
    # probe paths cannot drift apart: every backend-conditional in the
    # iteration goes through these four helpers.

    def _filter_build_full(self, seen_df, n_seen: int):
        """Full O(n_seen) build — once per process (first threshold
        crossing, resume, or post-grow rebuild). The cuckoo sizes itself
        for the CURRENT cardinality (never below the config dial, never
        shrinking), so a resume against a seen set that outgrew the dial
        starts at a healthy load factor instead of a saturated table."""
        if self.config.seen_filter == "cuckoo":
            from crawl4ai_spark.operators.cuckoo import (
                build_cuckoo,
                buckets_for,
            )

            self._cuckoo_num_buckets = max(
                self._cuckoo_num_buckets, buckets_for(n_seen)
            )
            return build_cuckoo(
                seen_df,
                num_buckets=self._cuckoo_num_buckets,
                hash_col="url_hash",
            )
        return build_bloom(
            seen_df, num_bits=self.config.bloom_bits, hash_col="url_hash"
        )

    def _filter_build_partial(self, new_df):
        """O(new) build of ONLY this iteration's keys, at the live
        filter's exact geometry (merge requires it — the full build may
        have sized past the config dial)."""
        cur = self._seen_filter
        if self.config.seen_filter == "cuckoo":
            from crawl4ai_spark.operators.cuckoo import build_cuckoo

            return build_cuckoo(
                new_df, num_buckets=cur.num_buckets, hash_col="url_hash"
            )
        return build_bloom(
            new_df,
            num_bits=cur.num_bits,
            num_hashes=cur.num_hashes,
            hash_col="url_hash",
        )

    def _filter_payload(self):
        """Serialized filter state for the per-iteration broadcast."""
        if self.config.seen_filter == "cuckoo":
            return self._seen_filter.to_bytes()
        return self._seen_filter.bits.tobytes()

    def _filter_probe_col(self):
        """Probe Column over the current broadcast (``self._bloom_bc``)."""
        if self.config.seen_filter == "cuckoo":
            from crawl4ai_spark.operators.cuckoo import (
                cuckoo_maybe_contains_col,
            )

            return cuckoo_maybe_contains_col(
                self.spark,
                self._seen_filter,
                F.col("url_norm"),
                state_bc=self._bloom_bc,
            )
        from crawl4ai_spark.operators.seen import bloom_maybe_contains_col

        return bloom_maybe_contains_col(
            self.spark,
            self._seen_filter,
            F.col("url_norm"),
            bits_bc=self._bloom_bc,
        )

    def _filter_grow_check(self) -> None:
        """Post-merge saturation check (cuckoo only — a bloom degrades
        gracefully to a higher FPP, a saturated cuckoo falls off a cliff:
        scalar eviction chains + unbounded overflow spill). Crossing the
        watermark drops the in-memory filter and doubles the geometry
        dial, so the NEXT iteration's full rebuild — O(total), but at
        geometrically-spaced sizes, hence amortized O(1) per key — starts
        from a healthy load factor."""
        if (
            self.config.seen_filter == "cuckoo"
            and self._seen_filter is not None
            and self._seen_filter.needs_grow()
        ):
            self._cuckoo_num_buckets = 2 * self._seen_filter.num_buckets
            self._seen_filter = None

    # -- state ---------------------------------------------------------------

    def state(self) -> dict:
        meta = self.t_frontier.snapshot_meta() or {}
        return {
            "iteration": meta.get("iteration", -1),
            # pages_crawled counts SUCCESSFUL crawls only — the reference's
            # budget semantics (bfs_strategy.py:172-174 "count only
            # successful crawls"); robots-403 and 404 rows are result rows
            # but never consume max_pages
            "pages_crawled": meta.get("pages_crawled", 0),
            # n_visited counts ALL result rows (the dense visit_order base;
            # pre-split snapshots carried the combined counter under
            # pages_crawled, which is the correct fallback for both)
            "n_visited": meta.get("n_visited", meta.get("pages_crawled", 0)),
            # row counters carried in snapshot meta so the driver loop never
            # runs count() jobs just to decide control flow
            "n_frontier": meta.get("n_frontier"),
            "n_seen": meta.get("n_seen", 0),
        }

    def _bootstrap(self) -> None:
        """Iteration -1 → 0: seed the frontier and the seen set.

        Fast path: a seed list is CONFIG-sized (the reference takes a
        Python list of URLs), so up to ``broadcast_frontier_max`` rows the
        normalize+dedup runs driver-side with the same
        ``normalize_url_for_deep_crawl`` the Arrow UDF wraps — one bounded
        collect and zero shuffles, where the distributed
        UDF→dropDuplicates chain costs several seconds of first-shuffle
        plan compilation for a few hundred rows. Beyond the threshold
        (a resumed mega-frontier injected as "seeds") the distributed
        path with identical semantics takes over."""
        cfg = self.config
        # ONE probe job decides the path AND (on the fast path) delivers the
        # rows: limit(max+1).collect() — if it returns ≤ max rows that IS
        # the whole seed list, so the separate count() job the old protocol
        # paid is folded away; > max rows means "mega-frontier", take the
        # distributed path (the over-fetch is bounded at max+1 rows)
        probe = self.seeds.select("url").limit(cfg.broadcast_frontier_max + 1).collect()
        if len(probe) <= cfg.broadcast_frontier_max:
            from crawl4ai_spark.functions.urlnorm import (
                normalize_url_for_deep_crawl,
            )

            # min-url-wins representative per normalized key: seed lists
            # carry no order column, so "first in list" has no distributed
            # equivalent — min(url) is the choice BOTH paths can compute
            # deterministically (layout-independent on the big path)
            dedup: dict[str, str] = {}
            for r in probe:
                u = r["url"]
                norm = normalize_url_for_deep_crawl(u, u)
                prev = dedup.get(norm)
                if prev is None or u < prev:
                    dedup[norm] = u
            # one explicit slice: createDataFrame(list) parallelizes into
            # defaultParallelism slices, and coalesce(1) would then fuse
            # them into ONE task that runs all those Python partition
            # computations SERIALLY (~8 s for 32 slices on a warm session);
            # parallelize(data, 1) does the same work in a single pass
            local = self.spark.createDataFrame(
                self.spark.sparkContext.parallelize(
                    [(u, n) for n, u in dedup.items()], 1
                ),
                "url string, url_norm string",
            )
            seeds = local.select(
                "url",
                "url_norm",
                host_col(F.col("url")).alias("host"),
                F.lit(0).alias("depth"),
                F.lit(0.0).alias("score"),
                F.lit(None).cast("string").alias("parent_url"),
                F.lit(0).alias("discovered_iter"),
            )
            seeds = self._cache(seeds)
            n_seeds = len(dedup)
            cached = seeds
        else:
            # keep the normalize UDF + dedup distributed (a resumed
            # mega-frontier is exactly the case one task can't hold);
            # size the snapshot files by row count after the fact.
            # groupBy+min(url) instead of dropDuplicates: same single
            # shuffle (with map-side partial agg), but the representative
            # is deterministic and identical to the fast path's min-wins
            seeds = (
                self.seeds.select(
                    F.col("url"),
                    normalize_deep_udf(F.col("url"), F.col("url")).alias(
                        "url_norm"
                    ),
                )
                .groupBy("url_norm")
                .agg(F.min("url").alias("url"))
                .select(
                    "url",
                    "url_norm",
                    host_col(F.col("url")).alias("host"),
                    F.lit(0).alias("depth"),
                    F.lit(0.0).alias("score"),
                    F.lit(None).cast("string").alias("parent_url"),
                    F.lit(0).alias("discovered_iter"),
                )
            )
            cached = self._cache(seeds)
            n_seeds = cached.count()
            seeds = cached.coalesce(max(1, min(32, n_seeds // 50_000 + 1)))
        # two-phase commit off the shared cache: the DATA writes (the Spark
        # jobs) run concurrently into invisible staging dirs, then the O(1)
        # manifest commits land seen-first, frontier-LAST — the frontier
        # replace is the bootstrap's atomic commit point. A crash between
        # the two leaves the frontier at iteration -1, so a resumed run
        # simply re-bootstraps (replace is idempotent); the reverse order
        # would leave a committed frontier over an EMPTY seen set and the
        # seeds would be re-crawlable as later discoveries.
        with ThreadPoolExecutor(max_workers=2) as pool:
            f1 = pool.submit(self.t_frontier.stage, seeds)
            f2 = pool.submit(
                self.t_seen.stage,
                seeds.select("url_norm", F.xxhash64("url_norm").alias("url_hash"),
                             "depth", F.lit(0).alias("first_iter")),
            )
            frontier_dir = f1.result()
            seen_dir = f2.result()
        self.t_seen.commit_staged(
            seen_dir, {"iteration": -1}, mode="replace", durable=False
        )
        self.t_frontier.commit_staged(
            frontier_dir,
            {"iteration": 0, "pages_crawled": 0, "n_visited": 0,
             "n_frontier": n_seeds, "n_seen": n_seeds},
            mode="replace",
        )
        self.t_seen.mark_durable()
        cached.unpersist()

    # -- one iteration ---------------------------------------------------------

    def run_iteration(self) -> dict:
        """Run one frontier iteration; returns counters (empty frontier →
        {'done': True}).

        Wraps the body so EVERY exit — the done/early returns, the
        fail-loud guards, and any Spark job failure — releases the
        iteration's persisted frames and the bloom bitset broadcast. The
        success path's targeted unpersists stay (they free memory as soon
        as each frame is consumed, not at iteration end); the finally is
        the backstop that makes an in-process retry after a failure start
        from a clean executor-memory slate. Nothing committed is touched:
        crash reconciliation handles the snapshot side."""
        try:
            return self._run_iteration_body()
        finally:
            self._release_iter_caches()
            self._destroy_bloom_bc()

    def _run_iteration_body(self) -> dict:
        cfg = self.config
        st = self.state()
        if st["iteration"] < 0:
            self._bootstrap()
            st = self.state()
        else:
            # resumed workdir OR in-process retry after a failed commit:
            # roll back any crashed iteration's orphan commits before
            # re-running it. Runs every entry — it is 4 driver-side JSON
            # manifest reads (no Spark job) and a no-op on the clean path.
            self._reconcile(st["iteration"])
        iteration = st["iteration"]
        pages_crawled = st["pages_crawled"]
        visit_base = st["n_visited"]
        remaining = cfg.max_pages - pages_crawled
        if remaining <= 0:
            return {"done": True, "reason": "max_pages"}

        if st["n_frontier"] == 0:
            return {"done": True, "reason": "frontier_empty"}
        frontier = self.t_frontier.read(self.spark)
        if frontier is None or (st["n_frontier"] is None and frontier.isEmpty()):
            return {"done": True, "reason": "frontier_empty"}
        n_frontier = st["n_frontier"]
        if n_frontier is None:  # pre-counter snapshot (resume of an old run)
            n_frontier = frontier.count()
        t0 = time.time()
        prof: dict[str, float] = {}

        def _lap(label: str, since: float) -> float:
            now = time.time()
            prof[label] = round(now - since, 2)
            return now

        t = t0

        # warc_ts is a property of the PAGE; the frontier doesn't know it
        # yet. The deterministic stand-in for ranking is the url itself
        # (unique, stable); a production frontier carries last-seen warc_ts.
        # ``sort_depth`` carries the mode's depth direction (dfs = deepest
        # first) so the salted host window can hash/order plain columns.
        frontier = frontier.withColumn("warc_ts_hint", F.col("url")).withColumn(
            "sort_depth",
            -F.col("depth") if cfg.mode == "dfs" else F.col("depth"),
        )
        order_cols = (
            ["score", "sort_depth", "warc_ts_hint"]
            if cfg.mode == "best_first"
            else ["sort_depth", "score", "warc_ts_hint"]
        )

        # 1. politeness budget per host, then global rank + iteration
        #    budget. The frontier row count from the manifest picks the
        #    window regime (plain below salt_bypass_rows, salted two-pass
        #    above) and upper-bounds every sizing decision below — so the
        #    ranked slice needs NO count job of its own; it materializes
        #    inside the fetch+extract job and the exact selected count
        #    falls out of that job's counters (n_results). With
        #    adaptive_politeness the budget is per-host:
        #    floor(iteration_window / current_delay) from the host_state
        #    table (P1+P2), else a uniform constant.
        small = n_frontier <= cfg.salt_bypass_rows
        hs_df = self.t_host_state.read(self.spark) if cfg.adaptive_politeness else None
        if cfg.adaptive_politeness:
            if hs_df is not None:
                # NO forced broadcast: host_state is a parquet scan, so
                # Catalyst's size stats (+ AQE at runtime) broadcast it
                # while it fits autoBroadcastJoinThreshold and degrade to
                # a shuffled join beyond — a forced hint would OOM the
                # driver once the distinct-host set outgrows memory
                # (100M-host crawls), and unlike the frontier mid-plan
                # there is no row-count hint cheaper than the scan stats
                aug = frontier.join(
                    hs_df.select("host", "current_delay"), "host", "left"
                )
            else:
                aug = frontier.withColumn(
                    "current_delay", F.lit(None).cast("double")
                )
            delay = F.coalesce(F.col("current_delay"), F.lit(cfg.base_delay))
            budget_col = F.greatest(
                F.lit(1).cast("long"),
                F.floor(F.lit(cfg.iteration_window) / delay),
            )
            budgeted = host_budget_rank(
                aug, order_cols, host="host", budget=budget_col, salt=cfg.salt,
                small_input=small,
            ).drop("current_delay")
        else:
            budgeted = host_budget_rank(
                frontier, order_cols, host="host", budget=cfg.host_budget,
                salt=cfg.salt, small_input=small,
            )
        global_budget = min(remaining, cfg.iteration_budget or remaining)
        selected = priority_rank(
            budgeted, mode=cfg.mode, budget=global_budget, tiebreak="warc_ts_hint",
            small_input=small,
        )
        selected = self._cache(selected.drop("warc_ts_hint", "sort_depth"))
        # upper bound on the slice size — exact count comes back with the
        # fetch counters
        ub_selected = min(n_frontier, global_budget)
        # partitions for the Python-UDF stages: track the slice size, not
        # spark.sql.shuffle.partitions — a page costs ~10-30 ms of Python
        # and workers are reused after first spawn, so ~16 pages/partition
        # keeps the extract stage wide without per-task overhead dominating
        par = self.spark.sparkContext.defaultParallelism
        nparts = max(1, min(par * 4, (ub_selected + 15) // 16))

        # 2. robots gate (fail-open; blocked → 403 results, not retried)
        if cfg.check_robots and self.robots is not None:
            gated = apply_robots_gate(selected, self.robots)
        else:
            gated = selected.withColumn("robots_allowed", F.lit(True))
        gated = self._cache(gated)
        blocked = gated.filter(~F.col("robots_allowed"))
        allowed = gated.filter(F.col("robots_allowed"))

        # 3. fetch (J6). Semantically a LEFT join frontier ⟕ pages, but a
        #    left join can only broadcast its RIGHT side — at 100 TB the
        #    pages table never broadcasts and the whole corpus would
        #    shuffle. Instead: semi-join the corpus down to the slice's
        #    rows (broadcasting only the narrow url list, and only while
        #    the slice is provably small — the manifest row count and the
        #    iteration budget upper-bound it without a count job), then a
        #    small⟕small left join recovers the misses as NULL page rows.
        #    One pages-scan node in the plan; above the broadcast threshold
        #    both joins degrade to shuffles and AQE picks the strategy.
        probe = allowed.select("url")
        if ub_selected <= cfg.broadcast_frontier_max:
            probe = F.broadcast(probe)
        relevant = self.pages.join(probe, on="url", how="left_semi")
        #    The pages table is caller-supplied and may hold SEVERAL
        #    captures per URL (normal in WARC corpora). The left join must
        #    stay 1:1 per selected URL — a fan-out here inflates
        #    n_results/n_selected, drives n_deferred negative, and writes
        #    corrupt counters into the manifest (which frontier_empty
        #    termination and broadcast sizing read). Collapse the
        #    semi-joined slice (small — bounded by the iteration budget ×
        #    captures-per-url) to the latest capture per url; the full-row
        #    lexicographic max breaks warc_ts ties deterministically.
        #    ``pages_unique=True`` skips the aggregate when the caller
        #    guarantees one capture per url.
        if not cfg.pages_unique:
            relevant = latest_capture(relevant, "url")
        fetched = allowed.join(relevant, on="url", how="left")
        # the broadcast-join output keeps the pages table's partitioning, so
        # the extract UDF is already wide; an explicit repartition (a full
        # extra exchange stage) only pays for itself when the slice is big
        # enough that per-page Python time dominates stage overhead
        if ub_selected > 4 * 16 * par:
            fetched = fetched.repartition(nparts)
        fetched = fetched.withColumn(
            "status_code", F.when(F.col("html").isNotNull(), 200).otherwise(404)
        )

        # 4. extract — ONE fused Arrow pandas UDF (scrape+markdown in a
        #    single Python round trip); only rows with a body
        extracted = fetched.withColumn(
            "x",
            F.when(
                F.col("status_code") == 200, extract_udf(F.col("html"), F.col("url"))
            ),
        )

        results = extracted.select(
            "url", "url_norm", "host", "depth", "score", "parent_url",
            "status_code",
            F.col("warc_ts"),
            F.col("x.cleaned_html").alias("cleaned_html"),
            F.col("x.text").alias("text"),
            F.col("x.links").alias("links"),
            F.col("x.metadata").alias("metadata"),
            F.col("x.lang").alias("lang"),
            F.col("x.raw_markdown").alias("raw_markdown"),
            F.col("x.fit_markdown").alias("fit_markdown"),
            F.col("visit_rank"),
            (F.col("status_code") == 200).alias("success"),
        ).unionByName(
            blocked.select(
                "url", "url_norm", "host", "depth", "score", "parent_url",
                F.lit(403).alias("status_code"),
                F.lit(None).cast("timestamp").alias("warc_ts"),
                F.lit(None).cast("string").alias("cleaned_html"),
                F.lit(None).cast("string").alias("text"),
                F.lit(None).cast(
                    "array<struct<href:string,text:string,title:string,base_domain:string,is_external:boolean,intrinsic_score:double>>"
                ).alias("links"),
                F.lit(None).cast("map<string,string>").alias("metadata"),
                F.lit(None).cast("string").alias("lang"),
                F.lit(None).cast("string").alias("raw_markdown"),
                F.lit(None).cast("string").alias("fit_markdown"),
                F.col("visit_rank"),
                F.lit(False).alias("success"),
            )
        )
        results = results.withColumn("iteration", F.lit(iteration)).withColumn(
            "visit_order", F.lit(visit_base) + F.col("visit_rank")
        ).drop("visit_rank")
        results = self._cache(results)
        # ONE job yields both the scalar counters and the per-partition
        # fetch lineage (the collected set is ≤ #partitions rows)
        fetch_parts = results.groupBy(
            F.spark_partition_id().alias("partition_id")
        ).agg(
            F.count(F.lit(1)).alias("urls_in"),
            F.sum(F.col("success").cast("long")).alias("fetched"),
            F.sum((F.col("status_code") == 403).cast("long")).alias("robots_blocked"),
        ).collect()
        n_results = sum(r["urls_in"] for r in fetch_parts)
        n_fetched = sum(r["fetched"] or 0 for r in fetch_parts)
        n_blocked = sum(r["robots_blocked"] or 0 for r in fetch_parts)
        n_selected = n_results  # every selected row becomes a result row
        t = _lap("fetch_extract", t)
        if n_selected == 0:
            # defensive: a ≥1-per-host budget on a non-empty frontier always
            # selects rows, so this only fires on a degenerate config;
            # nothing was committed, so the snapshot state is untouched
            for df in (selected, gated, results):
                df.unpersist()
            return {"done": True, "reason": "budget_zero"}

        # P2: evolve per-host delays from this iteration's statuses
        # (merge_host_state: first-seen hosts enter at base delay, hit
        # hosts evolve, idle hosts keep their delay — the reference
        # touches DomainState on request). Built here, committed in the
        # step-7 concurrent pool — a synchronous replace would add one
        # serial job per iteration.
        if cfg.adaptive_politeness:
            new_state = merge_host_state(
                hs_df,
                results.select("host", "status_code"),
                iteration,
                max_delay=cfg.max_delay,
                base_delay=cfg.base_delay,
            )
        else:
            new_state = None

        # 5. link discovery
        discovered = (
            results.filter("success")
            .filter(F.col("depth") < cfg.max_depth)
            .select(
                F.col("url").alias("parent_url"),
                F.col("depth").alias("parent_depth"),
                F.explode("links").alias("link"),
            )
        )
        if not cfg.include_external:
            discovered = discovered.filter(~F.col("link.is_external"))
        candidates = discovered.select(
            F.col("link.href").alias("url"),
            normalize_deep_udf(F.col("link.href"), F.col("parent_url")).alias("url_norm"),
            (F.col("parent_depth") + 1).alias("depth"),
            F.col("parent_url"),
        )
        candidates = candidates.filter(url_valid_col(F.col("url")))
        for cond_fn in cfg.filter_conditions:
            candidates = candidates.filter(cond_fn(F.col("url")))

        # duplicate discoveries within the iteration → first-writer-wins:
        # min depth, then lexicographic min parent (deterministic)
        candidates = candidates.groupBy("url_norm").agg(
            F.min_by("url", F.struct("depth", "parent_url", "url")).alias("url"),
            F.min("depth").alias("depth"),
            F.min_by("parent_url", F.struct("depth", "parent_url")).alias("parent_url"),
        )
        # score the chosen representative URL (scorers are pure URL fns)
        candidates = candidates.withColumn("score", self.scorer(F.col("url")))
        if cfg.score_threshold != float("-inf"):
            candidates = candidates.filter(F.col("score") >= cfg.score_threshold)

        # 6. dedup vs seen (exact anti-join; bloom/cuckoo pre-filter once
        #    the seen set is big enough that skipping the join shuffle pays
        #    for the filter build+broadcast). The backend choice
        #    (cfg.seen_filter) cannot change results — both filters are
        #    no-false-negative pre-filters ahead of the same exact join —
        #    only the FPP/memory/deletability trade.
        seen_df = self.t_seen.read(self.spark)
        flagged = None
        if seen_df is not None and st["n_seen"] >= cfg.bloom_min_seen:
            if self._seen_filter is None:
                # INCREMENTAL maintenance: this full O(n_seen) build runs
                # once per process (first threshold crossing, resume, or a
                # post-grow rebuild); afterwards each iteration merges in
                # only its own new keys (see the partial build below), so
                # the per-iteration filter cost is O(new), not O(total) —
                # at a 10^10-URL seen set the difference is the whole job.
                # The seen table stores url_hash = xxhash64(url_norm) at
                # every append precisely so these builds scan 8-byte longs
                # (one pruned column) instead of re-hashing url strings.
                self._seen_filter = self._filter_build_full(
                    seen_df, st["n_seen"]
                )
            self._bloom_bc = self.spark.sparkContext.broadcast(
                self._filter_payload()
            )
            probe = self._filter_probe_col()
            # pre-compute the filter probe ONCE under a persist: the split
            # inside dedup_against_seen consumes the candidate plan twice,
            # and without this boundary the Arrow probe UDF (plus the
            # post-exchange aggregate above it) would run once per branch.
            # The persist costs NO extra job — the disc_parts count below
            # materializes it on the way to the downstream cache — and is
            # released as soon as that count returns.
            flagged = candidates.withColumn("_maybe_seen", probe)
            flagged = self._cache(flagged)
            candidates = flagged
        new_urls = dedup_against_seen(
            candidates, seen_df, seen_unique=True,
            flag_col="_maybe_seen" if flagged is not None else None,
        )

        # capacity top-k: if more new URLs than remaining SUCCESS budget
        # (reference counts only successful crawls toward max_pages), keep
        # the best (O4 semantics): score DESC in bfs/dfs — the reference
        # BFS trim sorts valid_links DESC (bfs_strategy.py:124-130) — and
        # score ASC in best_first, whose min-heap pops lowest-score-first,
        # so the trim must keep the rows the queue would pop FIRST (the
        # reference bff trim slices nondeterministic async arrival order;
        # queue-priority order is the deterministic stand-in). Deterministic
        # url tie-break. Count first so the common under-capacity case
        # skips the rank entirely; over capacity, the salted two-pass top-k
        # keeps the global window off the full discovery set (scale fix —
        # the naive global Window here serialized millions of rows into one
        # task).
        candidates = (
            new_urls.withColumn("host", host_col(F.col("url")))
            .withColumn("discovered_iter", F.lit(iteration + 1))
            .select(
                "url", "url_norm", "host", "depth", "score", "parent_url",
                "discovered_iter",
            )
        )
        candidates = self._cache(candidates)
        # one job: candidate count AND per-partition discover lineage
        disc_parts = candidates.groupBy(
            F.spark_partition_id().alias("partition_id")
        ).agg(F.count(F.lit(1)).alias("emitted")).collect()
        n_candidates = sum(r["emitted"] for r in disc_parts)
        if flagged is not None:
            # downstream consumers all read the candidates cache just
            # materialized above; the flagged intermediate is done
            flagged.unpersist()
        remaining_after = remaining - n_fetched
        # seen = ENQUEUED-OR-CONSIDERED set, as in the reference: visited.add
        # runs BEFORE the capacity slice (bfs_strategy.py:121 vs :124-130),
        # so capacity-dropped links are permanently seen and never
        # re-enqueued by a later iteration that re-links them. Only the
        # exhausted-budget early return (capacity <= 0) skips the adds.
        if remaining_after <= 0:
            new_urls, n_new = candidates.limit(0), 0
            n_seen_add, seen_src = 0, new_urls
            disc_parts = []
        elif n_candidates > remaining_after:
            new_urls = capacity_topk(
                candidates, remaining_after, salt=cfg.salt,
                small_input=n_candidates <= cfg.salt_bypass_rows,
                ascending=cfg.mode == "best_first",
            )
            new_urls = self._cache(new_urls)
            n_new = remaining_after  # row_number ≤ k keeps exactly k rows
            n_seen_add, seen_src = n_candidates, candidates
            disc_parts = new_urls.groupBy(
                F.spark_partition_id().alias("partition_id")
            ).agg(F.count(F.lit(1)).alias("emitted")).collect()
        else:
            new_urls, n_new = candidates, n_candidates
            n_seen_add, seen_src = n_candidates, candidates
        t = _lap("discover_dedup", t)

        n_deferred = n_frontier - n_selected
        # the fetch slice is deduped to 1 row/url (pages_unique contract),
        # so every selected row becomes exactly one result row; a negative
        # here means the manifest counters are about to corrupt — fail loud
        # BEFORE the lineage commit below, or a retried iteration would
        # double-append its lineage rows (a real raise, not an assert: this
        # guard must survive python -O)
        if n_deferred < 0:
            raise RuntimeError(
                f"fetch fan-out: n_results={n_results} exceeds "
                f"n_frontier={n_frontier} — pages table has duplicate urls "
                "but pages_unique=True was set?"
            )

        # 7. per-partition lineage + commit. Two row kinds per iteration:
        # 'fetch' rows carry per-partition urls-in/fetched/blocked of the
        # extraction stage (the skew evidence: a salted hot host shows up
        # as balanced partition row counts here), 'discover' rows carry
        # per-partition emitted counts of the dedup output. Both were
        # already collected alongside the counters (≤ #partitions rows),
        # so the lineage commit is a driver-side pyarrow parquet write —
        # zero Spark jobs.
        t_now = time.time()
        lineage_rows = [
            (iteration, "fetch", r["partition_id"], r["urls_in"],
             r["fetched"] or 0, r["robots_blocked"] or 0, 0)
            for r in fetch_parts
        ] + [
            (iteration, "discover", r["partition_id"], 0, 0, 0, r["emitted"])
            for r in disc_parts
        ]
        lineage_tbl = pa.table(
            {
                "iteration": pa.array([r[0] for r in lineage_rows], pa.int32()),
                "stage": pa.array([r[1] for r in lineage_rows], pa.string()),
                "partition_id": pa.array([r[2] for r in lineage_rows], pa.int32()),
                "urls_in": pa.array([r[3] for r in lineage_rows], pa.int64()),
                "fetched": pa.array([r[4] for r in lineage_rows], pa.int64()),
                "robots_blocked": pa.array([r[5] for r in lineage_rows], pa.int64()),
                "emitted": pa.array([r[6] for r in lineage_rows], pa.int64()),
                "t_start": pa.array([t0] * len(lineage_rows), pa.float64()),
                "t_end": pa.array([t_now] * len(lineage_rows), pa.float64()),
            }
        )
        self.t_lineage.append_rows(
            lineage_tbl, {"iteration": iteration}, durable=False
        )

        if n_deferred == 0:
            # the whole frontier was selected (the common steady state under
            # a generous budget) — nothing is deferred, so the next frontier
            # is exactly the fresh discoveries: skip the anti-join entirely
            next_frontier = new_urls
        else:
            sel_keys = selected.select("url_norm")
            if n_selected <= cfg.broadcast_frontier_max:
                sel_keys = F.broadcast(sel_keys)
            deferred = frontier.join(sel_keys, "url_norm", "left_anti").drop(
                "warc_ts_hint", "sort_depth"
            )
            next_frontier = deferred.unionByName(new_urls)

        seen_append = seen_src.select(
            "url_norm",
            F.xxhash64("url_norm").alias("url_hash"),
            "depth",
            F.lit(iteration + 1).alias("first_iter"),
        )
        if self._seen_filter is not None and n_seen_add:
            # incremental filter maintenance: fold ONLY this iteration's
            # new keys into the in-memory filter (a partial build over the
            # cached candidate slice — O(new) — then an in-memory merge),
            # replacing the full O(n_seen) rebuild every later iteration
            # would otherwise pay. Ordering is the safety argument: the
            # merge lands BEFORE the seen commit below, so a crash or
            # commit failure can only ever leave the filter with EXTRA
            # keys relative to the table — extras are harmless (a filter
            # positive still goes through the exact anti-join), whereas
            # the reverse order could leave committed keys missing from
            # the filter, and a missing key skips the join: a duplicate
            # crawl. A process restart drops the object entirely and the
            # resume path rebuilds it full, once.
            self._seen_filter = self._seen_filter.merge(
                self._filter_build_partial(seen_append)
            )
            # a merge that pushes the cuckoo past its safe load factor
            # drops the filter and doubles the geometry dial — the next
            # iteration full-rebuilds at the larger size instead of
            # degrading into the saturated-table regime (scalar eviction
            # chains, unbounded overflow spill)
            self._filter_grow_check()
        # two-phase commit across independent tables (separate manifests):
        # the Spark DATA writes run concurrently into invisible staging
        # dirs (commit wall time = slowest write, not the sum), then the
        # O(1) manifest commits land in a fixed order — every
        # iteration-tagged table first, the frontier replace (carrying
        # iteration+1) LAST as the atomic commit point. A crash anywhere
        # before the frontier commit leaves the frontier at iteration N;
        # the resume reconciliation (``_reconcile``) rolls back any
        # trailing snapshot tagged >= N before re-running it, so the
        # deterministic re-execution cannot double-append results or
        # lineage. (On a cluster: Iceberg stage-commit per table with the
        # frontier commit as the WAL tip, same protocol.)
        with ThreadPoolExecutor(max_workers=4) as pool:
            futs = [
                pool.submit(
                    self.t_results.stage, results.coalesce(_parts(n_results))
                ),
                pool.submit(
                    self.t_seen.stage, seen_append.coalesce(_parts(n_seen_add))
                ),
                pool.submit(
                    self.t_frontier.stage,
                    next_frontier.coalesce(_parts(n_deferred + n_new)),
                ),
            ]
            if new_state is not None:
                # fourth independent table; host count is bounded by the
                # distinct hosts ever seen, so size the files like the
                # other writes instead of a fixed single-task coalesce
                futs.append(
                    pool.submit(
                        self.t_host_state.stage,
                        new_state.coalesce(_parts(st["n_seen"] + n_results)),
                    )
                )
            staged = [f.result() for f in futs]
        self.t_results.commit_staged(
            staged[0], {"iteration": iteration}, durable=False
        )
        self.t_seen.commit_staged(staged[1], {"iteration": iteration}, durable=False)
        if new_state is not None:
            self.t_host_state.commit_staged(
                staged[3], {"iteration": iteration}, mode="replace", durable=False
            )
        self.t_frontier.commit_staged(
            staged[2],
            {
                "iteration": iteration + 1,
                "pages_crawled": pages_crawled + n_fetched,
                "n_visited": visit_base + n_results,
                "n_frontier": n_deferred + n_new,
                "n_seen": st["n_seen"] + n_seen_add,
            },
            mode="replace",
        )
        # the frontier commit is the WAL tip: the iteration is now durable
        # (reconciliation can no longer roll it back), so advance each
        # table's stream barrier — a stream() mirror delivers an
        # iteration's rows exactly when it can never be re-delivered
        for tbl in (self.t_results, self.t_seen, self.t_lineage, self.t_host_state):
            tbl.mark_durable()
        # reclaim the dead full copies the replace-per-iteration tables
        # leave behind (append-only tables keep every dir live via the
        # tip, and external read_since tailers may hold cursors into
        # them — leave those alone). Driver-side manifest work + dir
        # removal only, no Spark job.
        if cfg.snapshot_retention is not None:
            self.t_frontier.expire_snapshots(keep_last=cfg.snapshot_retention)
            self.t_host_state.expire_snapshots(keep_last=cfg.snapshot_retention)
        t = _lap("commit", t)

        for df in (selected, gated, results, candidates, new_urls):
            df.unpersist()
        # every job that read the bloom probe has committed; release the
        # bitset broadcast so long crawls hold O(1) broadcasts, not O(iters)
        self._destroy_bloom_bc()
        return {
            "done": False,
            "iteration": iteration,
            "selected": n_selected,
            "fetched": n_fetched,
            "robots_blocked": n_blocked,
            "new_urls": n_new,
            "pages_crawled": pages_crawled + n_fetched,
            "seconds": time.time() - t0,
            "profile": prof,
        }

    def run(self, max_iterations: int = 100) -> list[dict]:
        """Run until done or ``max_iterations``; resumable — a new CrawlRun
        over the same workdir continues from the last committed snapshot."""
        stats = []
        for _ in range(max_iterations):
            s = self.run_iteration()
            stats.append(s)
            if s.get("done"):
                break
        return stats

    # -- outputs ---------------------------------------------------------------

    def results(self) -> DataFrame | None:
        return self.t_results.read(self.spark)

    def seen(self) -> DataFrame | None:
        return self.t_seen.read(self.spark)

    def expire_seen(self, condition) -> dict:
        """TTL/recrawl expiry — the Spark restatement of the reference's
        cache invalidation (cache_context.py CacheMode read/write gating;
        async_database.py:495-526 aclear_db/aflush_db): remove matching
        URLs from the seen set so the crawl RE-crawls them on their next
        discovery. ``condition`` is a Column over the seen table's columns
        (``url_norm``, ``url_hash``, ``depth``, ``first_iter``) — e.g.
        ``F.col("first_iter") <= k`` recrawls everything discovered up to
        iteration k, the snapshot-table analogue of a TTL.

        Call BETWEEN iterations (CrawlRun is not concurrent). One commit:
        the survivor set REPLACES the seen table (snapshot history keeps
        the old set for time travel), tagged with the last COMPLETED
        iteration so crash-resume reconciliation never rolls it back.
        Results and lineage stay append-only — a re-crawled URL appends a
        fresh capture with a new visit_order, it does not rewrite history
        — and ``read_since`` tailers on the seen table fail loud on the
        rebuild, as any replace does. The frontier manifest's ``n_seen``
        counter intentionally keeps counting historical inserts: it feeds
        only sizing heuristics (filter geometry, file counts, the
        ``bloom_min_seen`` threshold), where an upper bound errs roomy,
        never wrong; the exact survivor count is recorded on the seen
        replace's own meta.

        In-memory filter maintenance is where the backend trade shows:
        the cuckoo DELETES the expired keys in place — O(expired) numpy
        work, no rebuild, the operation that justifies the backend — while
        the bloom (which cannot delete) is dropped and full-rebuilds over
        the survivors at the next iteration. Either way correctness never
        depends on it: a stale filter positive only routes a candidate
        through the exact anti-join, which now misses, so the URL is
        re-crawled. The expired url_hash collect is driver-bounded by
        8 bytes × n_expired — same order as the driver-resident filter
        itself.

        Returns ``{"n_expired": int, "n_seen": int}`` (survivor count)."""
        st = self.state()
        if st["iteration"] >= 0:
            # reconcile FIRST, exactly as run_iteration does on entry: a
            # crashed iteration may have committed its seen append without
            # reaching the frontier WAL tip, and expiring over that state
            # would bake the orphan rows into a rollback-proof replace —
            # the re-run iteration's candidates would then anti-join away
            # and never be crawled. Rolling the orphans back first keeps
            # the replace a pure function of durable state.
            self._reconcile(st["iteration"])
        seen_df = self.t_seen.read(self.spark)
        if seen_df is None:
            return {"n_expired": 0, "n_seen": 0}
        cond = F.coalesce(condition, F.lit(False))  # null ⇒ keep, not drop
        expired = seen_df.filter(cond)
        # never expire a URL still PENDING in the frontier: its seen entry
        # is what stops a rediscovery from queueing it a second time while
        # the first copy waits — expiring it would double-fetch. Recrawl
        # semantics target URLs whose capture already landed.
        frontier_df = self.t_frontier.read(self.spark)
        if frontier_df is not None:
            expired = expired.join(
                frontier_df.select("url_norm"), "url_norm", "left_anti"
            )
        expired = expired.persist()
        survivors = None
        try:
            n_expired = expired.count()
            if n_expired == 0:
                # the zero path must report the same EXACT survivor count
                # the non-zero path does — st["n_seen"] only upper-bounds
                # it after a prior expiry (the frontier counter keeps
                # counting historical inserts); one count job on an
                # explicit maintenance call is the honest price
                return {"n_expired": 0, "n_seen": seen_df.count()}
            survivors = seen_df.join(
                expired.select("url_norm"), "url_norm", "left_anti"
            ).persist()
            # the EXACT survivor count — st["n_seen"] is only an upper
            # bound (it keeps counting historical inserts across prior
            # expiries), so subtracting from it would overstate after the
            # second expiry; one count job on a maintenance op is the
            # honest price, and the persist means the staged write below
            # reuses the materialization instead of re-running the joins
            n_seen = survivors.count()
            staged = self.t_seen.stage(
                survivors.coalesce(_parts(max(n_seen, 1)))
            )
            self.t_seen.commit_staged(
                staged,
                {"iteration": st["iteration"] - 1, "n_expired": n_expired,
                 "n_seen": n_seen},
                mode="replace",
            )
            if self._seen_filter is not None:
                if self.config.seen_filter == "cuckoo":
                    hashes = np.array(
                        [r.url_hash for r in expired.select("url_hash").collect()],
                        dtype=np.int64,
                    )
                    self._seen_filter.delete(hashes)
                else:
                    self._seen_filter = None
            return {"n_expired": n_expired, "n_seen": n_seen}
        finally:
            expired.unpersist()
            if survivors is not None:
                survivors.unpersist()

    def lineage(self) -> DataFrame | None:
        return self.t_lineage.read(self.spark)

    def host_state(self) -> DataFrame | None:
        return self.t_host_state.read(self.spark)
