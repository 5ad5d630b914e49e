"""Cuckoo-filter URL-seen backend: core invariants, distributed build,
probe column, and crawl-loop equivalence with the bloom backend.

The invariant the crawl depends on is NO FALSE NEGATIVES — a seen URL the
filter calls definitely-new would skip the exact anti-join and be crawled
twice. Everything here hammers that invariant from every angle the
backend can reach it: plain inserts, deletes, merges, overflow spill
(hopelessly undersized tables), serialization, and the distributed
tree-merge build.
"""

from __future__ import annotations

import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.cuckoo import (
    SLOTS,
    CuckooFilterSet,
    buckets_for,
    build_cuckoo,
    cuckoo_maybe_contains_col,
)


@pytest.fixture(scope="module")
def keys() -> np.ndarray:
    rng = np.random.default_rng(7)
    return np.unique(rng.integers(-(2**63), 2**63 - 1, size=100_000, dtype=np.int64))


@pytest.fixture(scope="module")
def filled(keys) -> CuckooFilterSet:
    cf = CuckooFilterSet(buckets_for(len(keys)))
    cf.add(keys)
    return cf


def test_no_false_negatives(filled, keys):
    assert filled.maybe_contains(keys).all()


def test_false_positive_rate_bounded(filled, keys):
    rng = np.random.default_rng(13)
    fresh = np.setdiff1d(
        rng.integers(-(2**63), 2**63 - 1, size=100_000, dtype=np.int64), keys
    )
    fpr = filled.maybe_contains(fresh).mean()
    # theory: ~2*SLOTS/2^16 ≈ 1.2e-4; leave an order of magnitude slack
    assert fpr < 2e-3, fpr


def test_delete_is_exact_and_preserves_survivors(keys):
    cf = CuckooFilterSet(buckets_for(len(keys)))
    cf.add(keys)
    gone, kept = keys[: len(keys) // 2], keys[len(keys) // 2 :]
    assert cf.delete(gone).all()  # every inserted key finds its copy
    # the bloom can't do this at all; the cuckoo must not hurt survivors
    assert cf.maybe_contains(kept).all()
    # deleted keys drop to FP-level residual membership
    assert cf.maybe_contains(gone).mean() < 2e-3


def test_merge_equals_union(keys):
    nb = buckets_for(len(keys))
    a, b = keys[::2], keys[1::2]
    fa, fb = CuckooFilterSet(nb), CuckooFilterSet(nb)
    fa.add(a)
    fb.add(b)
    merged = fa.merge(fb)
    assert merged.maybe_contains(keys).all()
    # merge must not mutate its operands
    assert not fa.maybe_contains(b).all()


def test_overflow_spill_never_false_negative(keys):
    # 1<<10 buckets x 4 slots ≈ 4k capacity; 20k inserts oversubscribe 5x —
    # the exact overflow spill must catch everything the table cannot hold
    tiny = CuckooFilterSet(1 << 10)
    small = keys[:20_000]
    tiny.add(small)
    assert len(tiny.overflow) > 0
    assert tiny.maybe_contains(small).all()
    # spilled entries are deletable too
    assert tiny.delete(small).all()


def test_bytes_roundtrip(filled, keys):
    t, o = filled.to_bytes()
    back = CuckooFilterSet.from_bytes(filled.num_buckets, t, o, copy=False)
    assert (back.maybe_contains(keys) == filled.maybe_contains(keys)).all()


def test_buckets_for_sizing():
    assert buckets_for(1) == 1 << 10  # floor
    nb = buckets_for(1_000_000)
    assert nb & (nb - 1) == 0 and nb * SLOTS * 0.84 >= 1_000_000


def test_delete_full_multiset_drains_filter(keys):
    """Vectorized delete, hammered through the saturated/overflow regime
    with duplicate inserts: deleting exactly the inserted multiset (in a
    different order) must find every copy and leave the filter EMPTY —
    zero table slots, zero overflow entries. Any copy the bulk passes
    double-delete or miss shows up as a nonzero residual occupancy."""
    dup = np.concatenate([keys[:40_000], keys[:5_000]])  # 5k double-inserts
    cf = CuckooFilterSet(1 << 12)  # ~16k slots for 45k keys → heavy spill
    cf.add(dup)
    assert cf.maybe_contains(dup).all()
    rng = np.random.default_rng(11)
    order = rng.permutation(len(dup))
    removed = cf.delete(dup[order])
    assert removed.all()
    assert int(np.count_nonzero(cf.table)) == 0 and len(cf.overflow) == 0
    # and a second delete of anything finds nothing
    assert not cf.delete(dup[:100]).any()


def test_load_factor_and_grow_watermark(keys):
    healthy = CuckooFilterSet(buckets_for(10_000))
    healthy.add(keys[:10_000])
    assert healthy.load_factor() <= 0.84 and not healthy.needs_grow()
    sat = CuckooFilterSet(1 << 10)  # 4,096 slots
    sat.add(keys[:8_000])
    assert sat.needs_grow()
    # the grow remedy: rebuild at buckets_for the true cardinality
    grown = CuckooFilterSet(max(2 * sat.num_buckets, buckets_for(8_000)))
    grown.add(keys[:8_000])
    assert not grown.needs_grow() and grown.maybe_contains(keys[:8_000]).all()


def test_saturated_insert_spills_fast(keys):
    """Past load 0.95 the insert path must spill straight to the exact
    overflow instead of burning the 500-eviction scalar chase per key
    (~4 ms/key): 20k inserts into a full table in well under a second,
    with membership and delete intact."""
    import time

    cf = CuckooFilterSet(1 << 10)
    cf.add(keys[:4_000])  # fill to ~the table's capacity
    t0 = time.time()
    cf.add(keys[4_000:24_000])  # 20k more into a saturated table
    took = time.time() - t0
    assert took < 2.0, f"saturated insert took {took:.1f}s — kick-chase cliff"
    assert cf.maybe_contains(keys[:24_000]).all()
    assert cf.delete(keys[:24_000]).all()


def test_crawl_grow_policy_drops_and_doubles(spark, pages):
    """The crawl-side wiring of needs_grow: a post-merge saturated filter
    is dropped and the geometry dial doubled (next iteration rebuilds
    full at the larger size); a healthy filter is left alone; and the
    full build sizes at buckets_for(n_seen) when the seen set outgrew the
    config dial."""
    from crawl4ai_spark.plans.crawl import CrawlConfig, CrawlRun
    from crawl4ai_spark.sources.synthetic import build_seeds

    cfg = CrawlConfig(seen_filter="cuckoo", cuckoo_buckets=1 << 10)
    run = CrawlRun(
        spark, pages, None, build_seeds(spark, 2),
        tempfile.mkdtemp(prefix="grow_"), cfg,
    )
    rng = np.random.default_rng(5)
    sat = CuckooFilterSet(1 << 10)
    sat.add(rng.integers(-(2**62), 2**62, 8_000, dtype=np.int64))
    run._seen_filter = sat
    run._filter_grow_check()
    assert run._seen_filter is None and run._cuckoo_num_buckets == 1 << 11
    healthy = CuckooFilterSet(1 << 11)
    healthy.add(rng.integers(-(2**62), 2**62, 1_000, dtype=np.int64))
    run._seen_filter = healthy
    run._filter_grow_check()
    assert run._seen_filter is healthy  # untouched below the watermark
    # full-build sizing: 50k seen keys ≫ the 1<<11 dial → buckets_for(50k)
    seen_df = (
        spark.range(50_000)
        .select(F.col("id").cast("string").alias("url_norm"))
        .withColumn("url_hash", F.xxhash64("url_norm"))
    )
    run._seen_filter = None
    built = run._filter_build_full(seen_df, 50_000)
    assert built.num_buckets == buckets_for(50_000) == run._cuckoo_num_buckets
    assert not built.needs_grow()


def test_invalid_seen_filter_rejected_at_construction(spark, pages):
    from crawl4ai_spark.plans.crawl import CrawlConfig, CrawlRun
    from crawl4ai_spark.sources.synthetic import build_seeds

    with pytest.raises(ValueError, match="unknown seen_filter"):
        CrawlRun(
            spark, pages, None, build_seeds(spark, 1),
            tempfile.mkdtemp(prefix="badfilter_"),
            CrawlConfig(seen_filter="xor"),
        )


def test_distributed_build_matches_local(spark, pages):
    """build_cuckoo over the pages table ≡ a local filter over the same
    hashes, both through the narrow path and the tree-merge path."""
    urls = pages.select(F.col("url").alias("url_norm"))
    hashes = np.array(
        [r.h for r in urls.select(F.xxhash64("url_norm").alias("h")).collect()],
        dtype=np.int64,
    )
    local = CuckooFilterSet(1 << 14)
    local.add(hashes)
    for fanin in (32, 1):  # 1 forces the executor-side merge stage
        cf = build_cuckoo(urls, num_buckets=1 << 14, merge_fanin=fanin)
        assert cf.maybe_contains(hashes).all()
        assert cf.n_collected_tables <= max(
            fanin, urls.rdd.getNumPartitions() if fanin >= 32 else fanin
        )
        # same keys, same derivation → same membership answers as local
        rng = np.random.default_rng(3)
        probes = rng.integers(-(2**63), 2**63 - 1, size=5_000, dtype=np.int64)
        assert (cf.maybe_contains(probes) == local.maybe_contains(probes)).all()


def test_probe_column_matches_filter(spark, pages):
    urls = pages.select(F.col("url").alias("url_norm"))
    cf = build_cuckoo(urls, num_buckets=1 << 14)
    half = pages.filter(F.col("doc_id") % 2 == 0).select(
        "url", F.col("url").alias("url_norm")
    )
    got = (
        half.withColumn(
            "maybe", cuckoo_maybe_contains_col(spark, cf, F.col("url_norm"))
        )
        .select("maybe")
        .collect()
    )
    # every probed url was inserted → no false negatives through the UDF
    assert all(r.maybe for r in got)


def test_expire_seen_recrawls_and_preserves_survivors(spark, pages):
    """TTL/recrawl expiry (the reference's cache invalidation,
    cache_context.py + async_database.py aclear_db, restated over
    snapshot tables): expiring seen URLs between iterations makes the
    crawl RE-crawl them on rediscovery — and under the cuckoo backend the
    in-memory filter is maintained by in-place DELETION (no rebuild),
    which must never disturb survivor membership (a lost survivor key is
    only a wasted join probe, but a false negative in the sense that
    matters here is a survivor the filter forgets — impossible for
    inserted keys by the cuckoo contract, asserted below)."""
    from crawl4ai_spark.plans.crawl import CrawlConfig, CrawlRun
    from crawl4ai_spark.sources.synthetic import build_robots, build_seeds

    for kind in ("cuckoo", "bloom"):
        cfg = CrawlConfig(
            mode="bfs",
            max_pages=100000,
            max_depth=10,
            host_budget=100000,
            salt=4,
            include_external=True,
            bloom_min_seen=0,
            seen_filter=kind,
            cuckoo_buckets=1 << 12,
        )
        wd = tempfile.mkdtemp(prefix=f"expire_{kind}_")
        run = CrawlRun(spark, pages, build_robots(spark), build_seeds(spark, 2), wd, cfg)
        run.run(max_iterations=2)
        seen_before = {r.url_norm for r in run.seen().select("url_norm").collect()}
        n_results_before = run.results().count()
        # expire every CRAWLED url (frontier residents are protected)
        out = run.expire_seen(F.lit(True))
        assert out["n_expired"] > 0
        survivors = {r.url_norm for r in run.seen().select("url_norm").collect()}
        assert len(survivors) == len(seen_before) - out["n_expired"]
        frontier_urls = {
            r.url_norm
            for r in run.t_frontier.read(spark).select("url_norm").collect()
        }
        assert survivors == seen_before & frontier_urls  # exactly the pending
        if kind == "cuckoo":
            # in-place delete kept every survivor key (no rebuild happened)
            assert run._seen_filter is not None
            surv_hashes = np.array(
                [r.url_hash for r in run.seen().select("url_hash").collect()],
                dtype=np.int64,
            )
            if len(surv_hashes):
                assert run._seen_filter.maybe_contains(surv_hashes).all()
        else:
            assert run._seen_filter is None  # blooms cannot delete → rebuild
        # continue crawling: rediscovered expired urls must be RE-crawled
        run.run(max_iterations=2)
        res = run.results().select("url").collect()
        urls = [r.url for r in res]
        assert len(urls) > n_results_before
        assert len(urls) > len(set(urls)), "no url was re-crawled after expiry"
        # crash-resume safety, made to bite: run the reconciliation a
        # resume actually performs (rollback_trailing against the WAL
        # tip) and assert it does NOT roll the expiry replace back — a
        # replace mistagged at/past the next iteration would be popped
        # here and the seen set would revert
        resumed = CrawlRun(
            spark, pages, build_robots(spark), build_seeds(spark, 2), wd, cfg
        )
        post = {r.url_norm for r in run.seen().select("url_norm").collect()}
        resumed._reconcile(resumed.state()["iteration"])
        post_reconcile = {
            r.url_norm for r in resumed.seen().select("url_norm").collect()
        }
        assert post_reconcile == post


def test_expire_seen_reconciles_crashed_iteration_first(spark, pages):
    """A crashed iteration can leave an orphan seen append (committed
    seen, never reached the frontier WAL tip). expire_seen must roll it
    back BEFORE filtering — otherwise the orphan rows bake into the
    rollback-proof replace and the re-run iteration's candidates
    anti-join away against them: URLs silently never crawled."""
    from crawl4ai_spark.plans.crawl import CrawlConfig, CrawlRun
    from crawl4ai_spark.sources.synthetic import build_robots, build_seeds

    cfg = CrawlConfig(
        mode="bfs", max_pages=100000, max_depth=10, host_budget=100000,
        salt=4, include_external=True, bloom_min_seen=0,
        seen_filter="cuckoo", cuckoo_buckets=1 << 12,
    )
    wd = tempfile.mkdtemp(prefix="expire_orphan_")
    run = CrawlRun(spark, pages, build_robots(spark), build_seeds(spark, 2), wd, cfg)
    run.run(max_iterations=2)
    nxt = run.state()["iteration"]
    # simulate the crash window: a seen append tagged with the iteration
    # about to run, committed non-durable (exactly what the two-phase
    # commit leaves behind when the frontier replace never lands)
    orphan = run.spark.createDataFrame(
        [("https://orphan.example/x", 1234567, 1, 99)],
        "url_norm string, url_hash long, depth int, first_iter int",
    )
    run.t_seen.append(orphan, {"iteration": nxt}, durable=False)
    # expire with a condition that matches REAL rows (the crawled seeds)
    # but not the orphan: the replace path runs, and without the
    # reconcile-first fix the orphan would survive into the replace
    out = run.expire_seen(F.col("first_iter") <= 0)
    assert out["n_expired"] > 0
    seen_urls = {r.url_norm for r in run.seen().select("url_norm").collect()}
    assert "https://orphan.example/x" not in seen_urls, (
        "orphan seen rows laundered into the expiry replace"
    )
    assert out["n_seen"] == len(seen_urls)
    # consecutive expiries report the EXACT survivor count, not the
    # historical-upper-bound subtraction
    out2 = run.expire_seen(F.lit(True))
    assert out2["n_seen"] == run.seen().count()


def test_crawl_backend_equivalence(spark, pages):
    """The north rule's 'bloom/cuckoo' backends must be interchangeable,
    and the pre-filter must not change results at all: both are
    no-false-negative pre-filters ahead of the same exact anti-join, so
    the crawl's results table (urls, depths, visit order) and seen set are
    identical under bloom, cuckoo, and NO filter. bloom_min_seen=0 forces
    the filter path on from the first iteration, which also exercises the
    INCREMENTAL filter maintenance (full build at iteration 1, per-
    iteration partial merges after) across all four iterations — at the
    end the filter must still cover every committed seen key (a missing
    key would mean a duplicate crawl at scale)."""
    from crawl4ai_spark.plans.crawl import CrawlConfig, CrawlRun
    from crawl4ai_spark.sources.synthetic import build_robots, build_seeds

    robots = build_robots(spark)
    seeds = build_seeds(spark, 2)
    outs = {}
    for kind in ("bloom", "cuckoo", "off"):
        cfg = CrawlConfig(
            mode="bfs",
            max_pages=100000,
            max_depth=2,
            host_budget=100000,
            salt=4,
            include_external=True,
            bloom_min_seen=0 if kind != "off" else 10**12,
            seen_filter=kind if kind != "off" else "bloom",
            cuckoo_buckets=1 << 12,
        )
        run = CrawlRun(
            spark, pages, robots, seeds, tempfile.mkdtemp(prefix=f"cuckoo_{kind}_"), cfg
        )
        run.run(max_iterations=4)
        res = sorted(
            (r.url, r.depth, r.visit_order, r.status_code)
            for r in run.results()
            .select("url", "depth", "visit_order", "status_code")
            .collect()
        )
        seen = sorted(r.url_norm for r in run.seen().select("url_norm").collect())
        outs[kind] = (res, seen)
        if kind == "off":
            assert run._seen_filter is None
        else:
            # incremental-maintenance coverage invariant: after N merges
            # the in-memory filter still contains every committed key
            hashes = np.array(
                [r.url_hash for r in run.seen().select("url_hash").collect()],
                dtype=np.int64,
            )
            assert run._seen_filter.maybe_contains(hashes).all()
    assert outs["bloom"] == outs["cuckoo"] == outs["off"]
