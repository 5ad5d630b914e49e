"""Adaptive per-host politeness (P1+P2 integration in the crawl loop)."""

from __future__ import annotations

import tempfile

from crawl4ai_spark.plans.crawl import CrawlConfig, CrawlRun
from crawl4ai_spark.sources.synthetic import build_robots, build_seeds


def test_adaptive_budget_and_state_evolution(spark, pages, sf_dir):
    run = CrawlRun(
        spark,
        pages,
        build_robots(spark),
        build_seeds(spark, 6),
        tempfile.mkdtemp(prefix="adaptive_"),
        CrawlConfig(
            mode="bfs",
            max_pages=100,
            max_depth=2,
            adaptive_politeness=True,
            iteration_window=3.0,
            base_delay=1.0,
        ),
    )
    s0 = run.run_iteration()
    assert not s0.get("done")
    hs = {r.host: r for r in run.host_state().collect()}
    assert hs, "host_state table must exist after an adaptive iteration"
    # every status this corpus produces (200/403/404) is a 'success' for the
    # rate limiter (only 429/503 throttle) ⇒ delay decays 1.0 → 0.75
    assert all(abs(r.current_delay - 0.75) < 1e-9 for r in hs.values())
    assert all(r.fail_count == 0 for r in hs.values())

    s1 = run.run_iteration()
    # faster hosts ⇒ larger budgets next round: floor(3.0/0.75) = 4 per host
    assert s1.get("done") or s1["selected"] >= 1
    hs2 = {r.host: r for r in run.host_state().collect()}
    hit_again = [h for h in hs2 if h in hs]
    assert hit_again
    # second consecutive success: 0.75 * 0.75 floored at 0.5 → 0.5625
    decayed = [h for h in hs2 if abs(hs2[h].current_delay - 0.5625) < 1e-9]
    idle = [h for h in hs2 if abs(hs2[h].current_delay - 0.75) < 1e-9]
    assert len(decayed) + len(idle) == len(hs2)
