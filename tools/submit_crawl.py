#!/usr/bin/env python
"""spark-submit entry point for the crawl engine.

Run (the --py-files zip is what ships the package to executors on a real
cluster; deploy.package_zip builds it):

    ZIP=$(python -c 'from crawl4ai_spark.deploy import package_zip; print(package_zip())')
    spark-submit --master local[8] --py-files "$ZIP" tools/submit_crawl.py \
        --sf-dir /root/testdata/sf0.001 --workdir /tmp/crawl_out \
        --mode bfs --seeds 10 --max-pages 100 --iterations 3

Resumable: re-submitting with the same --workdir continues from the last
committed snapshot. Prints one JSON status line per iteration and a final
summary line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--mode", default="bfs", choices=["bfs", "dfs", "best_first"])
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--max-pages", type=int, default=100)
    ap.add_argument("--max-depth", type=int, default=4)
    ap.add_argument("--host-budget", type=int, default=10)
    ap.add_argument("--iteration-budget", type=int, default=None,
                    help="global per-iteration page cap; bounds the fetch "
                         "slice independently of --max-pages")
    ap.add_argument("--iterations", type=int, default=5)
    ap.add_argument("--adaptive", action="store_true",
                    help="adaptive per-host politeness delays")
    ap.add_argument("--query", default=None,
                    help="run the adaptive crawl-until-confident loop for "
                         "this query instead of a fixed iteration count")
    ap.add_argument("--confidence", type=float, default=0.7)
    args = ap.parse_args()

    # Under spark-submit the session already exists; getOrCreate attaches.
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    from crawl4ai_spark.deploy import ensure_workers_can_import

    ensure_workers_can_import(spark)

    from crawl4ai_spark.plans.crawl import CrawlConfig, CrawlRun
    from crawl4ai_spark.sources.synthetic import build_pages, build_robots, build_seeds

    if args.query:
        from crawl4ai_spark.plans.adaptive import AdaptiveCrawl, AdaptiveConfig

        ac = AdaptiveCrawl(
            spark,
            build_pages(spark, args.sf_dir),
            build_robots(spark),
            build_seeds(spark, args.seeds),
            args.workdir,
            query=args.query,
            config=AdaptiveConfig(
                confidence_threshold=args.confidence,
                max_pages=args.max_pages,
                max_depth=args.max_depth,
                batch_size=args.iteration_budget or 10,
            ),
        )
        out = ac.crawl_until_confident(max_iterations=args.iterations)
        print(json.dumps({k: v for k, v in out.items() if k != "profile"}))
        run = ac.run
    else:
        run = CrawlRun(
            spark,
            build_pages(spark, args.sf_dir),
            build_robots(spark),
            build_seeds(spark, args.seeds),
            args.workdir,
            CrawlConfig(
                mode=args.mode,
                max_pages=args.max_pages,
                max_depth=args.max_depth,
                host_budget=args.host_budget,
                iteration_budget=args.iteration_budget,
                adaptive_politeness=args.adaptive,
            ),
        )
        for stats in run.run(max_iterations=args.iterations):
            print(json.dumps({k: v for k, v in stats.items() if k != "profile"}))
    res = run.results()
    summary = {
        "done": True,
        "results": res.count() if res is not None else 0,
        "fetched": res.filter("success").count() if res is not None else 0,
        "workdir": args.workdir,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
