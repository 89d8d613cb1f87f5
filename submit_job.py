#!/usr/bin/env python
"""spark-submit entry point (north_rule: "runs via spark-submit --py-files on
multi-executor clusters").

Usage:
    python package_pyfiles.py                      # → dist/httrack2warc_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/httrack2warc_spark.zip \\
        submit_job.py crawl --hosts 4 --pages 100

The job builds a deterministic synthetic web, runs the frontier scheduler to
exhaustion, and prints a one-line JSON summary. Executors import the engine
from the shipped zip — no repo checkout needed on workers.
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("command", choices=["crawl"])
    p.add_argument("--hosts", type=int, default=4)
    p.add_argument("--pages", type=int, default=100)
    p.add_argument("--budget", type=int, default=100_000)
    p.add_argument("--parts", type=int, default=16)
    # loop-shape knobs so the BENCH §2 configuration can run through the
    # literal spark-submit --py-files mode (defaults match the original CLI)
    p.add_argument("--capacity", type=int, default=10_000)
    p.add_argument("--max-rounds", type=int, default=20)
    p.add_argument("--summary-every", type=int, default=1)
    p.add_argument("--commit-every", type=int, default=1)
    p.add_argument("--batch-levels", type=int, default=1)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("httrack2warc-spark-crawl")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from httrack2warc_spark.frontier import CrawlConfig, FrontierScheduler, generate_web
    from httrack2warc_spark.sinks.tables import TableCatalog

    web, seeds = generate_web(
        spark, n_hosts=args.hosts, pages_per_host=args.pages, out_degree=4
    )
    cat = TableCatalog(spark, tempfile.mkdtemp(prefix="submit_crawl_"))
    sched = FrontierScheduler(
        spark, cat, web,
        CrawlConfig(num_parts=args.parts, max_rounds=args.max_rounds,
                    default_host_budget=args.budget, fetch_robots=False,
                    summary_capacity_per_part=args.capacity,
                    summary_every=args.summary_every,
                    seq_mode="auto", commit_every=args.commit_every,
                    batch_levels=args.batch_levels),
    )
    t0 = time.time()
    log = sched.run(seeds=seeds)
    n = log.count()
    dt = time.time() - t0
    print(json.dumps({
        "urls": n,
        "sec": round(dt, 2),
        "urls_per_sec": round(n / dt, 1),
        "snapshots": len(cat.list_snapshots()),
    }))


if __name__ == "__main__":
    main()
