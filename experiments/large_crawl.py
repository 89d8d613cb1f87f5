#!/usr/bin/env python
"""Largest-scale single-run crawl demonstration (BENCH/BASELINE.md §7).

One end-to-end crawl at 8× the §2 loop's input (16M URLs: 400 hosts ×
40,000 pages) on local[32], recording wall, URLs/s, per-round row counts
and the 1-minute load average — evidence that the frontier machinery
(Bloom-gated discovery, merge-on-read frontier deltas, fused level blocks,
deferred commit tail) holds its shape as the frontier grows, not just at
the recorded 2M point.  Single-shot by design: the point is the SCALE
CURVE against §2's 2M numbers, not a min-of-k throughput claim (the
protocol numbers stay in bench.py / bench_scaling.py).

Usage: python experiments/large_crawl.py [n_hosts pages_per_host]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from httrack2warc_spark import get_spark
    from httrack2warc_spark.frontier import (
        CrawlConfig,
        FrontierScheduler,
        generate_web,
    )
    from httrack2warc_spark.sinks.tables import TableCatalog

    spark = get_spark(
        app_name="large-crawl",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")

    web, seeds = generate_web(
        spark,
        n_hosts=n_hosts,
        pages_per_host=pages,
        out_degree=12,
        cross_host_every=1,
    )
    web.pages = web.pages.persist()
    web.links = web.links.persist()
    n_pages = web.pages.count()
    n_links = web.links.count()

    cat = TableCatalog(spark, tempfile.mkdtemp(prefix="large_crawl_"))
    sched = FrontierScheduler(
        spark,
        cat,
        web,
        CrawlConfig(
            num_parts=int(cpus),
            max_rounds=12,
            default_host_budget=100_000_000,
            fetch_robots=False,
            summary_capacity_per_part=2_000_000,
            summary_every=3,
            seq_mode="auto",
            commit_every=2,
            batch_levels=4,
        ),
    )
    load0 = os.getloadavg()
    t0 = time.time()
    log = sched.run(seeds=seeds)
    n_urls = log.count()
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "mode": "large-crawl single run",
                "cpus": int(cpus),
                "n_hosts": n_hosts,
                "pages_per_host": pages,
                "web_pages": n_pages,
                "web_links": n_links,
                "urls": n_urls,
                "sec": round(dt, 2),
                "urls_per_sec": round(n_urls / dt, 1),
                "load_avg_start_1m": round(load0[0], 1),
                "load_avg_end_1m": round(os.getloadavg()[0], 1),
            }
        )
    )


if __name__ == "__main__":
    main()
