#!/usr/bin/env python
"""Headline benchmark.

Runs the engine's representative queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys: "frontier_urls_per_sec" (the BASELINE.json target metric measured
on a generated crawl), "cpus". Scaling evidence across two parallelism levels
is produced by bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from httrack2warc_spark import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus) * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    headline = [
        "q1_pricing_summary",
        "q3_top_orders",
        "q5_local_volume",
        "ordinal_fifo_join",
        "politeness_topk",
        "salted_topk",
        "sessionize",
        "bloom_gated_antijoin",
        "exact_dedup",
        "token_count",
        "minhash_neardup",
        "simhash_neardup",
        "embedding_topk",
        "lsh_ann",
        "image_invariant",
        "image_resize",
        "image_features",
        "frame_sample",
    ]

    timings: dict[str, float] = {}
    # warm the JVM/IO once (scan metadata, codegen) so timings measure the plan
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    for name in headline:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    # frontier throughput (the BASELINE.json target metric)
    from httrack2warc_spark.frontier import CrawlConfig, FrontierScheduler, generate_web
    from httrack2warc_spark.sinks.tables import TableCatalog
    import tempfile

    n_hosts, pages = 50, 2000
    web, seeds = generate_web(spark, n_hosts=n_hosts, pages_per_host=pages,
                              out_degree=8, cross_host_every=1)
    web.pages = web.pages.persist()
    web.links = web.links.persist()
    web.pages.count(), web.links.count()
    cat = TableCatalog(spark, tempfile.mkdtemp(prefix="bench_crawl_"))
    sched = FrontierScheduler(
        spark, cat, web,
        CrawlConfig(num_parts=int(cpus), max_rounds=12,
                    default_host_budget=100_000, fetch_robots=False,
                    summary_capacity_per_part=500_000, summary_every=3),
    )
    t0 = time.time()
    log = sched.run(seeds=seeds)
    n_urls = log.count()
    crawl_sec = time.time() - t0
    timings["frontier_crawl"] = round(crawl_sec, 3)
    urls_per_sec = round(n_urls / crawl_sec, 1)
    print(f"# frontier: {n_urls} urls in {crawl_sec:.1f}s = {urls_per_sec}/s",
          file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus),
        "frontier_urls_per_sec": urls_per_sec,
        "frontier_urls": n_urls,
    }))


if __name__ == "__main__":
    main()
