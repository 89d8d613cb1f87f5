#!/usr/bin/env python
"""Headline benchmark.

Runs the engine's representative queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys: "frontier_urls_per_sec" (the BASELINE.json target metric measured
on a generated crawl), "cpus". Scaling evidence across two parallelism levels
is produced by bench_scaling.py → BENCH/BASELINE.md.

Noise protocol: this container shares a host with co-tenants (load average
8-12 with zero local processes is routine), so single-shot wall-clocks swing
±2x. Every number here is therefore a min over repeated runs in a warm JVM:
queries run in three full passes (spark.catalog.clearCache() between passes
so plan-equality caching can't fake the later passes), and the frontier crawl —
the BASELINE.json target metric — runs three times against fresh state dirs.
Per-run raw values and the host load average are recorded in the JSON so
round-over-round comparisons can see the variance.
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
    load_start = os.getloadavg()

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
        "audio_features",
        "header_surgery",
        "clean_corpus",
        # round 5 additions (not in the r1-r4 suite totals): benchmark
        # decontamination, PII redaction, Gopher repetition gate
        "decontaminate_bench",
        "pii_redact",
        "repetition_filter",
        "paragraph_dedup",
        "pack_sequences",
        "phash_neardup",
        "q21_sole_blame",
        "asof_join",
        "hll_distinct",
        "heavy_words",
        "weighted_sample",
        "interval_join",
        "quantile_sketch",
        # image_caption_dedup is excluded like dedup_components: both are
        # iterative connected-components queries over small fixture graphs,
        # all fixed job latency (~10 jobs x local-mode latency on ~250
        # edges) — not a data-scale signal; the correctness gate runs them.
        "stratified_weighted_sample",
        "q13_cust_dist",
        "event_gaps",
        "json_extract_agg",
        "cube_revenue",
        "range_window_avg",
        "vector_norm_stats",
        "daily_counts",
        # round 5 second-wave additions (not in earlier suite totals):
        # TPC-H Q7/Q9/Q10 shapes + the new analytics classes
        "q7_volume_shipping",
        "q9_nation_profit",
        "q10_returned_items",
        "gaps_islands",
        "value_distribution",
        "cooccurrence_pairs",
        # TPC-H completion wave: the big-big shuffle-join + CASE-sum shape
        "q12_priority_class",
        # round 5 third-wave additions: retrieval/mining + semantic curation
        "bm25_rank",
        "dsir_select",
        "substring_dedup",
        "lm_quality",
        "semdedup",
        "sq8_ann",
        "ngram_containment",
        "classifier_score",
        "allpairs_jaccard",
        "count_min",
        "bpe_pairs",
        "waterfill",
        "change_rate",
        # round 5 fourth wave: crawl hygiene + batch prep + link prediction
        "url_canon_query",
        "trap_detect",
        "retry_backoff",
        "aspect_buckets",
        "link_predict",
        "sitemap_parse",
        "image_batches",
        # round 5 fifth wave: fingerprint/phrase family, multimodal prep,
        # ingest extraction + the end-to-end composition
        "winnow_fp",
        "winnow_overlap",
        "mixture_sample",
        "phrase_search",
        "image_patches",
        "clip_filter",
        "html_extract",
        "bpe_encode",
        "ingest_pipeline",
        "incremental_dedup",
        "epoch_shuffle",
        "blocklist_filter",
    ]

    # warm the JVM/IO once (scan metadata, codegen) so timings measure the plan
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    n_passes = 3  # one more chance per query to dodge a co-tenant spike
    for pass_no in range(n_passes):
        for name in headline:
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            n = df.count()
            dt = round(time.time() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            if pass_no == n_passes - 1:
                print(f"# {name}: {n} rows in {timings[name]}s "
                      f"(min of {n_passes})", file=sys.stderr)
        # drop anything a query persisted so pass 2 re-executes the real plan
        spark.catalog.clearCache()

    # frontier throughput (the BASELINE.json target metric): min-of-3 in the
    # warm JVM, fresh state catalog per run, identical deterministic input.
    from httrack2warc_spark.frontier import CrawlConfig, FrontierScheduler, generate_web
    from httrack2warc_spark.sinks.tables import TableCatalog
    import tempfile

    n_hosts, pages = 50, 2000
    web, seeds = generate_web(spark, n_hosts=n_hosts, pages_per_host=pages,
                              out_degree=8, cross_host_every=1)
    web.pages = web.pages.persist()
    web.links = web.links.persist()
    web.pages.count(), web.links.count()

    frontier_runs = []
    n_urls = 0
    for rep in range(3):
        cat = TableCatalog(spark, tempfile.mkdtemp(prefix=f"bench_crawl{rep}_"))
        sched = FrontierScheduler(
            spark, cat, web,
            CrawlConfig(num_parts=int(cpus), max_rounds=12,
                        default_host_budget=100_000, fetch_robots=False,
                        summary_capacity_per_part=500_000, summary_every=3,
                        commit_every=2, batch_levels=4),
        )
        t0 = time.time()
        log = sched.run(seeds=seeds)
        n_urls = log.count()
        crawl_sec = time.time() - t0
        frontier_runs.append({"sec": round(crawl_sec, 3),
                              "urls_per_sec": round(n_urls / crawl_sec, 1),
                              "load_avg_1m": round(os.getloadavg()[0], 1)})
        print(f"# frontier run {rep + 1}/3: {n_urls} urls in {crawl_sec:.1f}s "
              f"= {frontier_runs[-1]['urls_per_sec']}/s "
              f"(load {frontier_runs[-1]['load_avg_1m']})", file=sys.stderr)
        spark.catalog.clearCache()
        # re-cache + materialize the (identical) input before the next run so
        # concurrent stages never race to fill the cache (see build notes)
        web.pages = web.pages.persist()
        web.links = web.links.persist()
        web.pages.count(), web.links.count()

    best = min(frontier_runs, key=lambda r: r["sec"])
    timings["frontier_crawl"] = best["sec"]
    urls_per_sec = best["urls_per_sec"]
    print(f"# frontier best-of-3: {n_urls} urls in {best['sec']}s "
          f"= {urls_per_sec}/s", file=sys.stderr)

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
        "frontier_runs": frontier_runs,
        "protocol": "min-of-3 per query (clearCache between passes), "
                    "min-of-3 frontier, warm JVM; multi-tenant host",
        "load_avg_start": [round(x, 1) for x in load_start],
        "load_avg_end": [round(x, 1) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
